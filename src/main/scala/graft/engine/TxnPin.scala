package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Durable transaction pins. The in-memory transaction machinery in
  * [[DmlRunner]] pins each touched table's pre-transaction FILE SET;
  * this object mirrors every pin to a small sidecar file NEXT TO the
  * table directory (`<dbdir>/.graft_txnpin_<table>_<txnid>`), so a
  * transaction that dies with its JVM — BigQuery rolls such sessions
  * back server-side — is rolled back by the next engine write to the
  * table: [[PartitionCommit.recover]] finds the orphaned pin (its
  * transaction id is not registered in [[activeTxnIds]] by any live
  * runner), replays any crashed statement journal (re-pointing the
  * pin's entries at the parked image, exactly like the live retain
  * listener), and restores the pre-transaction files by rename.
  *
  * Restore is idempotent — a crash mid-restore re-runs from the
  * re-written pin file; every rename tolerates "already moved"
  * (destination present) and fails loud on genuine loss (neither side
  * present). Tables fully DROPPED by a dead transaction are not
  * auto-discovered (no catalog entry points at them); their pin file
  * and keep dir remain on disk for a manual [[restoreFile]].
  */
object TxnPin {

  /** One pinned table. `index` maps each pre-txn data file (relative
    * path) to the directory that currently holds it; `keepDir` is set
    * once a destructive statement moved the files aside.
    */
  final class Pin(
      val txnId: String,
      val table: String,
      val ddl: String,
      val loc: Path,
      val preSnaps: Seq[String],
      val readOnlyReason: Option[String],
      val index: scala.collection.mutable.LinkedHashMap[String, Path]) {
    var keepDir: Option[Path] = None
  }

  /** Transaction ids with a LIVE in-JVM owner — their pins are not
    * orphans. Registered at BEGIN, released at COMMIT/ROLLBACK.
    */
  private[engine] val activeTxnIds: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def pinPath(pin: Pin): Path =
    new Path(pin.loc.getParent, s".graft_txnpin_${pin.loc.getName}_${pin.txnId}")

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** Atomically (tmp + rename) persist the pin's current state. */
  def write(spark: SparkSession, pin: Pin): Unit = {
    val fs = fsOf(spark, pin.loc)
    val target = pinPath(pin)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    val body = new StringBuilder()
    body.append(pin.txnId).append('\n')
      .append(pin.table).append('\n')
      .append(b64(pin.ddl)).append('\n')
      .append(pin.loc.toString).append('\n')
      .append(pin.readOnlyReason.map(b64).getOrElse("-")).append('\n')
      .append(pin.keepDir.map(_.toString).getOrElse("-")).append('\n')
      .append(pin.preSnaps.mkString("\t")).append('\n')
    pin.index.foreach { case (rel, base) =>
      body.append(b64(rel)).append('\t').append(base.toString).append('\n')
    }
    val out = fs.create(tmp, true)
    out.write(body.toString.getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(target, false)
      if (!fs.rename(tmp, target))
        throw new IllegalStateException(s"could not persist txn pin $target")
    }
  }

  def read(spark: SparkSession, file: Path): Pin = {
    val fs = fsOf(spark, file)
    val in = fs.open(file)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val index = scala.collection.mutable.LinkedHashMap.empty[String, Path]
    lines.drop(7).filter(_.nonEmpty).foreach { l =>
      val Array(rel, base) = l.split("\t", 2)
      index(unb64(rel)) = new Path(base)
    }
    val pin = new Pin(lines(0), lines(1), unb64(lines(2)), new Path(lines(3)),
      if (lines(6).isEmpty) Seq.empty else lines(6).split("\t").toSeq,
      if (lines(4) == "-") None else Some(unb64(lines(4))), index)
    if (lines(5) != "-") pin.keepDir = Some(new Path(lines(5)))
    pin
  }

  def delete(spark: SparkSession, pin: Pin): Unit = {
    val fs = fsOf(spark, pin.loc)
    fs.delete(pinPath(pin), false)
  }

  /** Rename that tolerates a replayed restore: destination already
    * holding the file means a previous attempt moved it. Neither side
    * present is genuine loss — fail loud.
    */
  private def move(fs: FileSystem, from: Path, to: Path): Unit = {
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to) && !fs.exists(to))
      throw new IllegalStateException(s"transaction restore: cannot move $from to $to")
  }

  /** Move every pinned file (and the pre-txn snapshot history) into
    * the pin's keep dir beside the table — the step that makes a
    * following DROP/recreate safe. Persists progress. Idempotent.
    */
  def moveToKeep(spark: SparkSession, pin: Pin): Unit = {
    val fs = fsOf(spark, pin.loc)
    val kd = pin.keepDir.getOrElse {
      val d = new Path(pin.loc.getParent,
        s".graft_txnkeep_${pin.loc.getName}_${pin.txnId}")
      pin.keepDir = Some(d)
      d
    }
    val dataDir = new Path(kd, "data")
    pin.index.foreach { case (rel, base) =>
      if (base.toString != dataDir.toString) {
        move(fs, new Path(base, rel), new Path(dataDir, rel))
        pin.index(rel) = dataDir
      }
    }
    val snapsDir = new Path(kd, "snaps")
    pin.preSnaps.foreach { name =>
      val from = new Path(pin.loc, name)
      if (fs.exists(from)) {
        fs.mkdirs(snapsDir)
        fs.rename(from, new Path(snapsDir, name))
      }
    }
    write(spark, pin)
  }

  /** Roll one pinned table back to its pre-transaction state: heal any
    * crashed statement journal first (a temporary retain listener
    * re-points the pin at the parked image, standing in for the dead
    * transaction's live listener), consolidate the pinned files into
    * the keep dir, rebuild the table from its DDL, and rename the
    * files (and pre-txn snapshot history) back. Deletes the pin file
    * LAST — a crash anywhere re-runs this idempotently.
    */
  def restore(spark: SparkSession, pin: Pin): Unit = {
    if (spark.catalog.tableExists(pin.table)) {
      val remap: (Path, Path) => Unit = (loc, snap) =>
        if (loc.toString == pin.loc.toString)
          pin.index.mapValuesInPlace((_, base) =>
            if (base.toString == loc.toString) snap else base)
      PartitionCommit.retainListeners.add(remap)
      try PartitionCommit.recover(spark, pin.table, healPins = false)
      finally PartitionCommit.retainListeners.remove(remap)
    }
    moveToKeep(spark, pin)
    spark.sql(s"DROP TABLE IF EXISTS ${pin.table}")
    spark.sql(pin.ddl)
    val loc = PartitionCommit.tableLocation(spark, pin.table)
    val fs = fsOf(spark, loc)
    pin.keepDir.foreach { kd =>
      val dataDir = new Path(kd, "data")
      pin.index.keysIterator.foreach { rel =>
        move(fs, new Path(dataDir, rel), new Path(loc, rel))
      }
      val snapsDir = new Path(kd, "snaps")
      if (fs.exists(snapsDir))
        fs.listStatus(snapsDir).foreach { s =>
          if (!fs.rename(s.getPath, new Path(loc, s.getPath.getName)) &&
              !fs.exists(new Path(loc, s.getPath.getName)))
            throw new IllegalStateException(
              s"transaction restore: cannot return snapshot ${s.getPath}")
        }
      fs.delete(kd, true)
    }
    if (spark.catalog.listColumns(pin.table).collect().exists(_.isPartition))
      spark.sql(s"MSCK REPAIR TABLE ${pin.table} SYNC PARTITIONS")
    spark.catalog.refreshTable(pin.table)
    pin.readOnlyReason match {
      case Some(r) => CloneRegistry.markReadOnly(pin.table, r)
      case None => CloneRegistry.unmark(pin.table)
    }
    delete(spark, pin)
  }

  /** Restore directly from a pin file (manual recovery of a table the
    * catalog no longer knows about).
    */
  def restoreFile(spark: SparkSession, file: Path): Unit =
    restore(spark, read(spark, file))

  /** Roll back any ORPHANED pins for `loc`'s table — pins whose
    * transaction has no live in-JVM owner. Called by
    * [[PartitionCommit.recover]] before statement journals replay.
    */
  def healOrphans(spark: SparkSession, loc: Path): Unit = {
    val fs = fsOf(spark, loc)
    val parent = loc.getParent
    if (parent == null || !fs.exists(parent)) return
    val prefix = s".graft_txnpin_${loc.getName}_"
    fs.listStatus(parent).map(_.getPath)
      .filter(p => p.getName.startsWith(prefix) && !p.getName.endsWith(".tmp"))
      .foreach { p =>
        val txnId = p.getName.stripPrefix(prefix)
        if (!activeTxnIds.contains(txnId)) restoreFile(spark, p)
      }
  }
}
