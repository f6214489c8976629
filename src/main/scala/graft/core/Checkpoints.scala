package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-cut helper shared by the iterative / multi-consumer query
  * paths (graph loops, multi-consumer sketch frames, CPU-spread heads).
  *
  * On local[n] with no checkpoint directory configured the cut is
  * `localCheckpoint`: executor-local, non-replicated blocks — cheap, and
  * block loss cannot happen in a single-JVM local run. On a real cluster
  * a localCheckpoint truncates lineage with no recompute path, so a lost
  * executor fails the job unrecoverably; there the cut must be a
  * reliable `checkpoint()`. Set the SparkContext checkpoint dir
  * (`sparkContext.setCheckpointDir(...)`) or the session conf
  * `spark.sql.graft.checkpointDir` and every cut in the engine becomes a
  * reliable checkpoint to that directory. Guide §5: localCheckpoint is
  * for intermediates whose fault tolerance is not critical — at 100 TB
  * these truncated-lineage frames ARE critical.
  */
object Checkpoints {
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val confDir =
        try spark.conf.getOption("spark.sql.graft.checkpointDir")
        catch { case _: Throwable => None }
      confDir.foreach(sc.setCheckpointDir)
    }
    if (sc.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }
}
