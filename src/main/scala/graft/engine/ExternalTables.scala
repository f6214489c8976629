package graft.engine

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Freshness contract for external tables. BigQuery re-lists an
  * external table's files on EVERY query; Spark caches the file
  * listing in the catalog's file index, so files added or removed
  * after the DDL stay invisible until a manual `REFRESH TABLE` (the
  * seam e54 documents). Tables created with the
  * `graft.autoRefresh = true` option register here, and the statement
  * runners invalidate their listing cache before any statement that
  * references them — restoring BigQuery's list-per-query semantics at
  * the cost BigQuery also pays (one listing per query per table).
  * Tables without the option keep Spark's cached-listing behavior.
  *
  * References are resolved from RELATION POSITIONS (FROM/JOIN/USING/
  * INTO/UPDATE/TABLE keyword + name), not a raw substring scan, and a
  * referenced name that is a VIEW expands to its stored definition
  * (recursively, bounded) — so a statement that reaches an
  * auto-refresh table THROUGH a view still invalidates its listing.
  * TVF bodies and wildcard expansions are covered at the statement-
  * prep seam: ScriptRunner re-runs [[refreshReferenced]] on the
  * expanded text (where the call sites have become direct names).
  * Resolution is cached per (statement, epoch); any registry change or
  * view DDL bumps the epoch.
  */
object ExternalTables {
  private val auto =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val epoch = new java.util.concurrent.atomic.AtomicLong()
  private val resolveCache = TrieMap[(Long, String), Seq[String]]()

  def registerAutoRefresh(table: String): Unit = {
    auto.add(table.toLowerCase); bump()
  }

  def unregister(table: String): Unit = { auto.remove(table.toLowerCase); bump() }

  /** View definitions feed the indirect-reference closure — any view
    * DDL (CREATE/DROP/ALTER VIEW) must invalidate cached resolutions.
    */
  def noteViewChange(): Unit = bump()

  private def bump(): Unit = { epoch.incrementAndGet(); resolveCache.clear() }

  // a name in relation position: the only places a view/table read can
  // hide (INSERT INTO / UPDATE targets match too — a refresh there is
  // harmless). `USING (…)` subqueries and `USING parquet` capture
  // nothing that resolves, so they cost one failed lookup at most.
  private val relPosRe =
    raw"(?i)\b(?:FROM|JOIN|USING|INTO|UPDATE|TABLE)\s+(`[^`]+`|[\w$$.\-]+)".r

  /** Refresh every auto-refresh table the statement references,
    * directly or through view definitions. No-op when the registry is
    * empty (the common case); otherwise one cached resolution plus one
    * listing invalidation per referenced table.
    */
  def refreshReferenced(spark: SparkSession, statement: String): Unit = {
    if (auto.isEmpty) return
    val hits = resolveCache.getOrElseUpdate((epoch.get, statement), {
      if (resolveCache.size > 4096) resolveCache.clear() // bound, rare
      resolve(spark, statement)
    })
    hits.foreach { t =>
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
      else { auto.remove(t); bump() } // dropped since registration
    }
  }

  /** Auto-refresh tables reachable from the statement: scan relation
    * positions, expand any VIEW met on the way (catalog views via their
    * stored text, temp views via their plan's relations), depth-bounded
    * like TVF expansion.
    */
  private def resolve(spark: SparkSession, statement: String): Seq[String] = {
    val hits = scala.collection.mutable.LinkedHashSet[String]()
    val seen = scala.collection.mutable.Set[String]()
    def addName(raw: String, depth: Int): Unit = {
      val n = toCatalog(raw)
      if (n.isEmpty || !seen.add(n)) return
      if (auto.contains(n)) { hits += n; return }
      if (depth > 8) return
      viewDefinition(spark, n) match {
        case Some(Left(text)) => scanText(text, depth + 1)
        case Some(Right(names)) => names.foreach(addName(_, depth + 1))
        case scala.None =>
      }
    }
    def scanText(text: String, depth: Int): Unit =
      for (m <- relPosRe.findAllMatchIn(text))
        addName(m.group(1).replace("`", ""), depth)
    scanText(statement, 0)
    hits.toSeq
  }

  /** BigQuery/decorated spelling → lowercase catalog spelling (the
    * registry's key format): strip `$partition` decorators, 3-part
    * `p.d.t` → `p__d.t`, hyphens sanitized like catalogName does.
    */
  private def toCatalog(raw: String): String = {
    val (clean, _) = Dialect.normalizeTableName(raw)
    (clean.split("\\.") match {
      case Array(p, d, t) => s"${p.replace("-", "_")}__${d.replace("-", "_")}.$t"
      case Array(d, t) => s"${d.replace("-", "_")}.$t"
      case _ => clean
    }).toLowerCase.stripSuffix(".")
  }

  /** The definition of `name` when it is a view: Left(viewText) for
    * catalog views (stored rewritten — catalog spellings inside), or
    * Right(relation names) read from a temp/global-temp view's plan.
    * None for base tables, TVF/UNNEST call names, and unknowns.
    */
  private def viewDefinition(spark: SparkSession,
      name: String): Option[Either[String, Seq[String]]] = {
    val cat = spark.sessionState.catalog
    val parts = name.split("\\.").toSeq
    try {
      if (parts.length == 1) {
        cat.getTempView(parts.head) match {
          case Some(plan) => return Some(Right(relationNames(plan)))
          case scala.None =>
        }
      }
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(d, t) => TableIdentifier(t, Some(d))
        case _ => return scala.None
      }
      if (!cat.tableExists(ident)) return scala.None
      val meta = cat.getTableMetadata(ident)
      meta.viewText.map(Left(_))
    } catch { case scala.util.control.NonFatal(_) => scala.None }
  }

  private def relationNames(plan: LogicalPlan): Seq[String] = {
    val names = Seq.newBuilder[String]
    plan.foreach {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        names += r.multipartIdentifier.mkString(".")
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.foreach(t => names += t.identifier.unquotedString)
      case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        names += h.tableMeta.identifier.unquotedString
      case v: org.apache.spark.sql.catalyst.plans.logical.View =>
        names += v.desc.identifier.unquotedString
      case _ =>
    }
    names.result().map(_.stripPrefix("spark_catalog."))
  }
}
