package graft.engine

import org.apache.spark.sql.SparkSession

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
  */
object ExternalTables {
  private val auto =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def registerAutoRefresh(table: String): Unit = auto.add(table.toLowerCase)

  def unregister(table: String): Unit = auto.remove(table.toLowerCase)

  /** Refresh every auto-refresh table the statement references. The
    * registry is tiny (external DDL is rare) and the check is a
    * substring scan of the statement in both the catalog spelling
    * (`db__ds.t`) and the BigQuery spelling (`db.ds.t`), so the cost
    * is O(registry) per statement and zero when the registry is empty.
    */
  def refreshReferenced(spark: SparkSession, statement: String): Unit = {
    if (auto.isEmpty) return
    val text = statement.toLowerCase
    auto.forEach { t =>
      if (text.contains(t) || text.contains(t.replace("__", "."))) {
        if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
        else auto.remove(t) // dropped since registration
      }
    }
  }
}
