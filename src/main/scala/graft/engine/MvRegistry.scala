package graft.engine

/** Session-global registry of materialized views: resolved catalog
  * name → the ORIGINAL BigQuery defining query. BigQuery auto-refreshes
  * MVs in the background and exposes manual refresh as
  * `CALL BQ.REFRESH_MATERIALIZED_VIEW('p.d.mv')`; the parquet engine
  * has no background service, so the CALL is the refresh — a
  * re-materialization of the stored query. The raw text (not the
  * rewritten Spark SQL) is stored so a refresh replays the full
  * dialect pipeline, exactly like the original CREATE.
  */
object MvRegistry {
  private val views =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(table: String, query: String): Unit =
    views.put(table.toLowerCase, query)

  def definitionOf(table: String): Option[String] =
    Option(views.get(table.toLowerCase))

  def drop(table: String): Unit = views.remove(table.toLowerCase)
}
