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

  def drop(table: String): Unit = {
    views.remove(table.toLowerCase)
    bases.remove(table.toLowerCase)
  }

  /** Partition-scoped refresh metadata (BigQuery MVs refresh
    * incrementally; full re-materialization is the fallback): the MV's
    * single base table, its partition column (which the MV also
    * carries), and the per-partition content signature recorded at the
    * last (re)materialization. A refresh diffs current signatures
    * against `sig` and recomputes ONLY changed/new partitions via the
    * staged-swap commit, dropping vanished ones.
    */
  final case class MvBase(table: String, partCol: String,
      sig: Map[String, String])

  private val bases =
    new java.util.concurrent.ConcurrentHashMap[String, MvBase]()

  def registerBase(table: String, base: MvBase): Unit =
    bases.put(table.toLowerCase, base)

  def baseOf(table: String): Option[MvBase] =
    Option(bases.get(table.toLowerCase))

  /** Diagnostic: formatted plan of the last incremental refresh's
    * recompute scan, for the partition-pruning audit (PlanAuditSpec).
    */
  private[engine] var lastRefreshPlan: Option[String] = None
}
