package graft.engine

/** Explicit inventory of persistent RDDs the SESSION legitimately
  * holds ACROSS statements. Anything that pins a persisted/checkpointed
  * RDD beyond the statement that built it (the way the pre-round-8
  * transaction machinery pinned `localCheckpoint` table snapshots for
  * the life of a transaction) must register the RDD id here and
  * release it when done; `GateSmokeSpec` asserts that after a full
  * gate sweep + GC drain the surviving persistent-RDD set EQUALS this
  * inventory — so a single leaked cache from any one gate fails the
  * suite by name instead of hiding under a headroom bound.
  *
  * Currently empty by design: the pointer-based transaction rewrite
  * (round-8 ask #1) removed the last session-held snapshot RDDs, and
  * per-statement checkpoints (dedup pair results, EXPORT DATA's
  * materialization) are reclaimed by the ContextCleaner once the
  * result frame goes unreferenced — they are statement-scoped, not
  * session-held, and must NOT be registered.
  */
object SessionHeldCaches {
  private val held =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  def register(rddId: Int): Unit = held.add(rddId)

  def release(rddId: Int): Unit = held.remove(rddId)

  def ids: Set[Int] = {
    val b = Set.newBuilder[Int]
    held.forEach(i => b += i)
    b.result()
  }
}
