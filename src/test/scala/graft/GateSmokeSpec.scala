package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Every driver gate query must EXECUTE at sf0.001 — this is the
  * `sbt test` tripwire the round-5 regression showed was missing: the
  * driver silently drops queries that throw (they vanish from the
  * correctness report and land only in the bench `errors` field), so
  * an environment change — e.g. the testdata's parquet physical types
  * shifting between generations — must fail HERE, loudly, not three
  * artifacts downstream.
  *
  * One test per gate query (so the failure names the query), plus a
  * cache-hygiene audit: after the full sweep and a `clearCache()`, no
  * persisted DataFrames may remain registered — a 200-query bench JVM
  * must not accrete per-query caches (VERDICT r5 #5).
  */
class GateSmokeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("GateSmokeSpec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  if (new java.io.File(sfDir).isDirectory) {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      test(s"gate $name executes") {
        val n = fn(spark, sfDir).count()
        assert(n >= 0)
        // cache hygiene (VERDICT r5 #5 / r6 #1): a gate must release
        // every persist() it takes before returning — a 244-query bench
        // JVM must not accrete per-query cache entries. Checkpoint
        // blocks (localCheckpoint) are exempt: ContextCleaner reclaims
        // them once the result frame is unreferenced.
        assert(spark.sharedState.cacheManager.isEmpty,
          s"gate $name left persisted DataFrame entries behind")
      }
    }

    test("no persisted DataFrames survive clearCache after the sweep") {
      spark.catalog.clearCache()
      assert(spark.sharedState.cacheManager.isEmpty,
        "cacheManager still holds entries after clearCache()")
    }

    test("surviving persistent RDDs EXACTLY equal the session-held inventory") {
      // every gate result above went out of scope; after GC the
      // ContextCleaner must reclaim their localCheckpoint RDDs. The
      // ONLY entries allowed to survive are the ones explicitly
      // registered in [[graft.engine.SessionHeldCaches]] (empty since
      // the pointer-based transaction rewrite removed DML content
      // snapshots) — an EXACT inventory, not a headroom bound, so one
      // leaked cache from any single new gate fails here by RDD id
      // (VERDICT r7 ask #6 replaced the old `<= 48` tripwire).
      spark.catalog.clearCache()
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.size
      def extras = sc.getPersistentRDDs.keySet -- graft.engine.SessionHeldCaches.ids
      var waited = 0
      while (extras.nonEmpty && waited < 60000) {
        System.gc(); Thread.sleep(500); waited += 500
      }
      assert(extras.isEmpty,
        s"persistent RDDs ${extras.toSeq.sorted.mkString(", ")} survive the GC " +
          s"drain (pre-drain count $before) but are not in the session-held " +
          "inventory — some gate is pinning a cache beyond its own execution")
    }
  } else {
    test("testdata present") { cancel(s"$sfDir not found") }
  }
}
