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

    test("checkpoint blocks drain once results are unreferenced") {
      // every gate result above went out of scope; after GC the
      // ContextCleaner must reclaim their localCheckpoint RDDs. What
      // MAY legitimately remain: checkpointed frames still referenced
      // by session state (DML table snapshots, script temp tables).
      // A persist leak across 240+ gates would leave hundreds of
      // entries — the bound is the tripwire, not an exact count.
      spark.catalog.clearCache()
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.size
      var waited = 0
      while (sc.getPersistentRDDs.size > 48 && waited < 30000) {
        System.gc(); Thread.sleep(500); waited += 500
      }
      val after = sc.getPersistentRDDs.size
      assert(after <= 48,
        s"$after persistent RDDs remain after GC drain (pre-drain $before) — " +
          "gate results are pinning caches beyond session-held snapshots")
    }
  } else {
    test("testdata present") { cancel(s"$sfDir not found") }
  }
}
