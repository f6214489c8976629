package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r13 optimization skips the trailing no-data micro-batch on the
  * bounded runners whose output provably cannot depend on it (inner
  * join s04, left-semi join s17, dedup s05/s09 — emission is
  * arrival/match-time for all four). This spec pins the two properties
  * that make the skip safe:
  *
  *  1. the streamed result still equals the BATCH equivalent computed
  *     from the same table (the oracle checks the same equality against
  *     DuckDB; this is the in-repo tripwire);
  *  2. the conf flip is scoped — after the runner returns, the session
  *     conf is back to its pre-call state, so the next query (e.g. the
  *     left-outer join, whose no-data batch is load-bearing) is
  *     unaffected.
  */
class StreamingNoDataSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("StreamingNoDataSpec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val key = "spark.sql.streaming.noDataMicroBatches.enabled"

  if (new java.io.File(sfDir).isDirectory) {
    test("s04 inner-join runner equals the batch time-window join, conf restored") {
      val before = spark.conf.getOption(key)
      val streamed = StreamingOps
        .runBoundedAttribution(spark, sfDir, "nodata_s04")
        .collect().map(_.toSeq).toSet
      assert(spark.conf.getOption(key) == before,
        "noDataMicroBatches conf must be restored after the bounded run")
      val ev = graft.queries.Tables.t(spark, sfDir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("purchase_ts"), col("value"))
      val batch = clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("purchase_ts") > col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("value"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"streamed inner join (${streamed.size} rows) != batch join (${batch.size} rows)")
    }

    test("s05 dedup runner equals the batch per-type totals of the original stream") {
      val streamed = StreamingOps
        .runBoundedDedupDelivery(spark, sfDir, "nodata_s05")
        .collect().map(_.toSeq).toSet
      val batch = graft.queries.Tables.t(spark, sfDir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        "duplicate-delivery dedup must restate the original stream's totals")
    }
  }
}
