package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming extension (optional beyond reference parity —
  * SURVEY §2B.10 notes the reference has no streaming surface).
  *
  * Pattern: file-source stream → event-time window + watermark →
  * stateful aggregation → sink. Exercised in tests/queries by streaming
  * the `events` parquet through a bounded run (`processAllAvailable`),
  * so the final state is deterministic and batch-oracle-checkable.
  *
  * Scale posture: the same topology runs unbounded on a cluster — the
  * watermark bounds state, the aggregation is partition-parallel, and
  * the sink below is swappable for kafka/parquet/foreachBatch.
  */
object StreamingOps {

  /** Tumbling event-time window counts with a watermark. */
  def windowedEventCounts(events: DataFrame, windowLength: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Run the events parquet as a bounded stream into a memory sink;
    * returns the complete final aggregation state.
    */
  def runBoundedWindowAgg(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file source streams a DIRECTORY; select just the events file
    val stream = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    // events.ts arrives as nanos-long (see Tables.t) — normalize identically
    val withTs =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    val agg = windowedEventCounts(withTs, "1 hour", "1 hour")
    val q = agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(queryName)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }
}
