package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingOps

/** Structured Streaming flows exposed through the driver contract: the
  * stream is bounded (all of events.parquet), so the final state is
  * deterministic and checked against a batch DuckDB oracle.
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "s01_stream_window_agg" -> { (s, d) =>
      StreamingOps.runBoundedWindowAgg(s, d, "s01_sink")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "s01_stream_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(1) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
