package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access helpers for the driver-provided synthetic parquet tables
  * (see /root/repo/TESTDATA.md). All queries read through here so the
  * scan always goes parquet → Catalyst (predicate pushdown + column
  * pruning verified in specs).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) — unsupported by Spark's
    // vectorized reader; sessions set
    // spark.sql.legacy.parquet.nanosAsLong=true and we truncate to
    // micros here (exactly what DuckDB does reading the same file).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register temp views for SQL-form queries. Idempotent per session. */
  def views(spark: SparkSession, sfDir: String, names: String*): Unit = {
    val ns = if (names.isEmpty) all else names
    ns.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
  }
}
