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

  /** Normalize event-time physical types across driver testdata
    * generations, so every query sees plain `TIMESTAMP`:
    *  - parquet TIMESTAMP(NANOS): unsupported by Spark's vectorized
    *    reader; sessions set spark.sql.legacy.parquet.nanosAsLong=true
    *    and we truncate the long to micros (exactly what DuckDB does
    *    reading the same file);
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ, which `unix_micros` and streaming watermarks
    *    reject. The session timezone is UTC, so casting NTZ→TIMESTAMP
    *    preserves the wall-clock value and equals DuckDB's reading.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if f.name == "ts" =>
          d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => d
      }
    }
  }

  /** Resolved-plan cache: building a parquet DataFrame pays driver-side
    * file listing + footer schema inference EVERY call, and the bench
    * re-builds each query's inputs 4× (warmup + 3 timed runs) across
    * 350 queries — pure fixed cost, ~30-80 ms per read. The testdata is
    * immutable for the life of a run, so the resolved (and
    * ts-normalized) DataFrame is reusable as-is: this caches METADATA
    * (logical plan + file index), never row data — each action still
    * recomputes from the parquet files. Keyed by session so plans never
    * leak across SparkSessions (tests spin several).
    */
  // structured key: (session, dir, table, normalized) — no string
  // prefixing, so a table name can never collide with a variant marker
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String, Boolean), DataFrame]()

  // drop entries of stopped sessions (test suites cycle sessions; a
  // stopped session's plans are dead weight and must never be served
  // again — a fresh session with the same dir gets its own). Run on
  // every lookup AND on session stop (the listener below), so dead
  // sessions are purged even when no further t()/raw() call comes.
  private def purgeStopped(): Unit =
    planCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
  private val listenerInstalled =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())
  private def get(spark: SparkSession, sfDir: String, name: String,
      normalized: Boolean): DataFrame = {
    purgeStopped()
    if (listenerInstalled.add(spark))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          purgeStopped()
          listenerInstalled.remove(spark)
        }
      })
    planCache.computeIfAbsent((spark, sfDir, name, normalized), _ => {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (normalized) normalizeTs(df) else df
    })
  }

  /** Un-normalized variant for call sites that need the file's native
    * schema (e.g. readStream.schema(...) must describe the file as
    * stored, BEFORE normalizeTs rewrites ts). Same metadata-only cache.
    */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    get(spark, sfDir, name, normalized = false)

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    get(spark, sfDir, name, normalized = true)

  /** Register temp views for SQL-form queries. Idempotent per session. */
  def views(spark: SparkSession, sfDir: String, names: String*): Unit = {
    val ns = if (names.isEmpty) all else names
    ns.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
  }
}
