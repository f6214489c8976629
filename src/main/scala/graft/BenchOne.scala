package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: `runMain graft.BenchOne <sfDir> <prefix>[,<prefix>...] [nRuns]`.
  * Same session config as [[Bench]]; prints one line per (query, run).
  * Lets a slow query be profiled without re-running the whole suite
  * (Bench has no subset knob by design — the driver always times
  * everything).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args(1).split(",").toSeq
    val nRuns = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    for ((name, fn) <- sel; i <- 1 to nRuns) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"BENCHONE $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
    }
    spark.stop()
  }
}
