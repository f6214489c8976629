package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bench must not be able to IMPROVE when a query breaks: a throwing
  * query is named in the errors list and contributes no time.
  */
class BenchSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("BenchSpec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("timeQueries reports failed queries loudly and excludes their times") {
    val good: (SparkSession, String) => DataFrame = (s, _) => s.range(10).toDF()
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("boom")
    // a query that fails during the action (not while building the plan);
    // the failing expression sits in a filter so count() can't prune it
    val badLazy: (SparkSession, String) => DataFrame = (s, _) => {
      import org.apache.spark.sql.functions._
      s.range(1).toDF().where(assert_true(col("id") > 5).isNull)
    }
    val (times, errs) = Bench.timeQueries(
      Seq("ok" -> good, "broken" -> bad, "broken_late" -> badLazy), spark, "/nonexistent")
    assert(times.keySet == Set("ok"))
    assert(times("ok") >= 0.0)
    assert(errs == Seq("broken", "broken_late"))
  }

  test("timeQueries with no failures returns empty errors") {
    val good: (SparkSession, String) => DataFrame = (s, _) => s.range(3).toDF()
    val (times, errs) = Bench.timeQueries(Seq("a" -> good, "b" -> good), spark, "")
    assert(times.keySet == Set("a", "b") && errs.isEmpty)
  }
}
