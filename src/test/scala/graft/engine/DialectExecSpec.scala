package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Executes the trickier dialect rewrites on a real session — string
  * equality on the rewritten SQL can't prove Spark accepts the output
  * (variant functions, CASE array-type coercion, boundary-diff math).
  */
class DialectExecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def one(sql: String): Any =
    spark.sql(Dialect.rewrite(sql)).collect()(0).get(0)

  test("GENERATE_ARRAY: ascending, empty-descending, stepped, negative step") {
    assert(one("SELECT GENERATE_ARRAY(1, 4)") == Seq(1, 2, 3, 4))
    assert(one("SELECT GENERATE_ARRAY(5, 1)") == Seq())
    assert(one("SELECT GENERATE_ARRAY(1, 10, 3)") == Seq(1, 4, 7, 10))
    assert(one("SELECT GENERATE_ARRAY(5, 1, -2)") == Seq(5, 3, 1))
    // step pointing away from end → empty, not an error
    assert(one("SELECT GENERATE_ARRAY(1, 5, -1)") == Seq())
    assert(one("SELECT GENERATE_ARRAY(3, 3)") == Seq(3))
  }

  test("JSON_EXTRACT keeps JSON encoding; JSON_EXTRACT_SCALAR strips it") {
    assert(one("""SELECT JSON_EXTRACT('{"a": "b"}', '$.a')""") == "\"b\"")
    assert(one("""SELECT JSON_EXTRACT('{"a": {"n": 1}}', '$.a')""") == """{"n":1}""")
    assert(one("""SELECT JSON_EXTRACT('{"a": 5}', '$.a')""") == "5")
    assert(one("""SELECT JSON_EXTRACT_SCALAR('{"a": "b"}', '$.a')""") == "b")
    assert(one("""SELECT JSON_EXTRACT('{"a": 1}', '$.missing')""") == null)
  }

  test("DATETIME_DIFF boundary semantics vs TIMESTAMP_DIFF elapsed") {
    // 20 minutes apart across midnight: 1 day boundary, 0 elapsed days
    assert(one("SELECT DATETIME_DIFF(DATETIME '2024-01-02 00:10:00', " +
      "DATETIME '2024-01-01 23:50:00', DAY)") == 1)
    assert(one("SELECT TIMESTAMP_DIFF(TIMESTAMP '2024-01-02 00:10:00', " +
      "TIMESTAMP '2024-01-01 23:50:00', DAY)") == 0)
    // month boundary
    assert(one("SELECT DATETIME_DIFF(DATETIME '2024-02-01 00:00:01', " +
      "DATETIME '2024-01-31 23:59:59', MONTH)") == 1)
    // sub-day boundary: 2 minutes apart across an hour boundary
    assert(one("SELECT DATETIME_DIFF(DATETIME '2024-01-01 02:01:00', " +
      "DATETIME '2024-01-01 01:59:00', HOUR)") == 1)
    // same hour → 0 even when 59 minutes apart
    assert(one("SELECT DATETIME_DIFF(DATETIME '2024-01-01 01:59:00', " +
      "DATETIME '2024-01-01 01:00:00', HOUR)") == 0)
  }
}
