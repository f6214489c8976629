package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BigQuery-scripting interpreter cases (`select/script/query.sql`
  * shapes and the generated REPLACE_MERGE script of `query.py:6-20`).
  */
class ScriptRunnerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("DECLARE with DEFAULT, SET arithmetic, variable substitution") {
    val out = new ScriptRunner(spark).run(
      """DECLARE power INT64 DEFAULT 2;
        |SET power = power + 1;
        |SELECT power AS p""".stripMargin).get
    assert(out.collect().head.getInt(0) == 3)
  }

  test("SET (v) = (SELECT AS STRUCT ...) scalar unwrap") {
    val out = new ScriptRunner(spark).run(
      """DECLARE partitions ARRAY<DATE>;
        |SET (partitions) = (SELECT AS STRUCT array(DATE '2020-01-01', DATE '2020-01-02'));
        |SELECT d FROM (SELECT explode(partitions) AS d) ORDER BY d""".stripMargin).get
    assert(out.collect().map(_.get(0).toString).toSeq ==
      Seq("2020-01-01", "2020-01-02"))
  }

  test("CREATE TEMP TABLE AS + IN UNNEST over declared array") {
    val out = new ScriptRunner(spark).run(
      """DECLARE statuses ARRAY<STRING> DEFAULT array('a', 'b');
        |CREATE TEMP TABLE src AS (SELECT explode(array('a', 'b', 'c')) AS s);
        |SELECT count(1) AS cnt FROM src WHERE s IN UNNEST(statuses)""".stripMargin).get
    assert(out.collect().head.getLong(0) == 2L)
  }

  test("CREATE TEMP FUNCTION with SQL body translates to a Spark SQL UDF") {
    val out = new ScriptRunner(spark).run(
      """CREATE TEMP FUNCTION add_tax(price FLOAT64, rate FLOAT64) RETURNS FLOAT64 AS (price * (1 + rate));
        |SELECT add_tax(100.0, 0.1) AS taxed""".stripMargin).get
    assert(math.abs(out.collect().head.getDouble(0) - 110.0) < 1e-9)
  }

  test("CREATE TEMP FUNCTION LANGUAGE js is rejected with guidance") {
    val e = intercept[UnsupportedOperationException] {
      new ScriptRunner(spark).run(
        """CREATE TEMP FUNCTION f(x STRING) RETURNS STRING LANGUAGE js AS "return x;";
          |SELECT f('a')""".stripMargin)
    }
    assert(e.getMessage.contains("JS UDF"))
  }

  test("word-boundary substitution does not touch identifiers containing the var") {
    val out = new ScriptRunner(spark).run(
      """DECLARE v INT64 DEFAULT 5;
        |SELECT v AS value, 7 AS vv""".stripMargin).get
    val row = out.collect().head
    assert(row.getInt(0) == 5 && row.getInt(1) == 7)
  }
}
