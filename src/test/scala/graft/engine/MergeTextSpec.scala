package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the generated REPLACE_MERGE script text against the
  * reference's rendered form (`bumblebee/query.py:6-62`; the auto-form
  * golden string is ported verbatim from
  * `executor/tests/test_transformation.py:403`).
  */
class MergeTextSpec extends AnyFunSuite {

  test("auto template matches the reference golden byte-for-byte") {
    // inputs exactly as in the reference test: macro placeholders
    // unrendered, a mocked table with no listed columns
    val query = "select count(1) from table where date >= '__dstart__' and date < '__dend__'"
    val rendered = MergeTextRenderer.auto(
      script = query,
      destinationTable = "bq_project.playground_dev.abcd",
      destinationColumns = Seq.empty,
      sourceColumns = Seq.empty,
      partitionColumnName = "event_timestamp")
    val golden = "-- Optimus generated\nDECLARE partitions ARRAY<DATE>;\n\n\n\nCREATE TEMP TABLE `opt__partitions` AS (\n  select count(1) from table where date >= '__dstart__' and date < '__dend__'\n);\n\nSET (partitions) = (\n    SELECT AS STRUCT\n        array_agg(DISTINCT DATE(`event_timestamp`))\n    FROM opt__partitions\n);\n\nMERGE INTO\n  `bq_project.playground_dev.abcd` AS target\nUSING\n  (\n      Select * from `opt__partitions`\n  ) AS source\nON FALSE\nWHEN NOT MATCHED BY SOURCE AND DATE(`event_timestamp`) IN UNNEST(partitions)\nTHEN DELETE\nWHEN NOT MATCHED THEN INSERT\n  (\n     \n  )\nVALUES\n  (\n      \n  );\n"
    assert(rendered == golden)
  }

  test("filter template carries columns, filter expression, and DDL headers") {
    val script =
      """CREATE TEMP FUNCTION f(x INT64) AS (x + 1);
        |select id, f(v) as v from src where d >= '__dstart__'""".stripMargin
    val rendered = MergeTextRenderer.fromFilter(
      script = script,
      destinationTable = "p.d.t",
      destinationColumns = Seq("id", "v"),
      sourceColumns = Seq("id", "v"),
      filterExpression = "DATE(d) >= '__dstart__' AND DATE(d) < '__dend__'")
    assert(rendered.startsWith("-- Optimus generated\nCREATE TEMP FUNCTION f(x INT64) AS (x + 1)\n\nMERGE INTO\n  `p.d.t` AS target"))
    assert(rendered.contains("WHEN NOT MATCHED BY SOURCE AND DATE(d) >= '__dstart__' AND DATE(d) < '__dend__'\nTHEN DELETE"))
    assert(rendered.contains("  (\n     `id`,`v`\n  )\nVALUES\n  (\n      `id`,`v`\n  );\n"))
  }

  test("parsedSql rejects multi-body scripts") {
    intercept[IllegalArgumentException] {
      MergeTextRenderer.parsedSql("select 1; select 2")
    }
  }
}
