package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.config._

/** Contract cases from `executor/tests/test_config.py:18-253`. */
class TaskConfigSpec extends AnyFunSuite {

  private val envBase = Map(
    "PROJECT" -> "bq_project", "DATASET" -> "playground_dev",
    "TABLE" -> "abcd", "SQL_TYPE" -> "STANDARD", "LOAD_METHOD" -> "REPLACE")

  test("env config with defaults") {
    val c = TaskConfig.fromEnv(envBase)
    assert(c.destinationTable == "bq_project.playground_dev.abcd")
    assert(c.loadMethod == LoadMethod.Replace)
    assert(c.timezone == "UTC")
    assert(c.useSpillover)
    assert(c.concurrency == 1)
    assert(!c.allowFieldAddition)
    assert(c.executionProject == "bq_project")
    assert(c.queryPriority == QueryPriority.Interactive)
  }

  test("missing required env key raises") {
    assertThrows[IllegalArgumentException](TaskConfig.fromEnv(envBase - "PROJECT"))
  }

  test("concurrency must be > 0") {
    assertThrows[IllegalArgumentException](
      TaskConfig.fromEnv(envBase + ("CONCURRENCY" -> "0")))
  }

  test("invalid timezone raises") {
    assertThrows[Exception](
      TaskConfig.fromEnv(envBase + ("TIMEZONE" -> "Not/AZone")))
  }

  test("bool parsing is strict") {
    assertThrows[IllegalArgumentException](
      TaskConfig.fromEnv(envBase + ("USE_SPILLOVER" -> "yes")))
    assert(TaskConfig.fromEnv(envBase + ("ALLOW_FIELD_ADDITION" -> "TRUE")).allowFieldAddition)
  }

  test("INI properties.cfg parsing with quoted values") {
    val ini =
      """[DESTINATION]
        |PROJECT="bq_project"
        |DATASET="playground_dev"
        |TABLE="abcd"
        |SQL_TYPE="STANDARD"
        |
        |[TRANSFORMATION]
        |WINDOW_SIZE = 24h
        |WINDOW_OFFSET = 24h
        |WINDOW_TRUNCATE_UPTO = d
        |TIMEZONE="Asia/Jakarta"
        |USE_SPILLOVER = false
        |CONCURRENCY = 5
        |
        |[LOAD]
        |LOAD_METHOD="REPLACE_MERGE"
        |PARTITION_FILTER="DATE(`event_timestamp`) >= DATE('2020-08-04')"
        |ALLOW_FIELD_ADDITION=TRUE
        |""".stripMargin
    val c = TaskConfig.fromIni(ini)
    assert(c.destinationProject == "bq_project")
    assert(c.timezone == "Asia/Jakarta")
    assert(!c.useSpillover)
    assert(c.concurrency == 5)
    assert(c.loadMethod == LoadMethod.ReplaceMerge)
    assert(c.allowFieldAddition)
    assert(c.filterExpression.contains("DATE(`event_timestamp`) >= DATE('2020-08-04')"))
    assert(c.windowSize.contains("24h"))
    assert(c.windowTruncateUpto.contains("d"))
  }

  test("INI zero window size raises") {
    val ini =
      """[DESTINATION]
        |PROJECT="p"
        |DATASET="d"
        |TABLE="t"
        |[TRANSFORMATION]
        |WINDOW_SIZE = 0
        |[LOAD]
        |LOAD_METHOD="REPLACE"
        |""".stripMargin
    assertThrows[IllegalArgumentException](TaskConfig.fromIni(ini))
  }

  test("write dispositions") {
    assert(LoadMethod.Append.writeDisposition == WriteDisposition.WriteAppend)
    assert(LoadMethod.Replace.writeDisposition == WriteDisposition.WriteTruncate)
    assert(LoadMethod.ReplaceMerge.writeDisposition == WriteDisposition.WriteTruncate)
    assert(LoadMethod.ReplaceAll.writeDisposition == WriteDisposition.WriteTruncate)
    assertThrows[IllegalStateException](LoadMethod.Merge.writeDisposition)
  }

  test("unknown load method raises") {
    assertThrows[IllegalArgumentException](LoadMethod.fromString("UPSERT"))
  }
}
