package graft.core

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite
import graft.core.macros.QueryMacros
import graft.core.window.WindowFactory

/** Golden strings ported from `executor/tests/test_query.py:13-64` —
  * byte-for-byte.
  */
class QueryMacrosSpec extends AnyFunSuite {
  private val scheduledAt = LocalDateTime.of(2020, 7, 8, 4, 0)
  private val scheduledNextAt = LocalDateTime.of(2020, 7, 9, 4, 0)

  test("replace dstart and dend with date") {
    val params = Map("__dstart__" -> "2019-01-01", "__dend__" -> "2019-01-02")
    val q = "select * from table where date => '__dstart__' and date < '__dend__'"
    assert(QueryMacros.replaceParams(q, params) ==
      "select * from table where date => '2019-01-01' and date < '2019-01-02'")
  }

  test("replace destination table and execution date") {
    val w = WindowFactory.createWindowWithTime(scheduledAt, scheduledAt.plusDays(1))
    val q = "select * from `__destination_table__` where date => '__execution_time__' and date < '__dend__'"
    val r = QueryMacros.replaceParams(
      QueryMacros.replaceParams(
        QueryMacros.replaceParams(q, QueryMacros.windowParameter(w)),
        QueryMacros.executionParameter(scheduledAt)),
      QueryMacros.destinationParameter("table"))
    assert(r == "select * from `table` where date => '2020-07-08T04:00:00.000000' and date < '2020-07-09'")
  }

  test("apply window (idempotent across two queries)") {
    val start = LocalDateTime.of(2019, 1, 1, 0, 0)
    val w = WindowFactory.createWindowWithTime(start, start.plusDays(1))
    val q = "select * from table where date => '__dstart__' and date < '__dend__'"
    val expected = "select * from table where date => '2019-01-01' and date < '2019-01-02'"
    assert(QueryMacros.replaceParams(q, QueryMacros.windowParameter(w)) == expected)
    assert(QueryMacros.replaceParams(q, QueryMacros.windowParameter(w)) == expected)
  }

  test("hour-size window renders datetime format") {
    val w = WindowFactory.createWindow(scheduledNextAt, "2h", "0", "h")
    val q = "select * from table where date => '__dstart__' and date < '__dend__' and tt < '__dstart__'"
    assert(QueryMacros.replaceParams(q, QueryMacros.windowParameter(w)) ==
      "select * from table where date => '2020-07-09 02:00:00' and date < '2020-07-09 04:00:00' and tt < '2020-07-09 02:00:00'")
  }

  test("dend not replaced inside a word") {
    val w = WindowFactory.createWindow(scheduledNextAt, "2h", "0", "h")
    val q = "select * from table where date => adstarta && event > __execution_time__"
    assert(QueryMacros.replaceParams(q, QueryMacros.windowParameter(w)) == q)
  }

  test("multiline substitution") {
    val params = Map("__dstart__" -> "2019-01-01")
    val q = "select *\nfrom t\nwhere d >= '__dstart__'\n  and e >= '__dstart__'"
    assert(QueryMacros.replaceParams(q, params) ==
      "select *\nfrom t\nwhere d >= '2019-01-01'\n  and e >= '2019-01-01'")
  }
}
