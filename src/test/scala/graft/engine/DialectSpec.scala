package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class DialectSpec extends AnyFunSuite {

  test("IN UNNEST rewrite, flat and nested-call arguments") {
    assert(Dialect.rewrite("WHERE x IN UNNEST(partitions)") ==
      "WHERE array_contains(partitions, x)")
    assert(Dialect.rewrite("WHERE s IN UNNEST(array('a', 'b'))") ==
      "WHERE array_contains(array('a', 'b'), s)")
  }

  test("NOT IN UNNEST rewrites to negated array_contains") {
    assert(Dialect.rewrite("WHERE x NOT IN UNNEST(partitions)") ==
      "WHERE (NOT array_contains(partitions, x))")
  }

  test("keyword rewrites skip string literals") {
    assert(Dialect.rewrite("SELECT 'NUMERIC keypad', CAST(x AS NUMERIC)") ==
      "SELECT 'NUMERIC keypad', CAST(x AS DECIMAL(38,9))")
    assert(Dialect.rewrite("SELECT 'SELECT AS STRUCT' AS s") ==
      "SELECT 'SELECT AS STRUCT' AS s")
  }

  test("DATE with timezone argument") {
    assert(Dialect.rewrite("SELECT DATE(created_time, 'Asia/Jakarta')") ==
      "SELECT to_date(from_utc_timestamp(created_time, 'Asia/Jakarta'))")
  }

  test("TIMESTAMP literal call with T separator") {
    assert(Dialect.rewrite("TIMESTAMP('2021-09-01T01:02:03')") ==
      "to_timestamp(replace('2021-09-01T01:02:03', 'T', ' '))")
  }

  test("SELECT AS STRUCT flattens") {
    assert(Dialect.rewrite("SET (p) = (SELECT AS STRUCT array_agg(x))")
      .contains("SELECT  array_agg(x)"))
  }

  test("3-part source FQNs map to warehouse catalog names") {
    assert(Dialect.mapSourceFqns("SELECT * FROM `proj`.`ds`.`t` JOIN proj.ds.u ON 1=1")
      == "SELECT * FROM proj__ds.`t` JOIN proj__ds.`u` ON 1=1")
    assert(Dialect.mapSourceFqns("FROM `my-proj.ds.t`")
      == "FROM my_proj__ds.`t`")
    // 1- and 2-part names, subqueries, and USING clauses are untouched
    assert(Dialect.mapSourceFqns("FROM orders JOIN db.t USING (id)")
      == "FROM orders JOIN db.t USING (id)")
    assert(Dialect.mapSourceFqns("CREATE TABLE x (a INT) USING parquet")
      == "CREATE TABLE x (a INT) USING parquet")
    assert(Dialect.mapSourceFqns("FROM (SELECT 1)") == "FROM (SELECT 1)")
    // struct field access in expressions is not a table ref
    assert(Dialect.mapSourceFqns("SELECT a.b.c FROM t") == "SELECT a.b.c FROM t")
    // expression-position FROM (EXTRACT units, IS DISTINCT FROM, TRIM
    // specifiers) must not treat the following path as a table
    assert(Dialect.mapSourceFqns("SELECT EXTRACT(YEAR FROM o.meta.ts) FROM proj.ds.orders")
      == "SELECT EXTRACT(YEAR FROM o.meta.ts) FROM proj__ds.`orders`")
    assert(Dialect.mapSourceFqns("WHERE x IS DISTINCT FROM a.b.c")
      == "WHERE x IS DISTINCT FROM a.b.c")
    assert(Dialect.mapSourceFqns("SELECT TRIM(BOTH ' ' FROM n.a.b) FROM t")
      == "SELECT TRIM(BOTH ' ' FROM n.a.b) FROM t")
    // a plain alias before FROM doesn't suppress the mapping
    assert(Dialect.mapSourceFqns("SELECT x AS day FROM proj.ds.t")
      == "SELECT x AS day FROM proj__ds.`t`")
    // the guard is token-based, not a fixed lookback window: a TRIM
    // literal or whitespace longer than 32 chars still suppresses it
    val longTrim = "SELECT TRIM(BOTH '========================================' FROM n.a.b) FROM t"
    assert(Dialect.mapSourceFqns(longTrim) == longTrim)
    val spaced = "SELECT EXTRACT(YEAR            \n              FROM o.meta.ts) FROM proj.ds.t"
    assert(Dialect.mapSourceFqns(spaced)
      == "SELECT EXTRACT(YEAR            \n              FROM o.meta.ts) FROM proj__ds.`t`")
    // WEEK(MONDAY) closes a paren group before its FROM
    assert(Dialect.mapSourceFqns("SELECT EXTRACT(WEEK(MONDAY) FROM o.meta.ts) FROM proj.ds.t")
      == "SELECT EXTRACT(WEEK(MONDAY) FROM o.meta.ts) FROM proj__ds.`t`")
    // a column merely NAMED like a unit keyword doesn't suppress mapping
    assert(Dialect.mapSourceFqns("SELECT year FROM proj.ds.t")
      == "SELECT year FROM proj__ds.`t`")
  }

  test("table name normalization: backticks, colon, decorator") {
    assert(Dialect.normalizeTableName("`p.d.t`") == ("p.d.t", None))
    assert(Dialect.normalizeTableName("p:d.t") == ("p.d.t", None))
    assert(Dialect.normalizeTableName("p.d.t$20190101") == ("p.d.t", Some("20190101")))
  }
}
