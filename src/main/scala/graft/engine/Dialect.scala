package graft.engine

/** Rendering-time rewrites for the BigQuery Standard-SQL constructs the
  * corpus uses that Spark SQL spells differently (SURVEY §7.3 "BigQuery
  * dialect deltas"). Applied to SQL text after macro rendering, before
  * `spark.sql`. Deliberately conservative, token-aware regexes — the
  * corpus surface is small and pinned by tests.
  */
object Dialect {

  /** `x [NOT] IN UNNEST(arr)` → `[NOT ]array_contains(arr, x)`
    * (`query.py:29`). The optional NOT group must be explicit: without it
    * the operand capture would swallow the NOT keyword itself.
    */
  private val inUnnest =
    raw"(?i)([\w.`]+)\s+(NOT\s+)?IN\s+UNNEST\s*\(((?:[^()]|\([^()]*\))*)\)".r

  /** `DATE(ts, 'Asia/Jakarta')` → tz-aware date
    * (`weekly_partitioned/query.sql:2`).
    */
  private val dateTz =
    raw"(?i)\bDATE\s*\(\s*([\w.`]+)\s*,\s*'([^']+)'\s*\)".r

  /** BigQuery `TIMESTAMP('2021-09-01T01:02:03')` literal-ish call works
    * in Spark as `to_timestamp(...)`; `T` separator needs normalizing.
    */
  private val timestampCall =
    raw"(?i)\bTIMESTAMP\s*\(\s*'([^']+)'\s*\)".r

  /** `SELECT AS STRUCT a, b` → `SELECT struct(a, b)` (only used in
    * scalar-subquery SET position — `query.py:17`).
    */
  private val selectAsStruct = raw"(?i)SELECT\s+AS\s+STRUCT\b".r

  /** `CREATE TEMP TABLE` → Spark temp view DDL is handled by
    * ScriptRunner; this just normalizes the keyword spelling.
    */
  private val stringLit = raw"'(?:[^'\\]|\\.)*'".r

  /** Apply `f` only to the regions of `sql` outside single-quoted string
    * literals, so keyword rewrites can't corrupt literal text like
    * 'NUMERIC keypad'.
    */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val sb = new StringBuilder
    var last = 0
    stringLit.findAllMatchIn(sql).foreach { m =>
      sb ++= f(sql.substring(last, m.start)) ++= m.group(0)
      last = m.end
    }
    (sb ++= f(sql.substring(last))).toString
  }

  /** BigQuery-style 3-part source references after FROM/JOIN/USING/INTO
    * — bare `p.d.t`, fully backticked, or per-part backticked, hyphens
    * allowed — mapped to the warehouse catalog name `p__d.t` (the same
    * mapping `TransformRunner.catalogName` applies to destinations).
    * Only 3-part names are touched, so Spark-native `db.table`
    * references and `USING parquet` clauses pass through unchanged.
    */
  private val fqnRef =
    raw"(?i)\b(FROM|JOIN|USING|INTO)\s+(`[^`]+`(?:\s*\.\s*`[^`]+`)*|[\w$$.-]+)".r

  /** Words that put a following FROM in EXPRESSION position, where a
    * 3-part path is `alias.struct.field`, not a table: EXTRACT units
    * (`EXTRACT(YEAR FROM …)`), `IS [NOT] DISTINCT FROM`, and
    * TRIM specifiers (`TRIM(BOTH ' ' FROM …)`).
    */
  private val exprUnits = Set("YEAR", "ISOYEAR", "QUARTER", "MONTH", "WEEK",
    "ISOWEEK", "DAY", "DAYOFWEEK", "DAYOFYEAR", "HOUR", "MINUTE", "SECOND",
    "MILLISECOND", "MICROSECOND", "NANOSECOND", "EPOCH", "DATE", "TIME",
    "DATETIME", "LEADING", "TRAILING", "BOTH")

  /** Decide from the literal-aware token stream whether the keyword at
    * `kwIdx` is an expression-position FROM: the unit keyword sits right
    * after the function's opening paren, however much literal text or
    * whitespace separates it from the FROM (`TRIM(BOTH '…long…' FROM x)`
    * tokenizes to `TRIM ( BOTH FROM`), with `WEEK(MONDAY)` closing one
    * paren group first.
    */
  private def isExprPositionFrom(toks: Vector[(String, Int)], kwIdx: Int): Boolean = {
    if (kwIdx < 1) return false
    if (toks(kwIdx - 1)._1 == "DISTINCT") {
      val j = if (kwIdx >= 2 && toks(kwIdx - 2)._1 == "NOT") kwIdx - 3 else kwIdx - 2
      return j >= 0 && toks(j)._1 == "IS"
    }
    var i = kwIdx - 1
    if (toks(i)._1 == ")") { // WEEK(MONDAY) FROM …
      var depth = 0
      var done = false
      while (i >= 0 && !done) {
        toks(i)._1 match {
          case ")" => depth += 1
          case "(" => depth -= 1; if (depth == 0) done = true
          case _ =>
        }
        if (!done) i -= 1
      }
      if (!done) return false
      i -= 1
    }
    i >= 1 && exprUnits(toks(i)._1) && toks(i - 1)._1 == "("
  }

  /** Known limitation: only the FIRST table after a FROM is mapped —
    * comma-join lists (`FROM p.d.a, p.d.b`) are not, because a comma
    * also separates SELECT-list struct paths and mapping those would
    * corrupt expressions. Use ANSI JOIN syntax for multi-table FQNs.
    */
  def mapSourceFqns(sql: String): String = {
    val literalSpans = stringLit.findAllMatchIn(sql).map(m => (m.start, m.end)).toVector
    def inLiteral(p: Int) = literalSpans.exists(s => p >= s._1 && p < s._2)
    val toks = StatementSplitter.tokens(sql)
    fqnRef.replaceAllIn(sql, m => {
      val kwIdx = toks.indexWhere(_._2 == m.start)
      val clean = m.group(2).replace("`", "").replaceAll("\\s", "")
      java.util.regex.Matcher.quoteReplacement(clean.split("\\.") match {
        case Array(p, d, t) if !inLiteral(m.start) &&
            !(kwIdx >= 0 && isExprPositionFrom(toks, kwIdx)) =>
          s"${m.group(1)} ${p.replace("-", "_")}__${d.replace("-", "_")}.`$t`"
        case _ => m.group(0)
      })
    })
  }

  /** `mapFqns = false` is for lineage parsing, which must see the
    * ORIGINAL BigQuery identifiers (its output is BigQuery URNs).
    */
  def rewrite(sql: String, mapFqns: Boolean = true): String = {
    // BigQuery NUMERIC is DECIMAL(38,9); Spark's NUMERIC keyword means
    // DECIMAL(10,0) — rewrite to BigQuery semantics (outside literals only)
    var out = mapOutsideLiterals(if (mapFqns) mapSourceFqns(sql) else sql)(
      _.replaceAll(raw"(?i)\bNUMERIC\b", "DECIMAL(38,9)"))
    out = inUnnest.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        if (m.group(2) != null) s"(NOT array_contains(${m.group(3)}, ${m.group(1)}))"
        else s"array_contains(${m.group(3)}, ${m.group(1)})"))
    out = dateTz.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"to_date(from_utc_timestamp(${m.group(1)}, '${m.group(2)}'))"))
    out = timestampCall.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"to_timestamp(replace('${m.group(1)}', 'T', ' '))"))
    out = mapOutsideLiterals(out)(selectAsStruct.replaceAllIn(_, "SELECT "))
    out
  }

  /** Normalize a BigQuery table identifier for the Spark catalog:
    * strip backticks; `$YYYYMMDD` partition decorators split off
    * (`loader.py:25-26`); `:` project separator → `.`
    * (`main.go:500-506`).
    */
  def normalizeTableName(name: String): (String, Option[String]) = {
    val clean = name.replace("`", "").replace(":", ".")
    clean.split("\\$", 2) match {
      case Array(t, dec) => (t, Some(dec))
      case Array(t) => (t, None)
    }
  }
}
