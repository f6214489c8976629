package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Mini script interpreter for the BigQuery scripting surface the corpus
  * exercises (`samples/tasks/select/script/query.sql`, the generated
  * REPLACE_MERGE script `query.py:6-38`):
  *
  *   DECLARE v TYPE;  DECLARE v TYPE DEFAULT expr;
  *   SET v = expr;    SET (v) = (SELECT AS STRUCT ...);
  *   CREATE TEMP TABLE name AS (select ...);
  *   <final DML/CTE statement>  → returned as DataFrame
  *
  * Session variables are substituted textually (word-boundary regex,
  * like the macro layer) after being evaluated driver-side — each is a
  * scalar or small array by construction. Temp tables become Spark temp
  * views (distributed, never collected).
  */
class ScriptRunner(spark: SparkSession) {
  private val variables = mutable.LinkedHashMap[String, String]()

  private val declareRe =
    raw"(?is)^DECLARE\s+(\w+)\s+([\w<>,() ]+?)(?:\s+DEFAULT\s+(.+))?$$".r
  private val setSimpleRe = raw"(?is)^SET\s+(\w+)\s*=\s*(.+)$$".r
  private val setStructRe = raw"(?is)^SET\s*\(\s*(\w+)\s*\)\s*=\s*\((.+)\)$$".r
  private val createTempRe =
    raw"(?is)^CREATE\s+TEMP(?:ORARY)?\s+TABLE\s+`?([\w.]+)`?\s+AS\s*\((.+)\)$$|^CREATE\s+TEMP(?:ORARY)?\s+TABLE\s+`?([\w.]+)`?\s+AS\s+(.+)$$".r
  private val createFnJsRe =
    raw"(?is)^CREATE\s+TEMP(?:ORARY)?\s+FUNCTION\s+(\w+).*\bLANGUAGE\s+js\b.*$$".r
  private val createFnRe =
    raw"(?is)^CREATE\s+TEMP(?:ORARY)?\s+FUNCTION\s+(\w+)\s*\(([^)]*)\)\s*(?:RETURNS\s+([\w<>, ()]+?))?\s*AS\s*\((.+)\)\s*$$".r

  /** BigQuery scalar type names → Spark SQL DDL types. */
  private def sparkType(t: String): String = {
    val up = t.trim.toUpperCase
    up match {
      case "INT64" => "BIGINT"
      case "FLOAT64" => "DOUBLE"
      case "NUMERIC" => "DECIMAL(38,9)"
      case "BOOL" => "BOOLEAN"
      case "BYTES" => "BINARY"
      case "DATETIME" => "TIMESTAMP_NTZ"
      case s if s.startsWith("ARRAY<") =>
        s"ARRAY<${sparkType(s.stripPrefix("ARRAY<").stripSuffix(">"))}>"
      case other => other
    }
  }

  /** Render declared variables into a statement (word-boundary safe). */
  private def substituteVars(sql: String): String =
    variables.foldLeft(sql) { case (acc, (name, value)) =>
      acc.replaceAll(raw"\b" + java.util.regex.Pattern.quote(name) + raw"\b",
        java.util.regex.Matcher.quoteReplacement(value))
    }

  /** Evaluate a scalar/array expression driver-side → SQL literal text. */
  private def evalToLiteral(expr: String): String = {
    val df = spark.sql(s"SELECT ${Dialect.rewrite(substituteVars(expr))}")
    val row = df.collect()(0)
    literalOf(row.get(0))
  }

  private def literalOf(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "\\'") + "'"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case a: scala.collection.Seq[_] => a.map(literalOf).mkString("array(", ", ", ")")
    case r: org.apache.spark.sql.Row =>
      // SELECT AS STRUCT with one field unwraps to that field's value
      if (r.length == 1) literalOf(r.get(0))
      else r.toSeq.map(literalOf).mkString("struct(", ", ", ")")
    case other => other.toString
  }

  /** Execute all statements; returns the result of the last one that
    * produces rows (the "body"), if any.
    */
  def run(script: String): Option[DataFrame] = {
    var last: Option[DataFrame] = None
    StatementSplitter.split(script).foreach { stmt =>
      runStatement(stmt).foreach(df => last = Some(df))
    }
    last
  }

  /** Render non-control statements with variables substituted WITHOUT
    * executing any writes — lineage support for scripts whose table
    * references only appear after substitution (cf. the reference's
    * fake-select probing, `main.go:282-323`). Variable evaluation runs
    * driver-side scalar SELECTs only; failures leave the variable NULL
    * so rendering never aborts lineage extraction.
    */
  def renderStatements(script: String): Seq[String] =
    StatementSplitter.split(script).flatMap { stmt =>
      stmt match {
        case declareRe(name, _, default) =>
          variables(name) =
            if (default != null) scala.util.Try(evalToLiteral(default)).getOrElse("NULL")
            else "NULL"
          Seq.empty
        case setStructRe(name, select) =>
          variables(name) = scala.util.Try {
            literalOf(spark.sql(Dialect.rewrite(substituteVars(select.trim))).collect()(0))
          }.getOrElse("NULL")
          Seq.empty
        case setSimpleRe(name, e) if !stmt.trim.toUpperCase.startsWith("SET (") =>
          variables(name) = scala.util.Try(evalToLiteral(e)).getOrElse("NULL")
          Seq.empty
        case _ => Seq(substituteVars(stmt))
      }
    }

  def runStatement(stmt: String): Option[DataFrame] = stmt match {
    case declareRe(name, _, default) =>
      variables(name) = if (default != null) evalToLiteral(default) else "NULL"
      None
    case setStructRe(name, select) =>
      variables(name) = {
        val sql = Dialect.rewrite(substituteVars(select.trim))
        val row = spark.sql(sql).collect()(0)
        literalOf(row)
      }
      None
    case setSimpleRe(name, expr) if !stmt.trim.toUpperCase.startsWith("SET (") =>
      variables(name) = evalToLiteral(expr)
      None
    case createFnJsRe(name) =>
      // SURVEY §7.2: JS-body UDFs are out of scope; the engine accepts a
      // registered Scala equivalent instead.
      throw new UnsupportedOperationException(
        s"JS UDF '$name' is not executable here. Register an equivalent before " +
          s"""running the script: either spark.udf.register("$name", (…) => …) """ +
          s"from Scala, or a SQL-bodied `CREATE TEMP FUNCTION $name(…) AS (…)` " +
          "which this engine translates to a Spark SQL UDF")
    case createFnRe(name, params, returns, body) =>
      // BigQuery SQL-bodied temp function → Spark 4 SQL UDF
      val sparkParams = params.split(",").filter(_.trim.nonEmpty).map { p =>
        val Array(n, t) = p.trim.split("\\s+", 2)
        s"$n ${sparkType(t)}"
      }.mkString(", ")
      val ret = Option(returns).map(r => s" RETURNS ${sparkType(r)}").getOrElse("")
      spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $name($sparkParams)$ret " +
        s"RETURN ${Dialect.rewrite(body)}")
      None
    case createTempRe(n1, q1, n2, q2) =>
      val (name, query) = if (n1 != null) (n1, q1) else (n2, q2)
      val viewName = name.split("\\.").last // temp views are single-part
      spark.sql(Dialect.rewrite(substituteVars(query)))
        .createOrReplaceTempView(viewName)
      None
    case other =>
      Some(spark.sql(Dialect.rewrite(substituteVars(other))))
  }
}
