package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression, Literal, Round, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, LongType}

/** BigQuery CAST(… AS INT64) semantics, which Spark's legacy cast gets
  * silently wrong in two ways (reference surface: any BigQuery SQL with
  * a numeric cast, e.g. `bq2bq` task queries):
  *
  *   - FLOAT64/NUMERIC → INT64 rounds HALF AWAY FROM ZERO in BigQuery
  *     (`CAST(2.5 AS INT64)` = 3, `CAST(-2.5 AS INT64)` = -3); Spark's
  *     cast truncates toward zero (2, -2) — silently different data.
  *   - CAST errors on non-numeric strings / NaN / overflow in BigQuery
  *     (SAFE_CAST returns NULL); Spark's legacy cast returns NULL (or
  *     wraps) silently.
  *
  * Lowered by the dialect to `graft_int64` / `graft_int64_safe`. The
  * replacement is plain Round+Cast, so whole-stage codegen is
  * unaffected. Rounding uses Spark's Round (BigDecimal HALF_UP on the
  * decimal rendering = ties away from zero — BigQuery's and DuckDB's
  * rule); the final cast runs ANSI (loud) or TRY (SAFE_CAST → NULL).
  */
case class BqInt64Cast(child: Expression, safe: Boolean)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = {
    val mode = if (safe) EvalMode.TRY else EvalMode.ANSI
    child.dataType match {
      case DoubleType | FloatType | _: DecimalType =>
        Cast(Round(child, Literal(0)), LongType, None, mode)
      case LongType => child
      case _ => Cast(child, LongType, None, mode)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): BqInt64Cast =
    copy(child = newChild)
}

object NumCasts {
  /** Register `graft_int64` / `graft_int64_safe` / `graft_try`
    * (idempotent). `graft_try` is Catalyst's own TryEval (codegen'd
    * try/catch → NULL); the dialect wraps SAFE.-prefixed calls whose
    * lowering can throw (FROM_BASE32, RANGE…, see Dialect.safeWrapFns)
    * so they return NULL like BigQuery instead of erroring.
    */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_int64"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_int64", exprs => BqInt64Cast(exprs.head, safe = false), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_int64_safe", exprs => BqInt64Cast(exprs.head, safe = true), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_try", exprs =>
        org.apache.spark.sql.catalyst.expressions.TryEval(exprs.head), "scala_udf")
  }
}
