package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression, Literal, Round, RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{BinaryType, DataType, DecimalType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** BigQuery `STRING(x)` — one name, two overloads, resolved at analysis
  * time by the child's type (closes the round-9 "quoted STRING(json)"
  * skip): a STRING child is a JSON value in this engine (JSON values
  * are canonical JSON text), so the strict converter applies — the JSON
  * must BE a string (`"foo"` → foo, JSON null → NULL, anything else is
  * an error; SAFE.STRING → NULL via graft_try). Any other child type
  * takes the cast path (timestamp overload), unchanged from before.
  */
case class BqStringOf(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case StringType => JsonStrictString(child)
    case _ => Cast(child, StringType, Some(SQLConf.get.sessionLocalTimeZone))
  }
  override protected def withNewChildInternal(newChild: Expression): BqStringOf =
    copy(child = newChild)
}

/** CAST(x AS STRING), type-dispatched (r11): a BINARY child must decode
  * STRICTLY as UTF-8 — BigQuery errors on invalid sequences, while
  * Spark's binary→string cast silently substitutes U+FFFD (probe r11).
  * Every other child type keeps Spark's codegen'd Cast unchanged.
  * SAFE_CAST wraps the whole thing in graft_try → NULL.
  */
case class BqCastString(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case BinaryType => StrictUtf8Decode(child)
    case _ => Cast(child, StringType, Some(SQLConf.get.sessionLocalTimeZone))
  }
  override protected def withNewChildInternal(newChild: Expression): BqCastString =
    copy(child = newChild)
}

/** Strict UTF-8 decode: malformed input raises (CharsetDecoder's
  * default REPORT action), matching BigQuery's CAST(BYTES AS STRING).
  */
case class StrictUtf8Decode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      UTF8String.fromString(
        dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          "CAST(BYTES AS STRING): invalid UTF-8 (use " +
            "SAFE_CONVERT_BYTES_TO_STRING for the replacing decode)")
    }
  }
  override protected def withNewChildInternal(newChild: Expression): StrictUtf8Decode =
    copy(child = newChild)
}

/** Type-borrowing cast: `graft_cast_like(v, like)` casts v to like's
  * RESOLVED type; like's value is never used (the optimizer's
  * ReplaceExpressions drops it). PERCENTILE_DISC's lowering restores
  * BigQuery's input-type preservation with it — Spark's
  * percentile_disc widens the result to DOUBLE, but the selected value
  * is an actual input element, so the cast back is exact.
  */
case class CastLikeExpr(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override lazy val replacement: Expression =
    if (left.dataType == right.dataType) left
    else Cast(left, right.dataType, Some(SQLConf.get.sessionLocalTimeZone))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CastLikeExpr =
    copy(left = newLeft, right = newRight)
}

/** Strict JSON→STRING conversion kernel: Jackson-decoded so escapes
  * (\n, \uXXXX) unwrap exactly like BigQuery; non-string JSON is loud.
  */
case class JsonStrictString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString.trim
    if (s == "null") return null
    if (!s.startsWith("\"")) throw new IllegalArgumentException(
      s"STRING(json): JSON value is not a string: $s")
    UTF8String.fromString(mapper.readTree(s).asText())
  }
  override protected def withNewChildInternal(newChild: Expression): JsonStrictString =
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_string_of", exprs => BqStringOf(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cast_like", exprs => CastLikeExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cast_string", exprs => BqCastString(exprs.head), "scala_udf")
  }
}
