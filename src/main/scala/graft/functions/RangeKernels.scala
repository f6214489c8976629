package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Expression, GetStructField, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Or, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.StructType

/** BigQuery RANGE<T> support. The engine represents a range value as
  * `STRUCT<range_start T, range_end T>` — half-open [start, end), a
  * NULL bound meaning unbounded, exactly BigQuery's model (reference
  * surface: BigQuery range functions; no Spark counterpart exists).
  * Construction/overlap/intersection are pure-SQL rewrites in the
  * dialect; RANGE_CONTAINS lives here because its second argument is
  * EITHER a point or another range — the dispatch needs the resolved
  * type, not text.
  */
case class BqRangeContains(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {

  private def field(e: Expression, name: String): Expression = {
    val st = e.dataType.asInstanceOf[StructType]
    GetStructField(e, st.fieldIndex(name), Some(name))
  }

  override lazy val replacement: Expression = {
    val s1 = field(left, "range_start")
    val e1 = field(left, "range_end")
    right.dataType match {
      case st: StructType if st.fieldNames.contains("range_start") =>
        // range ⊇ range: an unbounded side of the OUTER range always
        // covers; an unbounded side of the INNER range needs the outer
        // side unbounded too.
        val s2 = field(right, "range_start")
        val e2 = field(right, "range_end")
        And(
          Or(IsNull(s1), And(IsNotNull(s2), LessThanOrEqual(s1, s2))),
          Or(IsNull(e1), And(IsNotNull(e2), GreaterThanOrEqual(e1, e2))))
      case _ =>
        // point containment: start <= v < end, NULL bound = unbounded
        And(
          Or(IsNull(s1), LessThanOrEqual(s1, right)),
          Or(IsNull(e1), LessThan(right, e1)))
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BqRangeContains = copy(left = newLeft, right = newRight)
}

/** GENERATE_RANGE_ARRAY(range, step, include_last_partial): splits a
  * bounded range into step-width subranges, the trailing partial
  * subrange kept or dropped by the flag (BigQuery default: kept). The
  * step arrives as micros (parsed from the INTERVAL literal by the
  * dialect); DATE-element ranges require a whole-day step. Unbounded
  * input errors, as in BigQuery — never a silent NULL. Interpreted
  * eval (CodegenFallback): this is a constructor, not a hot-path
  * kernel.
  */
case class BqGenRangeArray(child: Expression, stepMicros: Long,
    includeLast: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[StructType].fields(0).dataType

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    if (row.isNullAt(0) || row.isNullAt(1))
      throw new IllegalArgumentException(
        "GENERATE_RANGE_ARRAY: range must be bounded on both sides")
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    elemType match {
      case DateType =>
        require(stepMicros % 86400000000L == 0,
          "GENERATE_RANGE_ARRAY: DATE range requires a whole-day step")
        val d = (stepMicros / 86400000000L).toInt
        val s = row.getInt(0)
        val e = row.getInt(1)
        var lo = s
        while (lo + d <= e) { out += InternalRow(lo, lo + d); lo += d }
        if (includeLast && lo < e) out += InternalRow(lo, e)
      case TimestampType | TimestampNTZType =>
        val s = row.getLong(0)
        val e = row.getLong(1)
        var lo = s
        while (lo + stepMicros <= e) {
          out += InternalRow(lo, lo + stepMicros); lo += stepMicros
        }
        if (includeLast && lo < e) out += InternalRow(lo, e)
      case other =>
        throw new IllegalArgumentException(
          s"GENERATE_RANGE_ARRAY: unsupported range element type $other")
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BqGenRangeArray =
    copy(child = newChild)
}

object RangeKernels {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{BooleanType, LongType}

  /** Register `graft_range_contains` / `graft_gen_range_array`
    * (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_range_contains"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_range_contains", exprs => BqRangeContains(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gen_range_array", exprs => {
        val step = exprs(1) match {
          case Literal(v: Long, LongType) => v
          case other => throw new IllegalArgumentException(
            s"graft_gen_range_array: step must be a literal, got $other")
        }
        val inc = exprs(2) match {
          case Literal(b: Boolean, BooleanType) => b
          case other => throw new IllegalArgumentException(
            s"graft_gen_range_array: include flag must be a literal, got $other")
        }
        BqGenRangeArray(exprs(0), step, inc)
      }, "scala_udf")
  }
}
