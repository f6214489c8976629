package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, GetStructField, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.StructType

/** GEOGRAPHY accessor kernels. Points are STRUCT<lon, lat>, linestrings
  * ARRAY<point> (see Dialect's ST_* lowerings). ST_X/ST_Y must be LOUD
  * on a non-point argument like BigQuery — a plain text-level `.lon`
  * silently MAPS over an array of structs (Spark's GetArrayStructFields
  * returns the array of field values), which surfaced when
  * ST_GEOGFROMTEXT gained its LINESTRING overload (r11). The typed
  * dispatch happens at analysis time via RuntimeReplaceable.
  */
case class PointFieldExpr(child: Expression, fn: String, field: String)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case s: StructType if s.fieldNames.contains(field) =>
      GetStructField(child, s.fieldIndex(field), Some(field))
    case other => throw new IllegalArgumentException(
      s"$fn: requires a GEOGRAPHY point, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(newChild: Expression): PointFieldExpr =
    copy(child = newChild)
}

object GeoKernels {
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_st_x"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_x", e => PointFieldExpr(e.head, "ST_X", "lon"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_y", e => PointFieldExpr(e.head, "ST_Y", "lat"), "scala_udf")
  }
}
