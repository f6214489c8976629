package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the bit-sketch hot loops
  * (SimHash / sign-random-projection). The SQL higher-order-function
  * formulations (`aggregate(sequence(0,63), ...)`) evaluate one
  * interpreted lambda step per element per bit — O(tokens × 64) closure
  * dispatches per row. These expressions run the same arithmetic as a
  * single compiled loop per row, ~10× faster at sf0.1 and the right
  * shape for 100 TB (row-local, no shuffle, null-safe).
  */

/** 64-bit SimHash over an array of 64-bit token hashes: bit j of the
  * result is set iff Σ_tokens (bit j set ? +1 : −1) > 0.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
}

/** 16-bit sign-random-projection signature over a quantized int64
  * embedding: bit p = sign(Σ_i q(i) · w(p,i)) with the deterministic
  * pseudo-weights w(p,i) = ((p·131 + i·37) mod 7) − 3.
  */
case class SrpSignature(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0
    var p = 0
    while (p < 16) {
      var dot = 0L
      var i = 0
      while (i < n) {
        dot += arr.getLong(i) * (((p * 131 + i * 37) % 7) - 3)
        i += 1
      }
      if (dot > 0L) sig |= (1 << p)
      p += 1
    }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression): SrpSignature = copy(newChild)
}

/** Distinct word-3-gram shingles over a token array, as one compiled
  * loop per row. The SQL formulation
  * `array_distinct(transform(sequence(1, n-2), i -> concat(...)))`
  * dispatches three interpreted lambda closures per shingle and then an
  * O(n²)-ish interpreted distinct pass — measured ~3× slower per pass
  * and evaluated once per downstream consumer. Shared by the MinHash,
  * Jaccard, and contamination operators.
  */
case class WordShingles(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + 2 < n) {
      out.add(UTF8String.concatWs(UTF8String.fromString(" "),
        toks.getUTF8String(i), toks.getUTF8String(i + 1), toks.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(newChild)
}

object BitSketchExpressions {
  /** Register SQL functions `graft_simhash64`, `graft_srp_sig` on the
    * session (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp_sig", exprs => SrpSignature(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs.head), "scala_udf")
  }
}
