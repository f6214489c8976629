package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FarmHash Fingerprint64 (Google FarmHash, public spec: farmhash.cc's
  * `farmhashna::Hash64`, which `Fingerprint64` delegates to) — the
  * function behind BigQuery's `FARM_FINGERPRINT`
  * (reference surface: executor SQL may call FARM_FINGERPRINT on
  * arbitrary columns; see COVERAGE.md packs 3–4 row). The fingerprint
  * is portable by definition — no seeds, no per-platform dispatch —
  * so results here must equal BigQuery's for identical input bytes.
  * Pure integer math per row, no allocation beyond the byte copy.
  */
object FarmHashKernels {
  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def rotate(v: Long, s: Int): Long = java.lang.Long.rotateRight(v, s)
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= (a >>> 47)
    var b = (v ^ a) * mul
    b ^= (b >>> 47)
    b * mul
  }

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long =
    if (len >= 8) {
      val mul = k2 + len * 2L
      val a = fetch64(s, off) + k2
      val b = fetch64(s, off + len - 8)
      val c = rotate(b, 37) * mul + a
      val d = (rotate(a, 25) + b) * mul
      hashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = k2 + len * 2L
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4), mul)
    } else if (len > 0) {
      val a = (s(off) & 0xff).toLong
      val b = (s(off + (len >> 1)) & 0xff).toLong
      val c = (s(off + len - 1) & 0xff).toLong
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * k2 ^ z * k0) * k2
    } else k2

  private def hashLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = k2 + len * 2L
    val a = fetch64(s, off) * k1
    val b = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * k2
    hashLen16(rotate(a + b, 43) + rotate(c, 30) + d,
      a + rotate(b + k2, 18) + c, mul)
  }

  private def hashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = k2 + len * 2L
    val a = fetch64(s, off) * k2
    val b = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * k2
    val y = rotate(a + b, 43) + rotate(c, 30) + d
    val z = hashLen16(y, a + rotate(b + k2, 18) + c, mul)
    val e = fetch64(s, off + 16) * mul
    val f = fetch64(s, off + 24)
    val g = (y + fetch64(s, off + len - 32)) * mul
    val h = (z + fetch64(s, off + len - 24)) * mul
    hashLen16(rotate(e + f, 43) + rotate(g, 30) + h,
      e + rotate(f + a, 18) + g, mul)
  }

  // returns the pair packed into an Array(first, second) — one tiny
  // allocation per 32-byte block; clarity over micro-optimizing here
  private def weakHash(s: Array[Byte], off: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(s, off); val x = fetch64(s, off + 8)
    val y = fetch64(s, off + 16); val z = fetch64(s, off + 24)
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  /** farmhashna::Hash64 of the byte array = FarmHash Fingerprint64. */
  def fingerprint64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 16) return hashLen0to16(s, 0, len)
    if (len <= 32) return hashLen17to32(s, 0, len)
    if (len <= 64) return hashLen33to64(s, 0, len)
    val seed = 81L
    var x = seed
    var y = seed * k1 + 113L
    var z = shiftMix(y * k2 + 113L) * k2
    var vF = 0L; var vS = 0L
    var wF = 0L; var wS = 0L
    x = x * k2 + fetch64(s, 0)
    // after the loop, 1..64 bytes remain; last64 is the final 64 bytes
    val endOff = ((len - 1) / 64) * 64
    val last64 = endOff + ((len - 1) & 63) - 63
    var off = 0
    while ({
      x = rotate(x + y + vF + fetch64(s, off + 8), 37) * k1
      y = rotate(y + vS + fetch64(s, off + 48), 42) * k1
      x ^= wS
      y += vF + fetch64(s, off + 40)
      z = rotate(z + wF, 33) * k1
      val v = weakHash(s, off, vS * k1, x + wF)
      vF = v._1; vS = v._2
      val w = weakHash(s, off + 32, z + wS, y + fetch64(s, off + 16))
      wF = w._1; wS = w._2
      val t = z; z = x; x = t
      off += 64
      off != endOff
    }) ()
    val mul = k1 + ((z & 0xffL) << 1)
    wF += ((len - 1) & 63).toLong
    vF += wF
    wF += vF
    x = rotate(x + y + vF + fetch64(s, last64 + 8), 37) * mul
    y = rotate(y + vS + fetch64(s, last64 + 48), 42) * mul
    x ^= wS * 9L
    y += vF * 9L + fetch64(s, last64 + 40)
    z = rotate(z + wF, 33) * mul
    val v = weakHash(s, last64, vS * mul, x + wF)
    vF = v._1; vS = v._2
    val w = weakHash(s, last64 + 32, z + wS, y + fetch64(s, last64 + 16))
    wF = w._1; wS = w._2
    val t = z; z = x; x = t
    hashLen16(hashLen16(vF, wF, mul) + shiftMix(y) * k0 + z,
      hashLen16(vS, wS, mul) + x, mul)
  }

  /** fingerprint64 over a UTF8String's bytes (the BigQuery STRING case). */
  def fingerprint64(s: UTF8String): Long = fingerprint64(s.getBytes)

  /** BigQuery 4-arg INSTR(value, subvalue, position, occurrence):
    * 1-based position of the occurrence-th match searching forward
    * from `position` (or backward from the end when negative — a match
    * must START at or before the resolved position), 0 when absent.
    * position = 0 and occurrence < 1 are errors (loud, as in BigQuery).
    * Positions are UTF-16 units (≡ code points for BMP text; the
    * corpus edge beyond BMP is documented, not silently mangled —
    * matches within any BMP-only string are exact).
    */
  def instr(value: UTF8String, sub: UTF8String, position: Int, occurrence: Int): Long = {
    if (position == 0)
      throw new IllegalArgumentException("INSTR: position must not be 0")
    if (occurrence < 1)
      throw new IllegalArgumentException("INSTR: occurrence must be >= 1")
    val v = value.toString
    val s = sub.toString
    if (s.isEmpty) return 0L
    var left = occurrence
    if (position > 0) {
      var from = position - 1
      while (true) {
        val i = v.indexOf(s, from)
        if (i < 0) return 0L
        left -= 1
        if (left == 0) return (i + 1).toLong
        from = i + 1
      }
      0L
    } else {
      var from = v.length + position
      while (true) {
        if (from < 0) return 0L
        val i = v.lastIndexOf(s, from)
        if (i < 0) return 0L
        left -= 1
        if (left == 0) return (i + 1).toLong
        from = i - 1
      }
      0L
    }
  }
}

/** `graft_farm_fingerprint(str)` — FarmHash Fingerprint64 as signed
  * INT64, bit-identical to BigQuery FARM_FINGERPRINT. Codegen'd static
  * kernel call, stays inside whole-stage codegen.
  */
case class FarmFingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    FarmHashKernels.fingerprint64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FarmHashKernels.fingerprint64($c)")
  override protected def withNewChildInternal(newChild: Expression): FarmFingerprint64 =
    copy(child = newChild)
}

/** `graft_instr(value, sub, position, occurrence)` — BigQuery 3/4-arg
  * INSTR (the 2-arg form passes through to Spark's identical `instr`).
  */
case class BqInstr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override protected def nullSafeEval(v: Any, s: Any, p: Any, o: Any): Any =
    FarmHashKernels.instr(v.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String],
      p.asInstanceOf[Int], o.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s, p, o) =>
      s"graft.functions.FarmHashKernels.instr($v, $s, $p, $o)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): BqInstr =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object FarmHashExpressions {
  /** Register `graft_farm_fingerprint` and `graft_instr` (idempotent). */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_farm_fingerprint"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_farm_fingerprint", exprs => FarmFingerprint64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_instr",
      exprs => BqInstr(exprs(0), exprs(1),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(2), IntegerType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(3), IntegerType)),
      "scala_udf")
  }
}
