package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the bit-sketch hot loops
  * (SimHash / sign-random-projection / shingling / MinHash). The SQL
  * higher-order-function formulations (`aggregate(sequence(0,63), ...)`)
  * evaluate one interpreted lambda step per element per bit — O(tokens ×
  * 64) closure dispatches per row. These expressions run the same
  * arithmetic as a single compiled loop per row, ~10× faster at sf0.1
  * and the right shape for 100 TB (row-local, no shuffle, null-safe).
  *
  * Each expression generates code (a static kernel call) instead of
  * CodegenFallback, so the stage around it stays inside whole-stage
  * codegen — a fallback expression would force the WHOLE projection
  * into interpreted mode, which matters when `graft_md5_60` runs once
  * per exploded token (d42) or shingle (d30/d43).
  */

/** Row-level kernels shared by the interpreted (`nullSafeEval`) and
  * generated (`doGenCode`) paths. A top-level object gets static
  * forwarders, so generated Java calls these directly. The MD5 digest
  * is per-thread, not per-row.
  */
object SketchKernels {

  /** Unicode normalization (NFC/NFKC/NFD/NFKD) — BigQuery NORMALIZE. */
  def unicodeNormalize(s: UTF8String, form: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form.toString)))

  private val deflater = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6))
  private val deflateBuf = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](1 << 16))

  /** zlib (level 6) compressed byte length of the UTF-8 text — the
    * Gopher-family repetitiveness signal. The Deflater and output
    * buffer are per-thread, reset per row: no per-row allocation, and
    * the expression stays inside whole-stage codegen (the previous
    * `mapPartitions` form paid a full Dataset ser/deser boundary).
    */
  def deflateLength(s: UTF8String): Long = {
    val d = deflater.get()
    val buf = deflateBuf.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  // specialized single-purpose MD5 (no input copy, no digest alloc,
  // unrolled compression) — bit-identical to the MessageDigest path it
  // replaced, enforced by Md5KernelSpec's property test
  private def digest60(s: UTF8String): Long = Md5Kernel.prefix60(s)

  /** Big-endian long of the first 8 md5 bytes, shifted right 4 —
    * numerically identical to parsing the first 15 hex digest chars:
    * Spark `conv(substring(md5(x),1,15),16,10)`, DuckDB
    * `('0x' || substring(md5(x),1,15))::BIGINT`.
    */
  def md5Long60(s: UTF8String): Long = digest60(s)

  /** Bit j of the result is set iff Σ_tokens (bit j set ? +1 : −1) > 0. */
  def simhash64(arr: ArrayData): Long = {
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

  /** Bit p = sign(Σ_i q(i)·w(p,i)), w(p,i) = ((p·131 + i·37) mod 7) − 3. */
  def srpSignature(arr: ArrayData): Int = {
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

  /** Distinct word-3-gram shingles, insertion-ordered. */
  def wordShingles(toks: ArrayData): ArrayData = {
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

  /** Rolling Rabin window fingerprints over an array of token hashes —
    * the ExactSubstr hashing design: one md5 per TOKEN upstream, then
    * O(1) work per window here, vs one md5 over W concatenated tokens
    * per window (O(n·W) bytes hashed). Two independent 31-bit
    * fingerprints (bases 131/137 mod 2³¹−1) combine into one 62-bit
    * value, so cross-window collisions stay negligible at 10⁹+ docs.
    * Windows are fixed at 8 tokens (the power tables are pinned so the
    * DuckDB oracle can replay them as literals). Every intermediate
    * stays < 2⁶² — no overflow in either engine.
    */
  def rollingWindowHashes(hs: ArrayData, w: Int): ArrayData = {
    require(w == 8, "power tables are pinned for 8-token windows")
    val P = 2147483647L
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val pw1 = 2003465299L // 131^7 mod P — top-position multiplier
    val pw2 = 671643304L  // 137^7 mod P
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < w) { // first window
      val t = hs.getLong(i) % P
      h1 = (h1 * 131L + t) % P
      h2 = (h2 * 137L + t) % P
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    out(0) = h1 * 2147483648L + h2
    i = w
    while (i < n) {
      val drop = hs.getLong(i - w) % P
      val add = hs.getLong(i) % P
      h1 = (java.lang.Math.floorMod(h1 - drop * pw1 % P, P) * 131L + add) % P
      h2 = (java.lang.Math.floorMod(h2 - drop * pw2 % P, P) * 137L + add) % P
      out(i - w + 1) = h1 * 2147483648L + h2
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact int64 dot product — Σ a(i)·b(i) over the common prefix.
    * Sum order is irrelevant for ints, so results are identical to any
    * HOF/SQL formulation; this exists because `aggregate(zip_with(…))`
    * allocates a zipped intermediate array and dispatches two
    * interpreted lambdas per element PER CANDIDATE PAIR — the inner
    * loop of every ANN scoring join.
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Exact int64 squared L2 distance — Σ (a(i) − b(i))². */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** 32 MinHash values: base = md5Long60(shingle) mod p (p = 2^31 − 1),
    * h_j = (base·(1103515245 + 12345·j) + j·987654321) mod p, minimized
    * over shingles per j. The affine maps wrap mod p (essential — see
    * d07's comment on degenerate buckets); every operand stays < 2^62.
    */
  // affine-map coefficients hoisted out of the per-shingle loop: values
  // identical to the inline 1103515245 + 12345·j / j·987654321 forms
  private val mhMult: Array[Long] = Array.tabulate(32)(j => 1103515245L + 12345L * j)
  private val mhAdd: Array[Long] = Array.tabulate(32)(j => j * 987654321L)

  def minhash32(arr: ArrayData): ArrayData = {
    val P = 2147483647L
    val n = arr.numElements()
    val mins = Array.fill(32)(Long.MaxValue)
    val mult = mhMult
    val add = mhAdd
    var i = 0
    while (i < n) {
      val base = digest60(arr.getUTF8String(i)) % P
      var j = 0
      while (j < 32) {
        val h = (base * mult(j) + add(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash over an array of 64-bit token hashes. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
}

/** 16-bit sign-random-projection signature over a quantized int64
  * embedding.
  */
case class SrpSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.srpSignature(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.srpSignature($c)")
  override protected def withNewChildInternal(newChild: Expression): SrpSignature = copy(newChild)
}

/** Distinct word-3-gram shingles over a token array, as one compiled
  * loop per row. The SQL formulation
  * `array_distinct(transform(sequence(1, n-2), i -> concat(...)))`
  * dispatches three interpreted lambda closures per shingle and then an
  * O(n²)-ish interpreted distinct pass — measured ~3× slower per pass.
  * Shared by the MinHash, Jaccard, and contamination operators.
  */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.wordShingles(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.wordShingles($c)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(newChild)
}

/** Engine-portable 60-bit md5-prefix hash (see
  * [[SketchKernels.md5Long60]]).
  */
case class Md5Long60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.md5Long60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.md5Long60($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Long60 = copy(newChild)
}

/** 32 MinHash values over an array of shingle strings (see
  * [[SketchKernels.minhash32]]). Doing all 32 permutations in registers
  * beats the SQL higher-order-function form, which Catalyst's project
  * collapsing can inline into each of the 32 lambda branches —
  * recomputing the digest pass 32× (measured: ~10× slowdown of the
  * whole query at sf0.1).
  */
case class MinHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.minhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHash32 = copy(newChild)
}

/** 62-bit rolling Rabin fingerprints of every 8-token window over an
  * array of token hashes (see [[SketchKernels.rollingWindowHashes]]).
  */
case class RollingWindowHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.rollingWindowHashes(input.asInstanceOf[ArrayData], 8)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.rollingWindowHashes($c, 8)")
  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(newChild)
}

/** Exact int64 dot product of two bigint arrays, one compiled loop per
  * pair (see [[SketchKernels.dotLong]]).
  */
case class DotLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotLong = copy(newLeft, newRight)
}

/** Exact int64 squared L2 distance of two bigint arrays (see
  * [[SketchKernels.sqDistLong]]).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchKernels.sqDistLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistLong = copy(newLeft, newRight)
}

/** Unicode normalization of a string to the form named by the second
  * argument (NFC/NFKC/NFD/NFKD) — backs BigQuery's NORMALIZE and
  * NORMALIZE_AND_CASEFOLD (see [[SketchKernels.unicodeNormalize]]).
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.unicodeNormalize(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchKernels.unicodeNormalize($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UnicodeNormalize = copy(newLeft, newRight)
}

/** zlib-compressed byte length (see [[SketchKernels.deflateLength]]). */
case class DeflateLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.deflateLength(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.deflateLength($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLength = copy(newChild)
}

object BitSketchExpressions {
  /** Register SQL functions `graft_simhash64`, `graft_srp_sig`,
    * `graft_shingles`, `graft_md5_60`, `graft_minhash32`,
    * `graft_dot_i64`, `graft_l2_i64` on the session (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    // register once per session: createOrReplaceTempFunction logs a
    // "replaced a previously registered function" warning on every
    // call, and gates call register() per query — 244×3 runs of spam
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_i64"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_i64", exprs => DotLong(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2_i64", exprs => SqDistLong(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling8", exprs => RollingWindowHashes(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp_sig", exprs => SrpSignature(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5_60", exprs => Md5Long60(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash32", exprs => MinHash32(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", exprs => UnicodeNormalize(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deflate_len", exprs => DeflateLength(exprs.head), "scala_udf")
    FarmHashExpressions.register(spark)
    TextExpressions.register(spark)
    NumCasts.register(spark)
    RangeKernels.register(spark)
    IntervalExpressions.register(spark)
    JsonMutators.register(spark)
    NetKernels.register(spark)
    PublicSuffix.register(spark)
    AeadKernels.register(spark)
    GeoKernels.register(spark)
    TopCount.register(spark)
    KllSketch.register(spark)
  }
}
