package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile sketch for the BigQuery KLL_QUANTILES namespace
  * (reference vocabulary: KLL_QUANTILES.INIT_/MERGE_/EXTRACT_* over
  * INT64/FLOAT64). Level-compaction design (KLL lineage): level i
  * holds items of weight 2^i; a level at capacity sorts, keeps every
  * second item from a parity-alternating offset, and promotes the
  * kept items one level up. Consequences the gates rely on:
  *   - EXACT below precision: until level 0 overflows (n < k) no
  *     compaction happens, every item has weight 1, and quantile
  *     extraction is exact order statistics.
  *   - Mergeable: levels concatenate pairwise then re-compact — the
  *     associative/commutative shape a 1000-executor partial
  *     aggregation needs; sketch size stays O(k · log(n/k)).
  * Sketch BYTES are engine-local (`KLL1` magic), NOT DataSketches/
  * BigQuery wire-compatible — documented like the pre-Tink AEAD
  * format; the VALUES roundtrip through the laws the gates pin.
  * The compaction offset is a deterministic parity flip, so a given
  * partition order reproduces; above-precision results, like any KLL,
  * depend on merge order and are approximate by contract.
  */
object KllSketch {
  val MAGIC: Array[Byte] = "KLL1".getBytes("US-ASCII")
  val MIN_K = 16
  val MAX_K = 65536
  val DEFAULT_K = 1000

  final class Buf(var k: Int, var isLong: Boolean) {
    var n: Long = 0L
    var parity: Boolean = false
    val levels = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Double])

    def insert(x: Double): Unit = {
      levels(0) += x
      n += 1
      if (levels(0).length >= k) compact(0)
    }

    private def compact(i: Int): Unit = {
      val lvl = levels(i)
      val sorted = lvl.sorted
      val off = if (parity) 1 else 0
      parity = !parity
      if (i + 1 >= levels.length)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      val up = levels(i + 1)
      var j = off
      while (j < sorted.length) { up += sorted(j); j += 2 }
      lvl.clear()
      if (up.length >= k) compact(i + 1)
    }

    def mergeIn(o: Buf): Unit = {
      if (o.n == 0) return
      if (n == 0) { k = math.min(k, o.k) }
      // merging sketches of different precision keeps the coarser
      // (smaller-k) guarantee, like DataSketches' downsampling merge
      else if (o.k < k) k = o.k
      n += o.n
      var i = 0
      while (i < o.levels.length) {
        if (i >= levels.length)
          levels += scala.collection.mutable.ArrayBuffer.empty[Double]
        levels(i) ++= o.levels(i)
        i += 1
      }
      i = 0
      while (i < levels.length) {
        if (levels(i).length >= k) compact(i)
        i += 1
      }
    }

    /** Weighted order statistic: the smallest value whose cumulative
      * weight reaches ceil(phi·n); phi 0/1 give the exact min/max.
      */
    def quantile(phi: Double): Double = {
      require(n > 0, "empty sketch")
      val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      val sorted = items.sortBy(_._1)
      val target = math.max(1L, math.ceil(phi * n).toLong)
      var cum = 0L
      var j = 0
      while (j < sorted.length) {
        cum += sorted(j)._2
        if (cum >= target) return sorted(j)._1
        j += 1
      }
      sorted.last._1
    }

    def serialize(): Array[Byte] = {
      val used = levels.takeWhile(_ => true) // all levels, trailing empties included
      val sz = 4 + 1 + 4 + 8 + 1 + 4 + used.map(l => 4 + 8 * l.length).sum
      val bb = java.nio.ByteBuffer.allocate(sz)
      bb.put(MAGIC)
      bb.put(if (isLong) 1.toByte else 0.toByte)
      bb.putInt(k)
      bb.putLong(n)
      bb.put(if (parity) 1.toByte else 0.toByte)
      bb.putInt(used.length)
      used.foreach { l =>
        bb.putInt(l.length)
        l.foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte], fn: String): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4)
    if (bytes.length < 22) throw new IllegalArgumentException(
      s"$fn: not a KLL sketch (too short)")
    bb.get(magic)
    if (!java.util.Arrays.equals(magic, MAGIC))
      throw new IllegalArgumentException(
        s"$fn: not a KLL sketch (bad magic — this engine's sketches " +
          "start with 'KLL1'; DataSketches/BigQuery wire sketches are " +
          "not interoperable)")
    val isLong = bb.get() == 1.toByte
    val buf = new Buf(bb.getInt(), isLong)
    buf.n = bb.getLong()
    buf.parity = bb.get() == 1.toByte
    val nLevels = bb.getInt()
    buf.levels.clear()
    var i = 0
    while (i < nLevels) {
      val len = bb.getInt()
      val l = new scala.collection.mutable.ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { l += bb.getDouble(); j += 1 }
      buf.levels += l
      i += 1
    }
    if (buf.levels.isEmpty)
      buf.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    buf
  }

  def requireK(k: Int, fn: String): Int = {
    if (k < MIN_K || k > MAX_K) throw new IllegalArgumentException(
      s"$fn: precision must be in [$MIN_K, $MAX_K], got $k")
    k
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kll_init"))) return
    reg.createOrReplaceTempFunction("graft_kll_init",
      e => KllInitAgg(e(0), e(1), e(2)).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_merge",
      e => KllMergeAgg(e.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_point",
      e => KllPointExpr(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_extract",
      e => KllExtractExpr(e(0), e(1)), "scala_udf")
  }
}

/** KLL_QUANTILES.INIT_INT64 / INIT_FLOAT64 → engine-local sketch
  * bytes. `asLong` tags the sketch so EXTRACT knows the output type.
  */
case class KllInitAgg(
    child: Expression,
    precision: Expression,
    asLong: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.Buf] {

  private lazy val k = KllSketch.requireK(
    precision.eval(null).asInstanceOf[Number].intValue(), "KLL_QUANTILES.INIT")
  private lazy val isLong = asLong.eval(null).asInstanceOf[Boolean]

  override def children: Seq[Expression] = Seq(child, precision, asLong)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): KllSketch.Buf =
    new KllSketch.Buf(k, isLong)

  override def update(buf: KllSketch.Buf, input: InternalRow): KllSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Number].doubleValue())
    buf
  }
  override def merge(b1: KllSketch.Buf, b2: KllSketch.Buf): KllSketch.Buf = {
    b1.mergeIn(b2); b1
  }
  override def eval(buf: KllSketch.Buf): Any =
    if (buf.n == 0) null else buf.serialize()
  override def serialize(buf: KllSketch.Buf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch.Buf =
    KllSketch.deserialize(bytes, "KLL_QUANTILES.INIT")
  override def withNewMutableAggBufferOffset(o: Int): KllInitAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllInitAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllInitAgg =
    copy(child = c(0), precision = c(1), asLong = c(2))
}

/** KLL_QUANTILES.MERGE_PARTIAL: union of sketch columns → one sketch. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): KllSketch.Buf =
    new KllSketch.Buf(KllSketch.MAX_K, false)

  override def update(buf: KllSketch.Buf, input: InternalRow): KllSketch.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val o = KllSketch.deserialize(v.asInstanceOf[Array[Byte]],
        "KLL_QUANTILES.MERGE_PARTIAL")
      buf.isLong = o.isLong
      buf.mergeIn(o)
    }
    buf
  }
  override def merge(b1: KllSketch.Buf, b2: KllSketch.Buf): KllSketch.Buf = {
    if (b2.n > 0) { b1.isLong = b2.isLong; b1.mergeIn(b2) }
    b1
  }
  override def eval(buf: KllSketch.Buf): Any =
    if (buf.n == 0) null else buf.serialize()
  override def serialize(buf: KllSketch.Buf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch.Buf =
    KllSketch.deserialize(bytes, "KLL_QUANTILES.MERGE_PARTIAL")
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg = copy(child = c(0))
}

/** KLL_QUANTILES.EXTRACT_POINT_*: scalar phi-quantile from a sketch;
  * the result type follows the sketch's own INT64/FLOAT64 tag at
  * runtime — INT64 sketches yield LongType through the declared
  * common type (the dialect layer pins the cast).
  */
case class KllPointExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType != BinaryType)
      TypeCheckFailure("KLL_QUANTILES EXTRACT: the sketch must be BYTES")
    else if (!right.dataType.isInstanceOf[NumericType])
      TypeCheckFailure("KLL_QUANTILES EXTRACT: phi must be numeric")
    else TypeCheckSuccess
  }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val buf = KllSketch.deserialize(l.asInstanceOf[Array[Byte]],
      "KLL_QUANTILES.EXTRACT_POINT")
    // bare decimal literals (0.5) reach eval as Spark Decimal
    val phi = r match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }
    if (phi < 0.0 || phi > 1.0) throw new IllegalArgumentException(
      s"KLL_QUANTILES.EXTRACT_POINT: phi must be in [0, 1], got $phi")
    if (buf.n == 0) null else buf.quantile(phi)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllPointExpr =
    copy(left = newLeft, right = newRight)
}

/** KLL_QUANTILES.EXTRACT_*: number+1 quantile boundaries
  * (min, 1/m, …, max) as ARRAY<DOUBLE>; the dialect casts INT64
  * spellings back to ARRAY<INT64>.
  */
case class KllExtractExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType != BinaryType)
      TypeCheckFailure("KLL_QUANTILES EXTRACT: the sketch must be BYTES")
    else if (!Seq(IntegerType, LongType).contains(right.dataType))
      TypeCheckFailure("KLL_QUANTILES EXTRACT: the bucket count must be an integer")
    else TypeCheckSuccess
  }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val buf = KllSketch.deserialize(l.asInstanceOf[Array[Byte]],
      "KLL_QUANTILES.EXTRACT")
    val m = r.asInstanceOf[Number].intValue()
    if (m < 1) throw new IllegalArgumentException(
      s"KLL_QUANTILES.EXTRACT: the bucket count must be >= 1, got $m")
    if (buf.n == 0) null
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.tabulate(m + 1)(i => buf.quantile(i.toDouble / m)))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllExtractExpr =
    copy(left = newLeft, right = newRight)
}
