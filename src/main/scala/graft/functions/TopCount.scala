package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving top-k sketch (Metwally et al.) as a
  * `TypedImperativeAggregate` — the engine's lowering of BigQuery's
  * `APPROX_TOP_COUNT(x, n)` / `APPROX_TOP_SUM(x, w, n)`
  * (reference surfaces the BQ aggregate vocabulary through its SQL
  * passthrough, e.g. task/bq2bq docs; the sketch itself is public
  * literature). Each buffer holds at most `cap` counters, so a group
  * costs O(cap) memory no matter how many rows feed it, and buffers
  * map-side combine — the 100 TB shape.
  *
  * Guarantees: every counter overestimates its item's true weight by
  * at most its recorded `err`; when the number of distinct inputs in a
  * group never exceeds `cap`, no eviction occurs, `err` stays 0 and
  * every count is EXACT (the property the oracled gate relies on —
  * its input column's cardinality is below the capacity). Merging
  * unions the maps and, only when over capacity, prunes the smallest
  * counters (Cormode & Hadjieleftheriou's SS merge), preserving the
  * overestimate bound.
  *
  * Output: the top `n` entries as ARRAY<STRUCT<value STRING,
  * count|sum BIGINT>>, ordered by (weight DESC, value ASC) — the tie
  * break makes the result deterministic under any partitioning.
  * Deviations from BigQuery, documented loud: NULL inputs are skipped
  * (BQ tracks a NULL bucket), and the weight is integer (BQ's
  * APPROX_TOP_SUM also takes FLOAT64 weights).
  */
case class TopCount(
    child: Expression,
    weight: Expression,
    n: Int,
    cap: Int,
    resultField: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(n >= 1, "top-count n must be >= 1")
  require(cap >= n, "sketch capacity must be >= n")

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", StringType, nullable = true),
      StructField(resultField, LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    val w0 = weight.eval(input)
    if (v != null && w0 != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val w = w0 match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
        case s: java.lang.Short => s.longValue
        case b: java.lang.Byte => b.longValue
        case other => throw new IllegalArgumentException(
          s"top-sum weight must be integral, got ${other.getClass.getSimpleName}")
      }
      buf.get(key) match {
        case Some((c, e)) => buf(key) = (c + w, e)
        case None if buf.size < cap => buf(key) = (w, 0L)
        case None =>
          // evict the (deterministically) smallest counter; the new
          // key inherits its count as the overestimate error
          var mk: String = null
          var mc = Long.MaxValue
          buf.foreach { case (kk, (c, _)) =>
            if (c < mc || (c == mc && (mk == null || kk < mk))) { mk = kk; mc = c }
          }
          buf.remove(mk)
          buf(key) = (mc + w, mc)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, (Long, Long)],
      b2: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    b2.foreach { case (kk, (c, e)) =>
      b1.get(kk) match {
        case Some((c1, e1)) => b1(kk) = (c1 + c, e1 + e)
        case None => b1(kk) = (c, e)
      }
    }
    if (b1.size > cap) {
      val keep = b1.toArray
        .sortBy { case (kk, (c, _)) => (-c, kk) }
        .take(cap)
      b1.clear()
      keep.foreach { case (kk, ce) => b1(kk) = ce }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toArray
      .sortBy { case (kk, (c, _)) => (-c, kk) }
      .take(n)
      .map { case (kk, (c, _)) =>
        InternalRow(UTF8String.fromString(kk), c): Any
      }
    new GenericArrayData(top)
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, (c, e)) =>
      out.writeUTF(kk); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < sz) { buf(in.readUTF()) = (in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopCount =
    copy(child = newChildren(0), weight = newChildren(1))
}

object TopCount {
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Capacity rule: enough headroom above n that moderate skew keeps
    * the top-n exact; bounded so a buffer is always O(KBs).
    */
  private def capFor(n: Int): Int = math.min(math.max(8 * n, 64), 4096)

  /** Register `graft_top_count(x, n)` and `graft_top_sum(x, w, n)`
    * (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_top_count"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_count",
      exprs => {
        val n = litInt(exprs(1), "APPROX_TOP_COUNT number")
        TopCount(exprs.head, Literal(1L, LongType), n, capFor(n), "count")
          .toAggregateExpression()
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_sum",
      exprs => {
        val n = litInt(exprs(2), "APPROX_TOP_SUM number")
        TopCount(exprs.head, exprs(1), n, capFor(n), "sum")
          .toAggregateExpression()
      },
      "scala_udf")
  }
}
