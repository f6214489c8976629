package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`:
  * at most k counters per buffer, mergeable (add counts, then subtract
  * the (k+1)-th largest and keep positives — Agarwal et al., mergeable
  * summaries), so it map-side combines and each group costs O(k)
  * memory no matter how many rows feed it — the 100 TB shape for
  * "which terms dominate this corpus".
  *
  * Guarantee (order-independent, which is what the gate checks): every
  * item with true frequency > n/k survives in the final candidate set,
  * regardless of partitioning or merge order. The exact candidate SET
  * beyond that guarantee may vary with merge order — consumers must
  * treat it as a superset filter and re-count exactly, as d26 does.
  */
case class MisraGries(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1
        case None if buf.size < k => buf(key) = 1L
        case None =>
          // decrement-all step: every tracked count drops by one; zeros evicted
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (kk, c) => if (c == 1L) dead += kk else buf(kk) = c - 1 }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (kk, c) => b1(kk) = b1.getOrElse(kk, 0L) + c }
    if (b1.size > k) {
      val t = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      b1.foreach { case (kk, c) => if (c - t <= 0L) dead += kk else b1(kk) = c - t }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) => out.writeUTF(kk); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Register `graft_heavy_hitters(col)` on the session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_heavy_hitters")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_heavy_hitters",
        exprs => MisraGries(exprs.head).toAggregateExpression(),
        "scala_udf")
}
