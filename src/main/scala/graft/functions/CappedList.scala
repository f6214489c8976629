package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Size-capped long-list aggregate (`graft_capped_list(x, cap)`): like
  * `collect_list` but the buffer SATURATES at `cap` elements — updates
  * and merges beyond that are dropped, so the per-key aggregation
  * buffer is bounded by construction, map-side combine included.
  *
  * The point is df-capped inverted indexes (SURVEY north star, d43
  * shape): posting lists for keys with document frequency ≤ `cap − 1`
  * must be EXACT, hotter keys must be droppable without ever holding
  * their full posting list anywhere. Saturation gives both:
  *
  *  - a key with total multiplicity ≤ cap − 1 can never reach `cap`
  *    elements in any partial buffer or merge, so its final list is
  *    complete and exact;
  *  - a key with multiplicity ≥ cap saturates at `cap` — the caller
  *    filters `size(ids) < cap` and drops it. A template shingle in
  *    10⁹ documents costs `cap` longs of memory, not 10⁹.
  *
  * This replaces both the count-window df cap (shuffle-sorts the full
  * posting stream — the round-5 regression) and the two-pass
  * groupBy-count + join-back (sorts two corpus-sized relations): ONE
  * shuffle, one aggregate, bounded buffers.
  */
case class CappedLongList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](8)

  override def update(buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(b1: scala.collection.mutable.ArrayBuffer[Long],
      b2: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    val room = cap - b1.length
    val n = math.min(room, b2.length)
    while (i < n) { b1 += b2(i); i += 1 }
    b1
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CappedLongList =
    copy(child = newChildren.head)
}

object CappedLongList {
  /** Register `graft_capped_list(col, cap)` on the session (idempotent).
    * `cap` must be a foldable integer literal.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_capped_list")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_capped_list",
      exprs => CappedLongList(exprs.head,
        exprs(1).eval(InternalRow.empty) match {
          case i: Int => i
          case l: Long => l.toInt
        }).toAggregateExpression(),
      "scala_udf")
}
