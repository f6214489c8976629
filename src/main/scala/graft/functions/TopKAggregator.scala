package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k-by-score aggregator (SURVEY §7 extensions: custom
  * `Aggregator[IN, BUF, OUT]`).
  *
  * Keeps a bounded k-sized buffer per group instead of materializing and
  * fully sorting every candidate — the scale path for per-query ANN
  * top-k: the map side reduces each partition to ≤ k rows before the
  * shuffle, so a 100 TB candidate set ships only `groups × k` rows.
  * Ordering is total (score desc, then id asc) for determinism.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    // The buffer is a plain Seq (List prepend on the hot path) so BOTH
    // encoders are ExpressionEncoders — the per-row buffer round-trip
    // stays in Tungsten UnsafeArrayData instead of Kryo bytes (Kryo's
    // FieldSerializer also needs --add-opens java.base/java.nio at
    // runtime, which not every launcher passes).
    override def zero: Seq[Scored] = Nil

    private def trim(buf: Seq[Scored]): Seq[Scored] =
      if (buf.lengthCompare(4 * k) > 0) buf.sortWith(lt).take(k) else buf

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      trim(a +: buf)

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      trim(b1 ++ b2)

    override def finish(buf: Seq[Scored]): Seq[Scored] =
      buf.sortWith(lt).take(k)

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopK = new TopK(k)
}
