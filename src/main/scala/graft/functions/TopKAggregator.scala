package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

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

  class TopK(k: Int) extends Aggregator[Scored, mutable.ArrayBuffer[Scored], Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: mutable.ArrayBuffer[Scored] = mutable.ArrayBuffer.empty

    private def trim(buf: mutable.ArrayBuffer[Scored]): mutable.ArrayBuffer[Scored] = {
      if (buf.length > 4 * k) {
        val kept = buf.sortWith(lt).take(k)
        buf.clear()
        buf ++= kept
      }
      buf
    }

    override def reduce(buf: mutable.ArrayBuffer[Scored], a: Scored): mutable.ArrayBuffer[Scored] =
      trim(buf += a)

    override def merge(b1: mutable.ArrayBuffer[Scored], b2: mutable.ArrayBuffer[Scored]): mutable.ArrayBuffer[Scored] =
      trim(b1 ++= b2)

    override def finish(buf: mutable.ArrayBuffer[Scored]): Seq[Scored] =
      buf.sortWith(lt).take(k).toSeq

    override def bufferEncoder: Encoder[mutable.ArrayBuffer[Scored]] =
      Encoders.kryo[mutable.ArrayBuffer[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopK = new TopK(k)
}
