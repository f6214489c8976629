package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for opaque binary payloads (image / audio /
  * video at 100 TB scale; here exercised with UTF-8 text payloads since
  * decode libraries aren't in this container).
  *
  * The Spark-side mechanics are real and production-shaped:
  *  - payloads are opaque `BinaryType` columns with a typed metadata
  *    struct alongside (n_bytes, mime), the standard layout for petabyte
  *    media lakes (payload column stays pruned away unless referenced);
  *  - feature extraction runs per-partition over iterators
  *    (`mapPartitions`), the batch shape a real decoder (JNI/FFmpeg/
  *    turbojpeg) needs — one init per partition, streaming rows through;
  *  - the decode step itself is STUBBED with a deterministic
  *    byte-histogram "feature vector" so the pipeline is testable
  *    end-to-end without media libs.
  */
object MultimodalStub {

  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      mime: String,
      head_hex: String,
      features: Array[Long])

  /** STUB decoder: replace with a real image/audio decode when libs are
    * available. Deterministic: 16-bin histogram of payload bytes.
    */
  private def fakeDecode(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % 16) += 1L
      i += 1
    }
    hist
  }

  case class Frame(
      doc_id: Long,
      frame_no: Int,
      offset: Long,
      frame_bytes: Int,
      digest: Long)

  /** Frame sampling for video/audio-shaped payloads: cut the opaque
    * payload into fixed-size "frames", keep every `stride`-th one, and
    * emit one row per sampled frame (the explode shape a real
    * frame-extractor produces). The decode itself is STUBBED with a
    * deterministic byte digest.
    */
  def sampleFrames(blobs: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nFrames = (payload.length + frameSize - 1) / frameSize
        (0 until nFrames by stride).map { f =>
          val start = f * frameSize
          val end = math.min(start + frameSize, payload.length)
          // modular polynomial digest (< 2^31): no 64-bit wraparound, so
          // the value is reproducible in engines whose integer overflow
          // errors instead of wrapping — this makes the digest oracle-able
          var digest = 1125899906842597L % 2147483647L
          var i = start
          while (i < end) { digest = (31L * digest + (payload(i) & 0xff)) % 2147483647L; i += 1 }
          Frame(id, f, start.toLong, end - start, digest)
        }
      }
      .toDF()
  }

  /** Batched "model inference" over opaque payloads — the GPU-shaped
    * access pattern: rows are grouped into fixed keyed batches
    * (doc_id div batchSize, so the batch composition is deterministic
    * and engine-checkable; a real pipeline batches whatever rows the
    * partition iterator yields), each batch materializes as one array
    * — the shape a model forward pass wants — and the STUB model
    * scores the whole batch in a single call, emitting per-row digests
    * plus batch-level stats so the batching behavior itself is
    * observable in the gate output.
    */
  def batchedInference(blobs: DataFrame, batchSize: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .groupByKey(_._1 / batchSize)
      .flatMapGroups { (bk: Long, it: Iterator[(Long, Array[Byte])]) =>
        val batch = it.toArray.sortBy(_._1) // deterministic batch order
        val batchBytes = batch.map(_._2.length.toLong).sum
        batch.map { case (id, p) =>
          // same modular digest family as sampleFrames (< 2^31, no
          // wraparound) so the oracle replays it byte-for-byte
          var d = 7L
          var i = 0
          while (i < p.length) { d = (31L * d + (p(i) & 0xff)) % 2147483647L; i += 1 }
          (id, bk, batch.length.toLong, batchBytes, d)
        }
      }
      .toDF("doc_id", "batch_key", "batch_size", "batch_bytes", "digest")
  }

  /** expects columns: doc_id LONG, payload BINARY, meta STRUCT<n_bytes, mime> */
  def extractFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaFeatures] = blobs
      .select(col("doc_id"), col("payload"), col("meta.n_bytes"), col("meta.mime"))
      .as[(Long, Array[Byte], Long, String)]
      .mapPartitions { it =>
        // per-partition init happens here in a real decoder
        it.map { case (id, payload, nBytes, mime) =>
          val head = payload.take(8).map(b => f"${b & 0xff}%02x").mkString
          MediaFeatures(id, nBytes, mime, head, fakeDecode(payload))
        }
      }
    ds.toDF()
  }
}
