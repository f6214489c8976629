package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic document corpus generated
  * ON THE EXECUTORS — the load-generation tool for testing pipelines at
  * scales where materializing input parquet first is itself the
  * bottleneck. `spark.read.format("graft.sources.SyntheticDocs")
  * .option("rows", n).option("partitions", p)` yields `n` documents
  * split evenly over `p` input partitions; no file ever exists.
  *
  * Every field derives from the doc id through the same 60-bit md5
  * hash the rest of the engine uses ([[graft.functions.SketchKernels
  * .md5Long60]]), so the corpus is (a) identical on any cluster size /
  * partition count and (b) exactly replayable by the DuckDB oracle
  * (`('0x' || substring(md5(k), 1, 15))::BIGINT`).
  *
  * The ScanBuilder implements column pruning: a query that doesn't
  * read `text` never pays for generating it — the DSv2 contract that
  * matters at 100 TB (generation cost tracks the projected schema,
  * exactly like a parquet scan's column pruning).
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object SyntheticDocs {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def h(key: String): Long =
    graft.functions.SketchKernels.md5Long60(UTF8String.fromString(key))

  def langOf(id: Long): String = "l" + (h(s"lang-$id") % 5)
  def nTokensOf(id: Long): Long = 20L + h(s"len-$id") % 30L
  def textOf(id: Long): String = {
    val n = nTokensOf(id).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb += ' '
      sb ++= "tok"
      sb.append(h(s"$id-$i") % 1000L)
      i += 1
    }
    sb.toString
  }
}

private[sources] class SyntheticDocsTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, partitions)
}

private[sources] class SyntheticDocsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var projected: StructType = SyntheticDocs.fullSchema
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    projected = requiredSchema

  /** doc_id range predicates narrow the GENERATED id range — the
    * source-side analogue of partition pruning: rows outside the
    * predicate are never produced at all. Everything else returns as a
    * post-scan filter for Spark to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def long(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case _ => scala.None
    }
    val (ours, residual) = filters.partition {
      case EqualTo("doc_id", v) => long(v).isDefined
      case GreaterThan("doc_id", v) => long(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => long(v).isDefined
      case LessThan("doc_id", v) => long(v).isDefined
      case LessThanOrEqual("doc_id", v) => long(v).isDefined
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v) =>
        lo = math.max(lo, long(v).get); hi = math.min(hi, long(v).get + 1)
      case GreaterThan(_, v) => lo = math.max(lo, long(v).get + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, long(v).get)
      case LessThan(_, v) => hi = math.min(hi, long(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, long(v).get + 1)
      case _ =>
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new SyntheticDocsScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)),
      partitions, projected)
}

private[sources] case class IdRange(start: Long, end: Long) extends InputPartition

private[sources] class SyntheticDocsScan(lo: Long, hi: Long, partitions: Int,
    projected: StructType) extends Scan with Batch {
  override def readSchema(): StructType = projected
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs range=[$lo, $hi) cols=${projected.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val per = math.max(1L, (n + partitions - 1) / partitions)
    (lo until hi by per).map(s => IdRange(s, math.min(s + per, hi)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(projected.fieldNames)
}

private[sources] class SyntheticDocsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[IdRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = {
        // generate ONLY the projected columns — pruning = not paying
        // for text when the query never reads it
        InternalRow.fromSeq(fields.toIndexedSeq.map {
          case "doc_id" => id
          case "lang" => UTF8String.fromString(SyntheticDocs.langOf(id))
          case "n_tokens" => SyntheticDocs.nTokensOf(id)
          case "text" => UTF8String.fromString(SyntheticDocs.textOf(id))
        })
      }
      override def close(): Unit = ()
    }
  }
}
