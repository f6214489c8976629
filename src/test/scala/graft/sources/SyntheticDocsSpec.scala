package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan, EqualTo}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SyntheticDocsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def read(rows: Long, parts: Int = 4) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("generates exactly `rows` docs, identical on any partition count") {
    val a = read(500, 2).orderBy("doc_id").collect()
    val b = read(500, 7).orderBy("doc_id").collect()
    assert(a.length == 500)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("fields are deterministic functions of doc_id") {
    val r = read(10).where(col("doc_id") === 3).collect()(0)
    assert(r.getString(1) == SyntheticDocs.langOf(3))
    assert(r.getLong(2) == SyntheticDocs.nTokensOf(3))
    assert(r.getString(3) == SyntheticDocs.textOf(3))
    assert(r.getString(3).split(" ").length.toLong == r.getLong(2))
  }

  test("doc_id range filters narrow the generated range at the source") {
    val b = new SyntheticDocsScanBuilder(10000, 4)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("doc_id", 100L), LessThan("doc_id", 250L),
      EqualTo("lang", "l1"))) // not a doc_id range → residual
    assert(residual.toSeq == Seq(EqualTo("lang", "l1")))
    assert(b.pushedFilters().length == 2)
    val scan = b.build().asInstanceOf[SyntheticDocsScan]
    val total = scan.planInputPartitions()
      .map(_.asInstanceOf[IdRange]).map(r => r.end - r.start).sum
    assert(total == 150L) // only [100, 250) is ever generated
  }

  test("range-filtered read returns exactly the in-range rows") {
    val got = read(10000).where(col("doc_id") >= 9990 && col("doc_id") < 9995)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(9990L, 9991L, 9992L, 9993L, 9994L))
  }
}
