package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PipelineQueries

/** Golden tests for the native sketch expressions (values precomputed
  * independently with python hashlib — the same math the DuckDB oracles
  * replicate) and for connected-components convergence.
  */
class SketchExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql1(q: String): Any = {
    BitSketchExpressions.register(spark)
    spark.sql(q).collect()(0).get(0)
  }

  test("Md5Long60 equals the first 15 md5 hex chars as an integer") {
    // hashlib: int(md5('hello').hexdigest()[:15], 16)
    assert(sql1("SELECT graft_md5_60('hello')") === 419982666956583591L)
    assert(sql1("SELECT graft_md5_60('the quick brown')") === 846626497777792448L)
    // must also equal the SQL conv() formulation it replaced
    assert(sql1("SELECT graft_md5_60('xyz') = cast(conv(substring(md5('xyz'), 1, 15), 16, 10) as bigint)")
      === true)
  }

  test("MinHash32 golden values (python-precomputed)") {
    val mh = sql1(
      "SELECT graft_minhash32(array('the quick brown', 'quick brown fox', 'brown fox jumps'))")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(mh.length === 32)
    assert(mh.take(5) === Seq(129335414L, 1215053797L, 153288533L, 764327974L, 84881615L))
    assert(mh.takeRight(3) === Seq(169075089L, 488632199L, 852090255L))
  }

  test("SimHash64 over Md5Long60 token hashes (python-precomputed)") {
    assert(sql1(
      "SELECT graft_simhash64(transform(array('alpha', 'beta', 'gamma'), t -> graft_md5_60(t)))")
      === 54945530325961211L)
  }

  test("WordShingles keeps first-occurrence order and distinctness") {
    val sh = sql1("SELECT graft_shingles(array('a', 'b', 'c', 'a', 'b', 'c', 'a'))")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh === Seq("a b c", "b c a", "c a b"))
  }

  test("connectedComponents: chain, pair, and singleton-free components") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 forces multiple propagation rounds),
    // separate pair 10-11, triangle 20-21-22
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = PipelineQueries.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("RollingWindowHashes equals direct polynomial evaluation") {
    graft.functions.BitSketchExpressions.register(spark)
    val row = spark.sql(
      """SELECT graft_rolling8(hs) AS roll,
        |  transform(sequence(0, size(hs) - 8), i ->
        |    (aggregate(sequence(0, 7), 0L, (a, k) ->
        |       (a + element_at(hs, i + 1 + k)
        |          * element_at(array(2003465299L, 884122890L, 2072267652L, 294499921L, 2248091L, 17161L, 131L, 1L), k + 1)
        |          % 2147483647) % 2147483647)) * 2147483648L
        |    + (aggregate(sequence(0, 7), 0L, (a, k) ->
        |       (a + element_at(hs, i + 1 + k)
        |          * element_at(array(671643304L, 1901585143L, 1017084223L, 352275361L, 2571353L, 18769L, 137L, 1L), k + 1)
        |          % 2147483647) % 2147483647))) AS direct
        |FROM (SELECT transform(sequence(1, 12), x -> graft_md5_60(cast(x as string)) % 2147483647) AS hs)""".stripMargin)
      .collect()(0)
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    assert(row.getSeq[Long](0).length == 5) // 12 tokens → 5 windows
  }

  test("DotLong / SqDistLong equal the HOF formulations") {
    graft.functions.BitSketchExpressions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_dot_i64(a, b) AS dot,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS dot_hof,
        |  graft_l2_i64(a, b) AS l2,
        |  aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x) AS l2_hof
        |FROM (SELECT array(3L, -1L, 4L, 1000000L) AS a,
        |             array(2L, 7L, -5L, 999999L) AS b)""".stripMargin).collect()(0)
    assert(row.getLong(0) == row.getLong(1) && row.getLong(0) == 999998999979L)
    assert(row.getLong(2) == row.getLong(3) && row.getLong(2) == 147L)
  }

  test("TopCount: exact below capacity across many partitions; heavy hitter survives saturation") {
    TopCount.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.Row
    // 10 distinct keys (< capacity 64), key k appears k+1 times over 16
    // partitions → partial buffers merge; counts must be EXACT and the
    // order (count DESC, value ASC) deterministic
    val df = spark.range(0, 10).flatMap(k => (0L to k).map(_ => f"k$k%02d"))
      .toDF("v").repartition(16)
    val top = df.agg(org.apache.spark.sql.functions
        .expr("graft_top_count(v, 3)").as("t"))
      .collect()(0).getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(top == Seq(("k09", 10L), ("k08", 9L), ("k07", 8L)))
    // saturation: 5000 distinct singletons + one key with 2000 hits;
    // the Space-Saving bound (overestimate <= err, heavy hitter never
    // evicted once dominant) must keep 'hot' on top with count >= 2000
    val skew = spark.range(0, 5000).map(i => s"u$i")
      .union(spark.range(0, 2000).map(_ => "hot"))
      .toDF("v").repartition(16)
    val hot = skew.agg(org.apache.spark.sql.functions
        .expr("graft_top_count(v, 1)").as("t"))
      .collect()(0).getSeq[Row](0).head
    assert(hot.getString(0) == "hot" && hot.getLong(1) >= 2000L,
      s"heavy hitter lost under saturation: $hot")
    // weighted variant sums BIGINT weights exactly below capacity
    val ws = Seq(("a", 5L), ("b", 7L), ("a", 1L)).toDF("v", "w")
      .agg(org.apache.spark.sql.functions.expr("graft_top_sum(v, w, 2)").as("t"))
      .collect()(0).getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(ws == Seq(("b", 7L), ("a", 6L)))
  }
}
