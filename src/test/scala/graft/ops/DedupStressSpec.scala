package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in (`GRAFT_STRESS=1`) load test of the dedup candidate-generation
  * paths at ~50× the sf0.1 document count, fed by the executor-side
  * SyntheticDocs V2 source (no disk, no driver materialization). The
  * claim under test is the 100 TB posture: banded/blocked candidate
  * generation is ~linear in corpus size, so quadrupling the docs must
  * not quadrate the runtime. Wall-clock bounds are deliberately loose
  * (the platform CPU-throttles up to ~2.7×) — the signal is the GROWTH
  * RATIO between the small and large runs of the same op in the same
  * JVM, which throttling affects far less than absolute times.
  */
object Stress extends Tag("graft.Stress")

class DedupStressSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** sf0.1 has 5,000 docs; 50× ≈ 250k. The small run is 4× fewer. */
  private val bigN = 250000L
  private val smallN = bigN / 4

  /** Synthetic corpus with PLANTED near-duplicates: every doc's text is
    * hash-unique, so without the planted 10% of lightly-perturbed
    * variants the pair-verification stages would run over zero
    * candidates and the test would time only candidate generation.
    */
  private def docs(n: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", n.toString).option("partitions", "64").load()
      .select("doc_id", "text")
    base.unionByName(base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
  }

  private def timed(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = body
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  /** Warm codegen/classloading on a tiny run, then time small and big. */
  private def growthRatio(name: String)(op: DataFrame => DataFrame): (Double, Double, Long) = {
    op(docs(2000L)).count()
    val (tSmall, nSmall) = timed(op(docs(smallN)).count())
    val (tBig, nBig) = timed(op(docs(bigN)).count())
    val ratio = tBig / tSmall
    info(f"$name: ${smallN}%,d docs → $tSmall%.1f s ($nSmall rows); " +
      f"${bigN}%,d docs → $tBig%.1f s ($nBig rows); growth ${ratio}%.2f× for 4× docs")
    (tSmall, tBig, nBig)
  }

  test("public-suffix REG_DOMAIN lookup scales linearly with the scan", Stress) {
    import org.apache.spark.sql.functions._
    graft.functions.BitSketchExpressions.register(spark)
    val (tSmall, tBig, nBig) = growthRatio("reg_domain") { d =>
      d.withColumn("url", concat(lit("https://h"), col("doc_id") % 100000,
          lit("."), when(col("doc_id") % 3 === 0, lit("co.uk"))
            .when(col("doc_id") % 3 === 1, lit("com")).otherwise(lit("web.ck")),
          lit("/p?x="), col("doc_id")))
        .select(expr("graft_net_reg_domain(url)").as("rd"))
        .groupBy("rd").agg(count(lit(1)))
    }
    assert(nBig > 0)
    // pure per-row trie lookup + one hash agg: anything over ~6× for 4×
    // rows means the kernel went allocation-bound
    assert(tBig / tSmall < 6.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("MinHash-LSH pairs scale sub-quadratically to 250k docs", Stress) {
    val (tSmall, tBig, nBig) = growthRatio("minhash") { d =>
      TextDedup.minhashLshPairs(d)
    }
    assert(nBig > 0, "planted near-dups should surface as pairs")
    // quadratic would be ~16×; banded generation should stay near-linear.
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("span (ExactSubstr-style) pairs scale sub-quadratically to 250k docs", Stress) {
    val (tSmall, tBig, _) = growthRatio("span") { d =>
      TextDedup.spanPairs(d, sampleMod = 4)
    }
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("boilerplate line removal scales with the line scan at 250k docs", Stress) {
    // 1000 sites × ~250 docs: every site's cookie line crosses the df
    // threshold (cut everywhere), every ref line is unique (kept) —
    // the df-count shuffles 3 slim rows per doc, sets broadcast
    import org.apache.spark.sql.functions._
    val (tSmall, tBig, nBig) = growthRatio("boilerplate") { d =>
      val sited = d.select(col("doc_id"),
        (col("doc_id") % 1000).cast("string").as("site"),
        concat(col("text"),
          lit("\ncookie banner of site "), (col("doc_id") % 1000).cast("string"),
          lit("\nref "), col("doc_id").cast("string")).as("text"))
      TextDedup.boilerplateLines(sited, groupCol = "site", minDf = 5)
        .where(col("n_dropped") > 0)
    }
    assert(nBig > 0, "planted per-site cookie lines should be dropped")
    assert(tBig / tSmall < 8.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("connected components over 250k-doc pair graph converge and scale", Stress) {
    // pair input from the MinHash path — the d21 cluster shape
    val (tSmall, tBig, nBig) = growthRatio("components") { d =>
      TextDedup.connectedComponents(
        TextDedup.minhashLshPairs(d).select("a", "b"))
    }
    assert(nBig > 0, "expected some components in the synthetic corpus")
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("label propagation over 250k-doc pair graph scales like CC", Stress) {
    // d122 shape: 3 fixed sign-vote rounds over the MinHash edge set —
    // per-round cost is one slim (node, label) shuffle, so growth must
    // track the pair-generation stage, not the rounds
    import org.apache.spark.sql.functions._
    val (tSmall, tBig, nBig) = growthRatio("labelprop") { d =>
      val seeds = d.where(col("doc_id") % 17 === 0 || col("doc_id") % 17 === 5)
        .select(col("doc_id").as("node"),
          when(col("doc_id") % 17 === 0, lit(1)).otherwise(lit(-1)).as("lab"))
      TextDedup.labelPropagation(
        TextDedup.minhashLshPairs(d).select("a", "b"), seeds, iters = 3)
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("winnowing pair generation scales sub-quadratically to 250k docs", Stress) {
    // d124 shape: per-row window-min selection, then df-capped
    // (hash, id) buckets — the planted 10% near-dups share almost all
    // fingerprints, the hash-unique rest shares none
    val (tSmall, tBig, nBig) = growthRatio("winnowing") { d =>
      TextDedup.winnowingPairs(d)
    }
    assert(nBig > 0, "planted near-dups should share fingerprints")
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("PageRank iterations over a doc-derived domain graph scale with the scan", Stress) {
    // the d70 shape: link extraction scales with the corpus, the rank
    // loop with the (much smaller) domain edge list — synthetic docs
    // map to 65k src domains linking 3 dst domains each
    import org.apache.spark.sql.functions._
    val (tSmall, tBig, nBig) = growthRatio("pagerank") { d =>
      val edges = d
        .withColumn("src", concat(lit("h"), pmod(xxhash64(col("text")), lit(65536L))))
        .select(col("src"), explode(array(
          concat(lit("h"), pmod(xxhash64(col("text"), lit(1)), lit(65536L))),
          concat(lit("h"), pmod(xxhash64(col("text"), lit(2)), lit(65536L))),
          concat(lit("h"), pmod(xxhash64(col("text"), lit(3)), lit(65536L))))).as("dst"))
        .where(col("src") =!= col("dst")).distinct()
      val nodes = edges.select(col("src").as("domain"))
        .union(edges.select(col("dst"))).distinct()
      val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      var ranks = nodes.withColumn("rank", lit(1000000000L))
      for (_ <- 1 to 3) {
        val inc = edges
          .join(ranks.withColumnRenamed("domain", "src"), "src")
          .join(outDeg, "src")
          .select(col("dst"), expr("rank div out_deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
        ranks = nodes.join(inc, nodes("domain") === inc("dst"), "left")
          .select(col("domain"),
            (lit(150000000L) + expr("(85 * coalesce(inc, 0L)) div 100")).as("rank"))
      }
      ranks
    }
    assert(nBig > 0, "expected ranked domains")
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("containment posting-list path scales sub-quadratically to 250k docs", Stress) {
    // the d43 shape: saturating capped-list aggregate (one shuffle,
    // bounded buffers) → pairs generated locally per pruned posting
    // list.
    // The planted ' zz' variants CONTAIN their originals (na ≥ 10,
    // shared/na = 1), so the verification stage sees real candidates.
    val (tSmall, tBig, nBig) = growthRatio("containment") { d =>
      TextDedup.containmentPairs(d, sampleMod = 4) // the d43 gate shape
    }
    assert(nBig > 0, "planted wrappers should surface as containment pairs")
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("cross-corpus MinHash decontamination scales with the train side", Stress) {
    // the d81 shape: eval = 2% of docs, broadcast for band join and
    // verification; the train corpus shuffles slim (band, bh, id) rows
    // only, so 4× the docs must cost ~4×, never eval×train
    import org.apache.spark.sql.functions._
    graft.functions.BitSketchExpressions.register(spark)
    val (tSmall, tBig, nBig) = growthRatio("decontamination") { d =>
      val isBench = col("doc_id") % 50 === 0 && col("doc_id") < 1000000000L
      def sigs(df: DataFrame, idName: String) =
        TextDedup.shingled(df, "text")
          .withColumn("mh", expr("graft_minhash32(shingles)"))
          .select(col("doc_id").as(idName), col("mh").as(s"mh_$idName"))
      def bands(sg: DataFrame, idName: String) = sg
        .select(col(idName), explode(expr(
          s"""transform(sequence(0, 7),
             |  b -> struct(b as band, graft_md5_60(concat_ws(',', slice(mh_$idName, b*4+1, 4))) as bh))""".stripMargin)).as("bd"))
        .select(col(idName), col("bd.band"), col("bd.bh"))
      val benchSigs = sigs(d.where(isBench), "bench_id")
      val trainSigs = sigs(d.where(!isBench), "doc_id")
      bands(trainSigs, "doc_id")
        .join(broadcast(bands(benchSigs, "bench_id")), Seq("band", "bh"))
        .select(col("doc_id"), col("bench_id")).dropDuplicates("doc_id", "bench_id")
    }
    assert(nBig >= 0)
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("longest-shared-span (d105 shape) scales sub-quadratically to 250k docs", Stress) {
    // same inverted-index skeleton as span pairs, plus the
    // (pair, diagonal) islands window — matches are df-capped so the
    // window input is bounded by cap·windows, never corpus²
    val (tSmall, tBig, nBig) = growthRatio("sharedSpans") { d =>
      TextDedup.sharedSpans(d, idCol = "doc_id", textCol = "text")
    }
    assert(nBig >= 0)
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("span-cut rewrite (d111 shape) scales sub-quadratically to 250k docs", Stress) {
    // sharedSpans' skeleton plus the per-doc interval rewrite: the
    // extra work is one doc_id join of the (small) affected set
    // against the token arrays and per-row array math — growth must
    // track sharedSpans, not the pair count
    val (tSmall, tBig, nBig) = growthRatio("spanCut") { d =>
      TextDedup.spanCutRewrite(d, idCol = "doc_id", textCol = "text")
    }
    assert(nBig >= 0)
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("pq encode + adc (d112/d113 shape) scales with the scan to 500k vectors", Stress) {
    // PQ has no pairwise stage at all: encode is n·m·ksub slim rows
    // against a broadcast codebook, ADC joins a constant-size LUT —
    // both must grow ~linearly in n
    import org.apache.spark.sql.functions._
    def vecs(n: Long): DataFrame = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(1, 64), i -> cast((id * 2654435761 + i * 40503) % 2000 - 1000 as bigint))").as("q"))
    def run(n: Long): Long = {
      val e = vecs(n)
      val cb = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("q").as("cq"))
      val qs = e.where(col("vec_id") < 16)
      Embeddings.pqAdcTopK(e, qs, cb, m = 4, k = 10).count()
    }
    run(2000L)
    val (tSmall, _) = timed(run(125000L))
    val (tBig, nBig) = timed(run(500000L))
    info(f"pq: 125,000 vecs → $tSmall%.1f s; 500,000 vecs → $tBig%.1f s; " +
      f"growth ${tBig / tSmall}%.2f× for 4× vecs ($nBig rows)")
    assert(nBig == 160L) // 16 queries × k
    assert(tBig / tSmall < 8.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("semantic dedup (d145 shape) follows its N^1.5 envelope to 500k vectors", Stress) {
    // SemDeDup's cost model: brute-force argmin assignment is N·K and
    // the intra-cell pair stage is Σ|cell|² ≈ N²/K, so K = √N balances
    // both at N^1.5 — growth for 4× vectors is bounded by 8×, NOT the
    // 4× linear bound of the banded text paths. That is the op's
    // design envelope (real deployments route assignment through the
    // IVF/LSH index paths — d102 — when N makes N·K the wall).
    import org.apache.spark.sql.functions._
    def vecs(n: Long): DataFrame = {
      // murmur mix per (id, component) — the affine pattern the PQ leg
      // uses repeats vectors every |mod| ids (collinear = all near-dup)
      val base = spark.range(n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> cast(pmod(hash(id, i), 2000) - 1000 as bigint))").as("q"))
        .withColumn("nrm", expr("graft_dot_i64(q, q)"))
      base.unionByName(base.where(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000000L))
    }
    def run(n: Long, k: Long): Long = {
      graft.functions.BitSketchExpressions.register(spark)
      val e = vecs(n)
      val cents = e.where(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("nrm").as("cnrm"))
      Embeddings.semanticDedup(e, cents, 0.999).where(!col("kept")).count()
    }
    run(2000L, 45L)
    val (tSmall, nSmall) = timed(run(125000L, 354L))
    val (tBig, nBig) = timed(run(500000L, 707L))
    info(f"semdedup: 125,000 vecs → $tSmall%.1f s ($nSmall dropped); " +
      f"500,000 vecs → $tBig%.1f s ($nBig dropped); growth ${tBig / tSmall}%.2f× for 4× vecs")
    // every planted exact copy must be dropped (cosine 1.0 ≥ 0.999)
    assert(nBig >= 50000L, s"planted duplicates not dropped: $nBig")
    assert(tBig / tSmall < 8.5, f"beyond the N^1.5 envelope: $tSmall%.1f s → $tBig%.1f s")
  }

  test("chat-turn chain (d103/d104 shape) scales with the scan to 4M events", Stress) {
    // the chain is one hash exchange + per-user windows, so growth must
    // track the scan. Synthetic interaction log: ~80 events/user, a
    // >30-min gap every 7th event (conversation breaks), 2-user-1-
    // assistant role cadence (same-role merges exercised), all from
    // spark.range math — partition-parallel, no driver state.
    import org.apache.spark.sql.functions._
    def events(n: Long): DataFrame = {
      val users = math.max(n / 80L, 1L)
      spark.range(0, n, 1, 64)
        .select(col("id").as("event_id"), (col("id") % users).as("user_id"),
          expr(s"id div ${users}L").as("pos"))
        .withColumn("ts", expr(
          "cast(1700000000 + user_id % 977 + pos * 300 + (pos div 7) * 2400 as timestamp)"))
        .withColumn("role",
          when(col("pos") % 3 < 2, lit("user")).otherwise(lit("assistant")))
        .withColumn("content", concat(lit("m"), col("pos")))
        .select("user_id", "ts", "event_id", "role", "content")
    }
    def run(n: Long): Long =
      Chat.fitToContext(Chat.turns(events(n)), budget = 8).count()
    run(20000L) // warm codegen
    val big = 4000000L
    val (tSmall, nSmall) = timed(run(big / 4))
    val (tBig, nBig) = timed(run(big))
    info(f"chat: ${big / 4}%,d events → $tSmall%.1f s ($nSmall convs); " +
      f"$big%,d events → $tBig%.1f s ($nBig convs); growth ${tBig / tSmall}%.2f× for 4× events")
    assert(nBig > nSmall)
    assert(tBig / tSmall < 8.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("bigram-LM surprisal path (d86 shape) scales with the scan to 250k docs", Stress) {
    // the risk at scale is the (doc, a, b) tf table and the vocab²
    // bigram count table: both must grow ~linearly with the corpus
    // (natural-language bigram vocab saturates), never quadratically
    import org.apache.spark.sql.functions._
    def run(d: DataFrame): Long = {
      val tfb = d
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))""".stripMargin)).as("p"))
        .select(col("doc_id"), col("p.a"), col("p.b"))
        .groupBy("doc_id", "a", "b").agg(count(lit(1)).as("tf"))
        .persist()
      try {
        val bi = tfb.groupBy("a", "b").agg(sum(col("tf")).as("f_ab"))
        val uni = tfb.groupBy("a").agg(sum(col("tf")).as("f_a"))
        tfb.join(bi, Seq("a", "b")).join(uni, Seq("a"))
          .withColumn("sbits",
            (length(bin(col("f_a"))) - length(bin(col("f_ab")))).cast("long"))
          .groupBy("doc_id")
          .agg(sum(col("tf") * col("sbits")).as("sum_bits"))
          .count()
      } finally tfb.unpersist()
    }
    run(docs(2000L)) // warm codegen
    val (tSmall, nSmall) = timed(run(docs(smallN)))
    val (tBig, nBig) = timed(run(docs(bigN)))
    info(f"bigram: ${smallN}%,d docs → $tSmall%.1f s ($nSmall docs scored); " +
      f"${bigN}%,d docs → $tBig%.1f s ($nBig docs scored); growth ${tBig / tSmall}%.2f× for 4× docs")
    assert(nBig > nSmall)
    assert(tBig / tSmall < 10.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("bitext numeral mining (d129 shape) scales sub-quadratically to 250k docs", Stress) {
    // planted rare numerals: docs (2k, 2k+1) share one, (3k..3k+2)
    // share another, so (6k, 6k+1) pairs clear minShared=2 — linear in
    // the corpus. A universal numeral on EVERY doc proves the df cap
    // kills corpus-sized buckets before they can go quadratic.
    import org.apache.spark.sql.functions._
    def bitextDocs(n: Long): DataFrame = spark.read
      .format("graft.sources.SyntheticDocs")
      .option("rows", n.toString).option("partitions", "64").load()
      .select(col("doc_id"), col("lang"), expr(
        """concat(text, ' 20240101 ',
          |  cast(7000000 + doc_id div 2 as string), ' ',
          |  cast(9000000 + doc_id div 3 as string))""".stripMargin).as("text"))
    def run(d: DataFrame): Long = Corpus.bitextCandidates(d).count()
    run(bitextDocs(2000L)) // warm codegen
    val (tSmall, nSmall) = timed(run(bitextDocs(smallN)))
    val (tBig, nBig) = timed(run(bitextDocs(bigN)))
    info(f"bitext: ${smallN}%,d docs → $tSmall%.1f s ($nSmall pairs); " +
      f"${bigN}%,d docs → $tBig%.1f s ($nBig pairs); growth ${tBig / tSmall}%.2f× for 4× docs")
    assert(nBig > nSmall, "expected planted cross-lingual pairs to grow with the corpus")
    assert(tBig / tSmall < 8.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("Kneser-Ney bigram counts (d130 shape) scale with the scan to 250k docs", Stress) {
    // the count tables are vocab²-bounded (SyntheticDocs vocab = 1000),
    // so corpus growth only adds map-side-combined increments; the
    // top-N is a bounded heap (TakeOrdered), never a corpus sort
    val (tSmall, tBig, nBig) = growthRatio("kneserney") { d =>
      Corpus.kneserNeyBigrams(d, topN = 40)
    }
    assert(nBig == 40L)
    assert(tBig / tSmall < 8.0, f"super-linear blowup: $tSmall%.1f s → $tBig%.1f s")
  }

  test("BPE training merge rounds are distributed and scale to 1M docs", Stress) {
    // r9/r10 ask: the merge loop used to run on the driver over the
    // collected vocab. Now each round is a distributed pair-count
    // argmax; only one row per round reaches the driver. Growth must
    // track the corpus scan (vocab is capped, so rounds are ~constant
    // and the word-count stage dominates).
    val (tSmall, tBig, nBig) = ceilingRatio("bpe@1M", 250000L, 1000000L) { d =>
      Corpus.bpeTrain(d, rounds = 4)
    }
    assert(nBig == 4L, "one output row per merge round")
    assert(tBig / tSmall < 4.0,
      f"super-linear at the 1M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  // ---- 1M-doc ceiling (VERDICT r6 #5): the two heaviest growers of the
  // 250k suite re-measured one scale notch up (250k → 1M, still 4×).
  // The tighter < 4× bound is the round-7 done-criterion: growth at or
  // below the data growth means the path is ~linear where it matters.

  private def ceilingRatio(name: String, small: Long, big: Long)(
      op: DataFrame => DataFrame): (Double, Double, Long) = {
    op(docs(2000L)).count()
    val (tSmall, nSmall) = timed(op(docs(small)).count())
    val (tBig, nBig) = timed(op(docs(big)).count())
    info(f"$name: ${small}%,d docs → $tSmall%.1f s ($nSmall rows); " +
      f"${big}%,d docs → $tBig%.1f s ($nBig rows); growth ${tBig / tSmall}%.2f× for 4× docs")
    (tSmall, tBig, nBig)
  }

  test("1M-doc ceiling: connected components growth stays under 4x", Stress) {
    val (tSmall, tBig, nBig) = ceilingRatio("components@1M", 250000L, 1000000L) { d =>
      TextDedup.connectedComponents(
        TextDedup.minhashLshPairs(d).select("a", "b"))
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 1M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  test("1M-doc ceiling: containment posting-list growth stays under 4x", Stress) {
    // sampleMod=4 is the d43 gate shape (round-8 ask #4): content-
    // defined shingle sampling cuts postings — and the Σdf² pair
    // fan-out — 4×, which is what pulls the ceiling under 3×
    val (tSmall, tBig, nBig) = ceilingRatio("containment@1M", 250000L, 1000000L) { d =>
      TextDedup.containmentPairs(d, sampleMod = 4)
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 1M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  test("1M-doc ceiling: winnowing fingerprint growth stays under 4x", Stress) {
    // round-8 ask #3: the round-7 candidate generators re-measured one
    // scale notch up. Winnowing selection is per-row codegen; only
    // (hash, id) buckets shuffle, df-capped
    val (tSmall, tBig, nBig) = ceilingRatio("winnowing@1M", 250000L, 1000000L) { d =>
      TextDedup.winnowingPairs(d)
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 1M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  test("1M-doc ceiling: label propagation growth stays under 4x", Stress) {
    // round-9 ask #4: the composed-pipeline shape — ONE [[edgeCache]]
    // built from the minhash pairs is shared by every graph consumer
    // (d122 labelprop, d21 components, retention), so labelprop's own
    // cost is the 3 sign-vote rounds over slim (node, label) shuffles,
    // not a second pair pass. Edge build and propagation are timed
    // separately; the bound applies to labelprop's MARGINAL growth.
    import org.apache.spark.sql.functions._
    def run(n: Long): (Double, Double, Long) = {
      val d = docs(n)
      val seeds = d.where(col("doc_id") % 17 === 0 || col("doc_id") % 17 === 5)
        .select(col("doc_id").as("node"),
          when(col("doc_id") % 17 === 0, lit(1)).otherwise(lit(-1)).as("lab"))
      var edges: DataFrame = null
      val (tEdges, nEdges) = timed {
        edges = TextDedup.edgeCache(
          TextDedup.minhashLshPairs(d).select("a", "b"))
        edges.count()
      }
      val (tProp, nProp) = timed(
        TextDedup.labelPropagation(edges, seeds, iters = 3).count())
      info(f"labelprop@1M/$n%,d: edge build $tEdges%.1f s ($nEdges edges), " +
        f"propagation $tProp%.1f s ($nProp nodes)")
      (tEdges, tProp, nProp)
    }
    run(2000L) // warm
    val (_, pSmall, _) = run(250000L)
    val (_, pBig, nBig) = run(1000000L)
    info(f"labelprop@1M marginal growth ${pBig / pSmall}%.2f× for 4× docs")
    assert(nBig > 0)
    assert(pBig / pSmall < 4.0,
      f"super-linear at the 1M ceiling: $pSmall%.1f s → $pBig%.1f s")
  }

  // ---- 4M-doc ceiling (VERDICT r9 #3): the three most-load-bearing
  // candidate generators one more scale notch up (1M → 4M, still 4×).
  // Opt-in separately (GRAFT_STRESS_4M=1) — each leg scans 4M docs, so
  // these dominate the suite's wall clock when enabled.

  private def assume4M(): Unit =
    assume(sys.env.contains("GRAFT_STRESS_4M"),
      "set GRAFT_STRESS_4M=1 to run the 4M-doc ceiling legs")

  test("pairgen A/B: banded self-join vs bucket aggregation at 4M", Stress) {
    assume(sys.env.contains("GRAFT_PAIRGEN_AB"),
      "set GRAFT_PAIRGEN_AB=1 for the interleaved pair-generation A/B")
    import org.apache.spark.sql.functions._
    graft.functions.BitSketchExpressions.register(spark)
    val d = docs(4000000L)
    val sh = graft.ops.TextDedup.shingled(d)
      .withColumn("mh", expr("graft_minhash32(shingles)"))
      .select(col("doc_id"), col("mh"))
    val banded = sh.select(col("doc_id"),
        explode(expr(
          """transform(sequence(0, 7),
            |  b -> struct(b as band, graft_md5_60(concat_ws(',', slice(mh, b*4+1, 4))) as bh))""".stripMargin)).as("bd"))
      .select(col("doc_id"), col("bd.band"), col("bd.bh"))
      .persist()
    info(s"banded rows: ${banded.count()}")
    def joinShape(): Long = {
      val ca = banded.select(col("band"), col("bh"), col("doc_id").as("a"))
      val cb = banded.select(col("band"), col("bh"), col("doc_id").as("b"))
      ca.join(cb, Seq("band", "bh")).where(col("a") < col("b"))
        .select(col("a"), col("b")).dropDuplicates("a", "b").count()
    }
    def aggShape(): Long =
      banded.groupBy(col("band"), col("bh"))
        .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 4096).as("ids"))
        .where(size(col("ids")) >= 2)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .dropDuplicates("a", "b").count()
    for (round <- 1 to 2) {
      val (tj, nj) = timed(joinShape())
      val (ta, na) = timed(aggShape())
      info(f"round $round: join $tj%.1f s ($nj pairs) | agg $ta%.1f s ($na pairs)")
      assert(nj == na, "shapes must generate the same candidate set")
    }
    banded.unpersist()
  }

  test("4M-doc ceiling: MinHash-LSH pair generation growth stays under 4x", Stress) {
    assume4M()
    // feeds d07/d44/d63/d81/d97/d98 — the most-used candidate path
    val (tSmall, tBig, nBig) = ceilingRatio("minhash@4M", 1000000L, 4000000L) { d =>
      TextDedup.minhashLshPairs(d)
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 4M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  test("4M-doc ceiling: connected components growth stays under 4x", Stress) {
    assume4M()
    val (tSmall, tBig, nBig) = ceilingRatio("components@4M", 1000000L, 4000000L) { d =>
      TextDedup.connectedComponents(
        TextDedup.edgeCache(TextDedup.minhashLshPairs(d).select("a", "b")))
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 4M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  test("4M-doc ceiling: sampled containment growth stays under 4x", Stress) {
    assume4M()
    val (tSmall, tBig, nBig) = ceilingRatio("containment@4M", 1000000L, 4000000L) { d =>
      TextDedup.containmentPairs(d, sampleMod = 4)
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 4M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  test("1M-doc ceiling: span-cut rewrite growth stays under 4x", Stress) {
    val (tSmall, tBig, nBig) = ceilingRatio("spanCut@1M", 250000L, 1000000L) { d =>
      TextDedup.spanCutRewrite(d)
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 1M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }

  test("1M-doc ceiling: MinHash-LSH pair generation growth stays under 4x", Stress) {
    // the most-used candidate path (feeds d07/d44/d63/d81/d97/d98) —
    // banded buckets must keep pair generation ~linear at the ceiling
    val (tSmall, tBig, nBig) = ceilingRatio("minhash@1M", 250000L, 1000000L) { d =>
      TextDedup.minhashLshPairs(d)
    }
    assert(nBig > 0)
    assert(tBig / tSmall < 4.0, f"super-linear at the 1M ceiling: $tSmall%.1f s → $tBig%.1f s")
  }
}
