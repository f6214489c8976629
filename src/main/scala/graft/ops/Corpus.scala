package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Public corpus-analysis / selection API: per-document scoring,
  * deterministic sampling, sequence packing, mixture weighting,
  * decontamination — the selection stages a pretraining pipeline runs
  * between raw crawl and training batches.
  *
  * Determinism rules: sampling decisions hash content (md5 residues,
  * no RNG state — reproducible across runs, engines, and cluster
  * sizes); anything float-summed across rows is either avoided,
  * order-pinned (sorted fold), or exact-integer. Everything is per-row
  * expressions plus bounded aggregates — the ops scale with the scan.
  */
object Corpus {

  /** lowercase whitespace tokens of `textCol`. */
  def tokens(textCol: String = "text"): Column =
    split(lower(trim(col(textCol))), "\\s+")

  /** 60-bit md5-derived content hash residue in [0, mod) — the
    * deterministic coin for sampling decisions.
    */
  def hashResidue(textCol: String = "text", mod: Int = 100): Column =
    expr(s"cast(conv(substring(md5($textCol), 1, 15), 16, 10) as bigint) % $mod")

  /** whitespace + BPE-ish token counts and char length per doc. */
  def tokenCounts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol),
      size(split(trim(col(textCol)), "\\s+")).cast(LongType).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast(LongType).as("bpe_tokens"),
      length(col(textCol)).cast(LongType).as("n_chars"))

  /** Gopher/RefinedWeb-style quality score: 0.4·length-saturation +
    * 0.3·stopword-ratio + 0.3·alpha-ratio. Per-doc ratios only — no
    * cross-row float sums.
    */
  def qualityScore(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.withColumn("toks", tokens(textCol))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .withColumn("alpha_chars",
        length(regexp_replace(col(textCol), "[^A-Za-z]", "")).cast(LongType))
      .withColumn("stop_hits", expr(
        "cast(size(filter(toks, t -> t in ('the','a','of','and','to','in','is'))) as bigint)"))
      .select(col(idCol), col("n_tokens"), col("alpha_chars"), col("stop_hits"),
        (lit(0.4) * least(lit(1.0), col("n_tokens").cast(DoubleType) / 100.0)
          + lit(0.3) * (col("stop_hits").cast(DoubleType) / col("n_tokens").cast(DoubleType))
          + lit(0.3) * (col("alpha_chars").cast(DoubleType)
            / length(col(textCol)).cast(DoubleType))).as("quality"))

  /** Deterministic stratified sampling: `rateCol` (an integer percent
    * column, e.g. a CASE over language) decides the per-stratum keep
    * rate; the content-hash residue decides membership. Appends a
    * boolean `sampled` column.
    */
  def stratifiedFlag(df: DataFrame, rateCol: Column,
      textCol: String = "text"): DataFrame =
    df.withColumn("rate_pct", rateCol)
      .withColumn("sampled", hashResidue(textCol) < col("rate_pct"))

  /** Concatenate-and-cut sequence packing: within each of `numBuckets`
    * deterministic buckets, docs are laid end-to-end in id order and
    * cut every `budget` tokens; a doc belongs to the pack where its
    * first token lands. One window cumsum per bucket — a single
    * shuffle, no driver state, no global ordering across buckets.
    * Returns per-pack (bucket, pack_id, n_docs, pack_tokens,
    * first_doc, last_doc).
    */
  def packSequences(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", budget: Long = 2048,
      numBuckets: Int = 16): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", size(tokens(textCol)).cast(LongType))
      .withColumn("bucket", col(idCol) % numBuckets)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before div $budget"))
      .groupBy(col("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
  }

  /** Temperature-weighted mixture weights per domain: w_i ∝ tokens_i^α
    * with α = 0.5 (sqrt — chosen because sqrt is IEEE-exact in every
    * engine, unlike pow), plus a token allocation under `budgetTokens`.
    * The normalizer folds a SORTED collected list so the DOUBLE output
    * is bit-reproducible regardless of partitioning. Domains are a
    * vocabulary, not data-sized — the collect is bounded.
    */
  def mixtureWeights(df: DataFrame, domainCol: String = "source",
      textCol: String = "text", budgetTokens: Double = 1e7): DataFrame = {
    val per = df
      .withColumn("n_tokens", size(tokens(textCol)).cast(LongType))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
    val z = per.agg(expr(
      """aggregate(sort_array(collect_list(sqrt(cast(tokens as double)))),
        |  cast(0 as double), (a, x) -> a + x)""".stripMargin).as("z"))
    per.crossJoin(z)
      .select(col(domainCol), col("n_docs"), col("tokens"),
        round(sqrt(col("tokens").cast(DoubleType)) / col("z"), 6).as("weight"),
        round(lit(budgetTokens) * sqrt(col("tokens").cast(DoubleType)) / col("z"))
          .cast(LongType).as("alloc_tokens"))
  }

  /** Per-document top-`topK` BM25 terms (k1 = 1.2, b = 0.75), with the
    * log-idf replaced by its rational argument (N − df + 0.5)/(df + 0.5)
    * — rank-identical per term, and computable with only IEEE + − × /
    * on exact-int inputs, so the DOUBLE scores are bit-reproducible
    * across engines (ln is the one op libms disagree on). The constants
    * appear as decimal literals (2.2, 0.25, 0.75) — correctly-rounded
    * parsing makes them the same doubles in any engine.
    *
    * Shape: tf aggregates with map-side combine on (doc, term); dl is
    * a second aggregate of tf (no re-scan); df is vocabulary-sized and
    * joins back; the corpus-level (N, Σdl) pair is one broadcast row.
    */
  def bm25Terms(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", topK: Int = 3,
      materialize: Boolean = true): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(textCol)).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    val out = tf.join(dl, idCol).join(dfreq, "term").crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast(DoubleType) / col("n_docs").cast(DoubleType))
      .withColumn("idf",
        (col("n_docs").cast(DoubleType) - col("df").cast(DoubleType) + lit(0.5))
          / (col("df").cast(DoubleType) + lit(0.5)))
      .withColumn("score", col("idf") * (col("tf").cast(DoubleType) * lit(2.2))
        / (col("tf").cast(DoubleType)
          + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast(DoubleType) / col("avgdl")))))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
      .select(col(idCol), col("rank").cast(LongType).as("rank"), col("term"),
        col("tf"), col("df"), col("dl"), col("score"))
    // release the tf cache before returning (long-lived-JVM hygiene —
    // the d98 pattern); materialize=false keeps the lazy plan for audits
    if (!materialize) out
    else {
      val result = out.localCheckpoint(true)
      tf.unpersist()
      result
    }
  }

  /** Fixed-size overlapping token chunks — the training-window prep
    * step: starts every `chunkTokens − overlap` tokens, each chunk up
    * to `chunkTokens` long (the tail is shorter). Pure per-row
    * explode + slice — scales with the scan, no shuffle. Returns
    * (id, chunk_id, start_tok, chunk_toks, chunk_hash).
    */
  def chunked(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkTokens: Int = 128,
      overlap: Int = 32): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    df.withColumn("toks", tokens(textCol))
      .where(size(col("toks")) >= 1)
      .withColumn("start", explode(expr(
        s"sequence(0, size(toks) - 1, $stride)")))
      .withColumn("chunk", expr(s"slice(toks, start + 1, $chunkTokens)"))
      .select(col(idCol), expr(s"cast(start div $stride as bigint)").as("chunk_id"),
        col("start").cast(LongType).as("start_tok"),
        size(col("chunk")).cast(LongType).as("chunk_toks"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  /** Weighted sampling without replacement, k per group, by sequential
    * Poisson sampling (Ohlsson): priority = u / w with u the 60-bit
    * content-hash uniform — the k smallest priorities per group are the
    * sample. Two IEEE divisions, no RNG state and no pow/ln, so the
    * draw is reproducible across runs, engines, and cluster sizes.
    * One shuffle on the group key; the per-group top-k is a bounded
    * window. Returns (group, id, weight, rank).
    */
  def weightedSample(df: DataFrame, groupCol: String, weightCol: Column,
      idCol: String = "doc_id", k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("pri"), col(idCol))
    df.withColumn("w", weightCol.cast(DoubleType))
      .where(col("w") > 0)
      .withColumn("u", expr(
        s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)")
        .cast(DoubleType) / lit(1152921504606846976.0)) // 2^60, exact
      .withColumn("pri", col("u") / col("w"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(groupCol), col(idCol), col("w").as("weight"),
        col("rank").cast(LongType).as("rank"))
  }

  /** Linear classifier inference over hashed token features — how a
    * fasttext-style quality/safety filter actually runs at corpus
    * scale: tokens hash into `nBuckets` buckets, the bucket→weight
    * table (vocabulary-sized, here a column pair in `weights`:
    * (bucket, w)) BROADCASTS, and the doc score is an exact integer
    * sum with map-side combine. The corpus shuffles only slim
    * (doc_id, partial-sum) rows. Margin > 0 is the accept decision;
    * callers calibrate with their own trained weights. Returns
    * (id, n_toks, margin, accept).
    */
  def linearScore(df: DataFrame, weights: DataFrame, nBuckets: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.BitSketchExpressions.register(df.sparkSession)
    df.select(col(idCol), explode(tokens(textCol)).as("tok"))
      .withColumn("bucket", expr(s"graft_md5_60(tok) % $nBuckets"))
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("margin"))
      .withColumn("accept", col("margin") > 0)
  }

  /** Benchmark decontamination: corpus docs sharing ≥ `threshold` of
    * their word-3-gram shingles with any benchmark doc. The benchmark
    * side is bounded (eval sets are), so its exploded shingles
    * BROADCAST and the corpus streams through once — no corpus shuffle.
    * Returns (doc_id, bench_id, shared, overlap).
    */
  def contamination(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.1): DataFrame = {
    val cs = TextDedup.shingled(corpus, textCol)
      .select(col(idCol), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("sh"))
    val bs = TextDedup.shingled(bench, textCol)
      .select(col(idCol).as("bench_id"), explode(col("shingles")).as("sh"))
    cs.join(broadcast(bs), Seq("sh"))
      .groupBy(col(idCol), col("bench_id"), col("n_sh"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("overlap", round(col("shared").cast(DoubleType) / col("n_sh"), 6))
      .where(col("overlap") >= threshold)
      .select(col(idCol), col("bench_id"), col("shared"), col("overlap"))
  }

  /** Deflate compression ratio per document — the Gopher-family
    * repetitiveness signal: boilerplate and template spam compress far
    * below prose, so `deflate_len·1000 div raw_len` under ~300‰ marks
    * a document for removal. The zlib pass is the native codegen'd
    * [[graft.functions.DeflateLength]] expression (per-thread Deflater
    * reset per row), so the whole scoring projection stays inside one
    * whole-stage-codegen span — no UDF, no Dataset ser/deser boundary.
    * Level-6 zlib output is deterministic for fixed input bytes; no
    * SQL engine exposes zlib → the gate is rows-only by design.
    * Scales with the scan: per-row CPU, no shuffle.
    */
  def compressionRatio(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.BitSketchExpressions.register(df.sparkSession)
    df.select(col(idCol).cast(LongType).as(idCol),
        octet_length(col(textCol)).cast(LongType).as("raw_len"),
        expr(s"graft_deflate_len($textCol)").as("deflate_len"))
      .withColumn("ratio_permille",
        expr("deflate_len * 1000 div greatest(raw_len, 1)"))
      .withColumn("is_repetitive", col("ratio_permille") < 300)
  }
}
