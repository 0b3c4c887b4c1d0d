package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality filtering (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"): score every document by its per-token log-probability under a
  * language model trained on a trusted reference corpus, then filter or
  * bucket by the score — the most-used quality signal in real pretraining
  * pipelines (CCNet/RefinedWeb-class filtering), catching gibberish,
  * keyword stuffing, and non-prose that rule bundles ([[TextStats.gopherRules]])
  * miss.
  *
  * The model here is a word-bigram LM with stupid backoff (Brants et al.
  * 2007, "Large Language Models in Machine Translation" — the published
  * at-scale choice precisely because its scores need no normalization):
  *
  *   score(w2 | w1) = c(w1 w2) / c(w1)            when the bigram was seen
  *                  = 0.4 · (c(w2) + α) / (C + α·V)   otherwise
  *
  * with add-α-smoothed unigram backoff (unseen words get the α mass), C =
  * reference token count, V = reference vocabulary size. CCNet proper uses
  * a KenLM 5-gram — same pipeline shape, bigger tables; the order is a
  * constant of the table build, not of the engine design.
  *
  * Determinism (the oracle contract): per-token log-probs are quantized at
  * TRAINING time — round(ln(score)·1e9) as int64 — so the LM tables are
  * byte-identical in any engine (the last-ulp drift between StrictMath.log
  * and libm ln is absorbed by the 1e-9 quantum, the [[TextStats.tfidfTopK]]
  * discipline), and scoring sums those int64s exactly (order-free). The
  * one double division at the end runs in fixed parenthesized order.
  *
  * Scale shape at 100 TB:
  *   - training is two partial-agg groupBys over the reference corpus
  *     (unigrams, bigrams) plus one vocab-sized join to attach c(w1);
  *     `minCount` prunes both tables (KenLM-style count pruning) — THE
  *     knob that keeps them broadcastable as the reference grows;
  *   - scoring is one narrow pass over the corpus: the bigram stream
  *     explodes transiently inside one codegen pipeline (the let-bound
  *     token array materializes once per doc), probes the two broadcast
  *     LM tables hash-side, and partial-aggregates per-doc sums BEFORE
  *     the only shuffle — which carries one row per document. No window,
  *     no corpus-side wide exchange, nothing collects.
  */
object LanguageModel {

  /** Log-prob quantum: round(ln·1e9) — 9 decimal digits of the log keep
    * cross-engine ulp drift out while staying far inside int64 for any
    * realistic document (10^9 tokens/doc before overflow risk). */
  val LpScale: Double = 1e9

  /** Stupid-backoff discount (the published constant). */
  val Backoff: Double = 0.4

  /** Per-document bigram stream as (bg = "w1 w2", w2) structs over the
    * whitespace tokens, let-bound so the split runs once per row. Docs
    * with fewer than two tokens yield an empty stream. */
  private[graft] def bigramPairs(text: Column): Column =
    element_at(
      transform(array(TextStats.wsTokens(text)), toks => {
        val grams = transform(
          sequence(lit(0), size(toks) - 2),
          i => struct(
            concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)).as("bg"),
            element_at(toks, i + 2).as("w2")))
        when(size(toks) < 2,
          array().cast("array<struct<bg:string,w2:string>>")).otherwise(grams)
      }),
      1)

  /** Train the quantized-log-prob tables from a reference corpus.
    *
    * Returns (bigramLp, unigramLp, unkLp):
    *   - bigramLp  (bg: "w1 w2", lpq): round(ln(c12/c1)·1e9), pruned to
    *     c12 ≥ minCount;
    *   - unigramLp (w, lpq): round(ln(0.4·(c+α)/(C+α·V))·1e9), pruned to
    *     c ≥ minCount;
    *   - unkLp     (lpq_unk): the same formula at c = 0 — one row,
    *     crossJoin-broadcast at scoring time (never a collect).
    *
    * C and V come from the UNPRUNED counts, so pruning only shrinks the
    * tables (pruned words score as unknown) without re-normalizing the
    * model. */
  def trainStupidBackoff(
      ref: DataFrame,
      textCol: String,
      alpha: Double = 0.1,
      minCount: Long = 1
  ): (DataFrame, DataFrame, DataFrame) = {
    require(alpha > 0, "alpha must be positive (unseen words need mass)")
    require(minCount >= 1, "minCount below 1 is meaningless")
    val uni = ref
      .select(explode(TextStats.wsTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum("c").as("__c_total"), count(lit(1)).as("__v_size"))
    def backoffLp(c: Column): Column =
      round(log(lit(Backoff) * (c.cast("double") + lit(alpha)) /
        (col("__c_total").cast("double") + lit(alpha) * col("__v_size").cast("double")))
        * lit(LpScale)).cast("long")
    val uniLp = uni.where(col("c") >= minCount)
      .crossJoin(broadcast(totals))
      .select(col("w"), backoffLp(col("c")).as("lpq"))
    val unkLp = totals.select(backoffLp(lit(0.0)).as("lpq_unk"))
    // bigram counts; c(w1) attaches via an ordinary equi join (train-time,
    // vocab-sized both sides — AQE broadcasts the smaller)
    val bigLp = ref
      .select(explode(bigramPairs(col(textCol))).as("p"))
      .groupBy(col("p.bg").as("bg")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .select(col("bg"),
        round(log(col("c12").cast("double") / col("c1").cast("double"))
          * lit(LpScale)).cast("long").as("lpq"))
    (bigLp, uniLp, unkLp)
  }

  /** Score every corpus document's average negative log-prob per token
    * (the log of CCNet's perplexity, monotone with it — lower = more
    * fluent under the reference LM; exp() is left to the caller because
    * it reintroduces cross-engine float drift for zero analytical gain).
    *
    * Returns (idCol, n_scored, logppl) for every document with at least
    * one bigram (≥ 2 tokens); n_scored = token count − 1. */
  /** CCNet's head/middle/tail split: bucket every document by its
    * [[scoreLogPpl]] score against the corpus's own perplexity quantiles
    * (the paper cuts at thirds — head = most fluent under the reference
    * LM, the slice pretraining pipelines keep or upsample).
    *
    * Two-tier quantiles, the [[graft.ops.Percentiles]] contract: the
    * exact `percentile` (gate tier — the oracle must match bit-for-bit)
    * buffers every score in one aggregation buffer, so production runs
    * use the default Greenwald-Khanna sketch tier (`exact = false`),
    * the only shape that survives 100×. The cuts are a ONE-ROW aggregate
    * crossJoin-broadcast back — bucketing adds no shuffle beyond the
    * scoring pass itself.
    *
    * Returns (idCol, n_scored, logppl, bucket ∈ head|middle|tail). */
  def pplBuckets(
      corpus: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 0.1,
      minCount: Long = 1,
      lo: Double = 1.0 / 3,
      hi: Double = 2.0 / 3,
      exact: Boolean = false,
      accuracy: Int = 10000
  ): DataFrame = {
    require(lo > 0 && hi < 1 && lo <= hi, "need 0 < lo <= hi < 1")
    val scored = scoreLogPpl(corpus, ref, textCol, idCol, alpha, minCount)
    def cut(p: Double): org.apache.spark.sql.Column =
      if (exact) expr(s"percentile(logppl, $p)")
      else expr(s"approx_percentile(logppl, $p, $accuracy)").cast("double")
    val cuts = scored.agg(cut(lo).as("__lo"), cut(hi).as("__hi"))
    scored.crossJoin(broadcast(cuts))
      .select(col(idCol), col("n_scored"), col("logppl"),
        when(col("logppl") <= col("__lo"), "head")
          .when(col("logppl") <= col("__hi"), "middle")
          .otherwise("tail").as("bucket"))
  }

  def scoreLogPpl(
      corpus: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 0.1,
      minCount: Long = 1
  ): DataFrame = {
    val (bigLp, uniLp, unkLp) = trainStupidBackoff(ref, textCol, alpha, minCount)
    corpus
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("p"))
      .select(col(idCol), col("p.bg").as("bg"), col("p.w2").as("w2"))
      .join(broadcast(bigLp.withColumnRenamed("lpq", "lpq_bg")), Seq("bg"), "left")
      .join(broadcast(uniLp.select(col("w").as("w2"), col("lpq").as("lpq_uni"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(unkLp))
      .select(col(idCol),
        coalesce(col("lpq_bg"), col("lpq_uni"), col("lpq_unk")).as("lpq"))
      .groupBy(col(idCol))
      .agg(sum("lpq").as("__s"), count(lit(1)).as("n_scored"))
      .select(col(idCol), col("n_scored"),
        (-(col("__s").cast("double") / lit(LpScale) / col("n_scored").cast("double")))
          .as("logppl"))
  }
}
