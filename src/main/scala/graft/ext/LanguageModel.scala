package graft.ext

import graft.ops.Lineage.CutOps
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

  // ---------------------------------------------------------------------
  // INTERPOLATED KNESER-NEY TRIGRAM (Kneser & Ney 1995; the interpolated
  // form per Chen & Goodman 1998, "An Empirical Study of Smoothing
  // Techniques for Language Modeling" §2.7) — the algorithm CCNet's KenLM
  // actually runs (KenLM defaults to MODIFIED KN, three discounts per
  // level estimated from count-of-count statistics; this is the classic
  // single-fixed-discount form, D = 0.75 — the difference is a constant
  // of the table build, not of the pipeline shape). Lower levels use
  // CONTINUATION counts (in how many distinct contexts was this n-gram
  // seen), not raw counts — the insight that makes KN the strongest
  // count-based smoother: "Francisco" is frequent but follows only "San",
  // so its unigram backoff weight should be tiny.
  //
  // Model (D = 0.75 throughout; all counts exact int64):
  //   P3(w3|w1w2) = (c3(w1w2w3)−D)/c2'(w1w2) + λ2(w1w2)·P2(w3|w2)
  //       c2'(w1w2) = Σ_w c3(w1w2w) (ADJUSTED denominator — occurrences
  //       followed by something, so each history's mass sums to exactly 1
  //       without sentence-end markers), λ2 = D·t3(w1w2)/c2'(w1w2),
  //       t3 = #distinct continuations of the history.
  //   P2(w3|w2) = max(n3(w2w3)−D,0)/d2(w2) + λ1(w2)·P1(w3)
  //       n3(w2w3) = #distinct w1 with c3(w1w2w3)>0 (continuation count),
  //       d2(w2) = Σ_w n3(w2w), λ1 = D·t2(w2)/d2(w2), t2 = #distinct w
  //       with n3(w2w)>0.
  //   P1(w) = max(n2(w)−D,0)/B + D·V1/B · 1/(V+1)
  //       n2(w) = #distinct predecessors of w (bigram-type count), B =
  //       #bigram types, V1 = #words with n2>0, V = vocabulary size; the
  //       reserved mass spreads uniformly over V seen words + 1 unk slot,
  //       so P1 sums to exactly 1 and unseen words get P1(unk) =
  //       D·V1/B/(V+1).
  //   Every level telescopes to Σ_w P(w|·) = 1 — a real probability
  //   model, unlike stupid backoff's unnormalized scores.
  //
  // Determinism: the same quantize-at-training-time contract as
  // [[trainStupidBackoff]] — every table value is round(ln(·)·1e9) int64
  // with the double arithmetic inside the ln PINNED to one parenthesized
  // shape that the DuckDB oracle mirrors literally; scoring sums int64.
  // Backoff through a missed level ADDS quantized logs (ln λ + ln P) —
  // composition is exact in the quantized domain, so engines agree.
  //
  // Scale shape at 100 TB: training is four partial-agg groupBys over the
  // reference corpus's trigram stream (tri → hist2 → n3 → mid) plus
  // vocab-sized joins (AQE broadcasts the small sides); `minCount` prunes
  // the two big shipped tables (trigrams by raw count, continuation
  // bigrams by continuation count) — pruned keys take the backoff path,
  // shrinking tables without re-normalizing, exactly KenLM's pruning
  // posture. Scoring is ONE narrow corpus pass probing five broadcast
  // tables hash-side with a per-doc partial agg before the only (one
  // row per doc) shuffle. No window, no corpus-side wide exchange.
  // ---------------------------------------------------------------------

  /** Fixed Kneser-Ney discount (Chen & Goodman's D = N1/(N1+2N2) lands
    * near 0.75 on natural text; pinned constant so any engine replays). */
  val Discount: Double = 0.75

  /** Per-document trigram stream as (w1, w2, w3) structs; empty for docs
    * under three tokens. */
  private[graft] def trigramTriples(text: Column): Column =
    element_at(
      transform(array(TextStats.wsTokens(text)), toks => {
        val grams = transform(
          sequence(lit(0), size(toks) - 3),
          i => struct(
            element_at(toks, i + 1).as("w1"),
            element_at(toks, i + 2).as("w2"),
            element_at(toks, i + 3).as("w3")))
        when(size(toks) < 3,
          array().cast("array<struct<w1:string,w2:string,w3:string>>"))
          .otherwise(grams)
      }),
      1)

  /** Quantize a probability column: round(ln(p)·1e9) as int64. */
  private def q(p: Column): Column =
    round(log(p) * lit(LpScale)).cast("long")

  /** Train the five quantized KN tables plus the unk constant.
    *
    * Returns (triLp(w1,w2,w3,lpq), lambda2(w1,w2,lpq), p2Lp(w2,w3,lpq),
    * lambda1(w2,lpq), p1Lp(w3,lpq), unkLp(lpq_unk)). Table sizes: triLp ≤
    * distinct trigrams (pruned c3 ≥ minCount), p2Lp ≤ distinct
    * continuation bigrams (pruned n3 ≥ minCount), the rest vocab- or
    * history-sized. Statistics come from UNPRUNED counts, so pruning only
    * shrinks what ships. */
  def trainKneserNey(
      ref: DataFrame,
      textCol: String,
      minCount: Long = 1
  ): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(minCount >= 1, "minCount below 1 is meaningless")
    val D = Discount
    // The three reference-corpus passes (trigram counts, bigram types,
    // vocabulary) are MATERIALIZED eagerly: every one of the five model
    // tables below derives from them, and leaving them lazy repeats the
    // explode-heavy subtrees under every broadcast exchange — the r14
    // plan carried 370 physical operators / 158 Exchanges for plain KN,
    // with driver-side codegen source generation dominating the gate.
    // Checkpointing the vocab-bounded count tables (the KenLM "write the
    // intermediate ARPA counts" posture) collapses the scoring plan to
    // the five small aggregate+join subtrees. Model math is untouched —
    // same expressions over the same counts.
    val tri = ref
      .select(explode(trigramTriples(col(textCol))).as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
      .agg(count(lit(1)).as("c3"))
      .cutLineage()
    val hist2 = tri.groupBy("w1", "w2")
      .agg(sum("c3").as("c2p"), count(lit(1)).as("t3"))
    val n3 = tri.groupBy("w2", "w3").agg(count(lit(1)).as("n3"))
    val mid = n3.groupBy("w2").agg(sum("n3").as("d2"), count(lit(1)).as("t2"))
    // bigram TYPES (for the unigram continuation level)
    val bigTypes = ref
      .select(explode(bigramPairs(col(textCol))).as("p"))
      .select(element_at(split(col("p.bg"), " "), 1).as("w1"),
        col("p.w2").as("w2"))
      .distinct()
      .cutLineage()
    val n2 = bigTypes.groupBy(col("w2").as("w")).agg(count(lit(1)).as("n2"))
    val uni = ref.select(explode(TextStats.wsTokens(col(textCol))).as("w"))
      .distinct()
      .cutLineage()
    val tot = bigTypes.agg(count(lit(1)).as("__b"))
      .crossJoin(n2.agg(count(lit(1)).as("__v1")))
      .crossJoin(uni.agg(count(lit(1)).as("__v")))
    def dbl(c: String): Column = col(c).cast("double")
    // P1 carries the raw double for upper-level interpolation AND the
    // quantized log for scoring
    val p1 = uni.join(n2, uni("w") === n2("w"), "left").select(uni("w"), col("n2"))
      .crossJoin(broadcast(tot))
      .select(col("w"),
        (greatest(coalesce(dbl("n2"), lit(0.0)) - lit(D), lit(0.0)) / dbl("__b")
          + lit(D) * dbl("__v1") / dbl("__b") / (dbl("__v") + lit(1.0))).as("p1d"))
    val p1Lp = p1.select(col("w").as("w3"), q(col("p1d")).as("lpq"))
    val unkLp = tot.select(
      q(lit(D) * dbl("__v1") / dbl("__b") / (dbl("__v") + lit(1.0))).as("lpq_unk"))
    val lambda1 = mid.select(col("w2"),
      q(lit(D) * dbl("t2") / dbl("d2")).as("lpq"))
    val p2Full = n3.join(mid, "w2")
      .join(p1.select(col("w").as("w3"), col("p1d")), "w3")
      .select(col("w2"), col("w3"), col("n3"),
        (greatest(dbl("n3") - lit(D), lit(0.0)) / dbl("d2")
          + (lit(D) * dbl("t2") / dbl("d2")) * col("p1d")).as("p2d"))
    val p2Lp = p2Full.where(col("n3") >= minCount)
      .select(col("w2"), col("w3"), q(col("p2d")).as("lpq"))
    val lambda2 = hist2.select(col("w1"), col("w2"),
      q(lit(D) * dbl("t3") / dbl("c2p")).as("lpq"))
    val triLp = tri.where(col("c3") >= minCount)
      .join(hist2, Seq("w1", "w2"))
      .join(p2Full.select(col("w2"), col("w3"), col("p2d")), Seq("w2", "w3"))
      .select(col("w1"), col("w2"), col("w3"),
        q((dbl("c3") - lit(D)) / dbl("c2p")
          + (lit(D) * dbl("t3") / dbl("c2p")) * col("p2d")).as("lpq"))
    (triLp, lambda2, p2Lp, lambda1, p1Lp, unkLp)
  }

  /** Score every corpus document's average negative KN log-prob per
    * trigram (same surface as [[scoreLogPpl]]; lower = more fluent).
    * Missed levels compose in the quantized log domain: ln λ2 and ln λ1
    * add on the way down, an unseen history backs off with weight 1.
    * Returns (idCol, n_scored, logppl) for docs with ≥ 3 tokens. */
  def scoreKneserNey(
      corpus: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      minCount: Long = 1
  ): DataFrame =
    scoreKnTables(corpus, idCol, textCol, trainKneserNey(ref, textCol, minCount))

  /** The shared five-probe scoring chain over a trained KN table tuple. */
  private def scoreKnTables(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      tables: (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)
  ): DataFrame = {
    val (triLp, lambda2, p2Lp, lambda1, p1Lp, unkLp) = tables
    corpus
      .select(col(idCol), explode(trigramTriples(col(textCol))).as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
      .join(broadcast(triLp.withColumnRenamed("lpq", "lpq_tri")),
        Seq("w1", "w2", "w3"), "left")
      .join(broadcast(lambda2.withColumnRenamed("lpq", "lpq_l2")),
        Seq("w1", "w2"), "left")
      .join(broadcast(p2Lp.withColumnRenamed("lpq", "lpq_p2")),
        Seq("w2", "w3"), "left")
      .join(broadcast(lambda1.withColumnRenamed("lpq", "lpq_l1")),
        Seq("w2"), "left")
      .join(broadcast(p1Lp.withColumnRenamed("lpq", "lpq_p1")),
        Seq("w3"), "left")
      .crossJoin(broadcast(unkLp))
      .select(col(idCol),
        coalesce(col("lpq_tri"),
          coalesce(col("lpq_l2"), lit(0L)) +
            coalesce(col("lpq_p2"),
              coalesce(col("lpq_l1"), lit(0L)) +
                coalesce(col("lpq_p1"), col("lpq_unk")))).as("lpq"))
      .groupBy(col(idCol))
      .agg(sum("lpq").as("__s"), count(lit(1)).as("n_scored"))
      .select(col(idCol), col("n_scored"),
        (-(col("__s").cast("double") / lit(LpScale) / col("n_scored").cast("double")))
          .as("logppl"))
  }

  // ---------------------------------------------------------------------
  // MODIFIED Kneser-Ney (Chen & Goodman 1998 §2.8) — KenLM's default:
  // instead of one fixed discount per level, THREE discounts D1/D2/D3+
  // per level, estimated from that level's count-of-count statistics
  //
  //   Y = n1/(n1 + 2·n2)
  //   D1 = 1 − 2Y·n2/n1,  D2 = 2 − 3Y·n3/n2,  D3+ = 3 − 4Y·n4/n3
  //
  // (nk = #keys of the level with count exactly k; a key with count c is
  // discounted by D(c) = D1/D2/D3+ for c = 1/2/≥3), and the interpolation
  // weight reserves exactly the discounted mass:
  //
  //   λ(h) = (D1·N1(h) + D2·N2(h) + D3+·N3+(h)) / denom(h)
  //
  // with Nk(h) = #continuations of history h holding count k — so every
  // level still telescopes to Σ P = 1 exactly (spec-pinned end-to-end).
  // Degenerate statistics (a level with no count-1 keys, etc.) fall back
  // to the fixed 0.75 for that discount — KenLM aborts there; a corpus
  // engine must degrade deterministically instead, and the CASE is
  // mirrored in the oracle. Discounts clamp at 0 (estimates can go
  // negative on adversarial distributions); D(c) ≤ c holds by
  // construction so no mass goes negative.
  // ---------------------------------------------------------------------

  /** D1/D2/D3+ from count-of-count columns cc1..cc4 (pinned shapes). */
  private def mknDiscounts(cc: Int => Column): (Column, Column, Column) = {
    def d(k: Int, nk: Column, nk1: Column): Column = {
      val y = cc(1).cast("double") /
        (cc(1).cast("double") + lit(2.0) * cc(2).cast("double"))
      when(nk > 0 && (cc(1) + cc(2)) > 0,
        greatest(lit(k.toDouble) -
          lit(k + 1.0) * y * nk1.cast("double") / nk.cast("double"), lit(0.0)))
        .otherwise(lit(Discount))
    }
    (d(1, cc(1), cc(2)), d(2, cc(2), cc(3)), d(3, cc(3), cc(4)))
  }

  /** Per-key discount selector: D(c) for c ≥ 1 (0 for c = 0/null). */
  private def mknSelect(c: Column, d1: Column, d2: Column, d3: Column): Column =
    when(c.isNull || c === 0, lit(0.0))
      .when(c === 1, d1).when(c === 2, d2).otherwise(d3)

  /** Train the modified-KN table tuple (same shape as
    * [[trainKneserNey]]; same pruning posture). */
  def trainKneserNeyModified(
      ref: DataFrame,
      textCol: String,
      minCount: Long = 1
  ): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(minCount >= 1, "minCount below 1 is meaningless")
    def dbl(c: String): Column = col(c).cast("double")
    def ccAgg(c: Column, p: String): Seq[Column] = (1 to 4).map(k =>
      sum(when(c === k, 1L).otherwise(0L)).as(s"$p$k"))
    def nAgg(c: Column, p: String): Seq[Column] = Seq(
      sum(when(c === 1, 1L).otherwise(0L)).as(s"${p}_1"),
      sum(when(c === 2, 1L).otherwise(0L)).as(s"${p}_2"),
      sum(when(c >= 3, 1L).otherwise(0L)).as(s"${p}_3p"))
    val q = (p: Column) => round(log(p) * lit(LpScale)).cast("long")
    // same materialization posture as [[trainKneserNey]] — the modified
    // form re-reads tri/n3/n2 once more each for the count-of-count
    // statistics, so the lazy plan was even wider (3165 lines / 226
    // Exchanges in the r14 dump)
    val tri = ref
      .select(explode(trigramTriples(col(textCol))).as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
      .agg(count(lit(1)).as("c3"))
      .cutLineage()
    val l3Stats = tri.agg(ccAgg(col("c3"), "cc3_").head, ccAgg(col("c3"), "cc3_").tail: _*)
    val (da1, da2, da3) = mknDiscounts(k => col(s"cc3_$k"))
    val hist2 = tri.groupBy("w1", "w2")
      .agg(sum("c3").as("c2p"),
        (count(lit(1)).as("t3") +: nAgg(col("c3"), "t3")): _*)
    val n3 = tri.groupBy("w2", "w3").agg(count(lit(1)).as("n3"))
    val l2Stats = n3.agg(ccAgg(col("n3"), "cc2_").head, ccAgg(col("n3"), "cc2_").tail: _*)
    val (db1, db2, db3) = mknDiscounts(k => col(s"cc2_$k"))
    val mid = n3.groupBy("w2")
      .agg(sum("n3").as("d2"),
        (count(lit(1)).as("t2") +: nAgg(col("n3"), "t2")): _*)
    val bigTypes = ref
      .select(explode(bigramPairs(col(textCol))).as("p"))
      .select(element_at(split(col("p.bg"), " "), 1).as("w1"),
        col("p.w2").as("w2"))
      .distinct()
      .cutLineage()
    val n2 = bigTypes.groupBy(col("w2").as("w")).agg(count(lit(1)).as("n2"))
    val l1Stats = n2.agg(ccAgg(col("n2"), "cc1_").head, ccAgg(col("n2"), "cc1_").tail: _*)
    val (dc1, dc2, dc3) = mknDiscounts(k => col(s"cc1_$k"))
    val uni = ref.select(explode(TextStats.wsTokens(col(textCol))).as("w"))
      .distinct()
      .cutLineage()
    val tot = bigTypes.agg(count(lit(1)).as("__b"))
      .crossJoin(n2.agg(count(lit(1)).as("__v1")))
      .crossJoin(uni.agg(count(lit(1)).as("__v")))
      .crossJoin(broadcast(l1Stats))
    // unigram reserved mass: Σ_w D(n2(w)) = dc1·cc1_1 + dc2·cc1_2 +
    // dc3·(V1 − cc1_1 − cc1_2), spread over V seen words + 1 unk slot
    val resv = (dc1 * dbl("cc1_1") + dc2 * dbl("cc1_2") +
      dc3 * (dbl("__v1") - dbl("cc1_1") - dbl("cc1_2"))) / dbl("__b")
    val p1 = uni.join(n2, uni("w") === n2("w"), "left").select(uni("w"), col("n2"))
      .crossJoin(broadcast(tot))
      .select(col("w"),
        (greatest(coalesce(dbl("n2"), lit(0.0)) -
          mknSelect(col("n2"), dc1, dc2, dc3), lit(0.0)) / dbl("__b")
          + resv / (dbl("__v") + lit(1.0))).as("p1d"))
    val p1Lp = p1.select(col("w").as("w3"), q(col("p1d")).as("lpq"))
    val unkLp = tot.select(q(resv / (dbl("__v") + lit(1.0))).as("lpq_unk"))
    val lambda1 = mid.crossJoin(broadcast(l2Stats)).select(col("w2"),
      q((db1 * dbl("t2_1") + db2 * dbl("t2_2") + db3 * dbl("t2_3p")) / dbl("d2"))
        .as("lpq"))
    val p2Full = n3.join(mid, "w2")
      .join(p1.select(col("w").as("w3"), col("p1d")), "w3")
      .crossJoin(broadcast(l2Stats))
      .select(col("w2"), col("w3"), col("n3"),
        (greatest(dbl("n3") - mknSelect(col("n3"), db1, db2, db3), lit(0.0)) / dbl("d2")
          + ((db1 * dbl("t2_1") + db2 * dbl("t2_2") + db3 * dbl("t2_3p")) / dbl("d2"))
            * col("p1d")).as("p2d"))
    val p2Lp = p2Full.where(col("n3") >= minCount)
      .select(col("w2"), col("w3"), q(col("p2d")).as("lpq"))
    val lambda2 = hist2.crossJoin(broadcast(l3Stats)).select(col("w1"), col("w2"),
      q((da1 * dbl("t3_1") + da2 * dbl("t3_2") + da3 * dbl("t3_3p")) / dbl("c2p"))
        .as("lpq"))
    val triLp = tri.where(col("c3") >= minCount)
      .join(hist2, Seq("w1", "w2"))
      .join(p2Full.select(col("w2"), col("w3"), col("p2d")), Seq("w2", "w3"))
      .crossJoin(broadcast(l3Stats))
      .select(col("w1"), col("w2"), col("w3"),
        q((dbl("c3") - mknSelect(col("c3"), da1, da2, da3)) / dbl("c2p")
          + ((da1 * dbl("t3_1") + da2 * dbl("t3_2") + da3 * dbl("t3_3p")) / dbl("c2p"))
            * col("p2d")).as("lpq"))
    (triLp, lambda2, p2Lp, lambda1, p1Lp, unkLp)
  }

  /** [[scoreKneserNey]] with modified-KN discounts — KenLM's default. */
  def scoreKneserNeyModified(
      corpus: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      minCount: Long = 1
  ): DataFrame =
    scoreKnTables(corpus, idCol, textCol,
      trainKneserNeyModified(ref, textCol, minCount))

  /** Per-group LM scoring — CCNet's actual posture: one model PER
    * LANGUAGE, each document scored under its own language's model (a
    * Basque page is not judged by an English LM). One pass trains every
    * group's tables simultaneously: the group key joins every count
    * table (per-group totals become a groupBy instead of a one-row
    * aggregate, joined back instead of crossJoined), and scoring probes
    * carry the key — so the cost shape is IDENTICAL to [[scoreLogPpl]]
    * (broadcast tables, one per-doc shuffle), not #groups separate jobs.
    * Documents whose group has no reference rows are dropped (no model
    * exists to score them — route them through language-ID first).
    * Returns (idCol, groupCol, n_scored, logppl). */
  def scoreLogPplByGroup(
      corpus: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      groupCol: String,
      alpha: Double = 0.1,
      minCount: Long = 1
  ): DataFrame = {
    require(alpha > 0, "alpha must be positive (unseen words need mass)")
    require(minCount >= 1, "minCount below 1 is meaningless")
    val g = groupCol
    val uni = ref
      .select(col(g), explode(TextStats.wsTokens(col(textCol))).as("w"))
      .groupBy(col(g), col("w")).agg(count(lit(1)).as("c"))
    val totals = uni.groupBy(col(g))
      .agg(sum("c").as("__c_total"), count(lit(1)).as("__v_size"))
    def backoffLp(c: Column): Column =
      round(log(lit(Backoff) * (c.cast("double") + lit(alpha)) /
        (col("__c_total").cast("double") + lit(alpha) * col("__v_size").cast("double")))
        * lit(LpScale)).cast("long")
    val uniLp = uni.where(col("c") >= minCount)
      .join(totals, g)
      .select(col(g), col("w"), backoffLp(col("c")).as("lpq"))
    val unkLp = totals.select(col(g), backoffLp(lit(0.0)).as("lpq_unk"))
    val bigLp = ref
      .select(col(g), explode(bigramPairs(col(textCol))).as("p"))
      .groupBy(col(g), col("p.bg").as("bg")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(uni.select(col(g), col("w").as("w1"), col("c").as("c1")), Seq(g, "w1"))
      .select(col(g), col("bg"),
        round(log(col("c12").cast("double") / col("c1").cast("double"))
          * lit(LpScale)).cast("long").as("lpq"))
    corpus
      .select(col(idCol), col(g), explode(bigramPairs(col(textCol))).as("p"))
      .select(col(idCol), col(g), col("p.bg").as("bg"), col("p.w2").as("w2"))
      .join(broadcast(bigLp.withColumnRenamed("lpq", "lpq_bg")), Seq(g, "bg"), "left")
      .join(broadcast(uniLp.select(col(g), col("w").as("w2"), col("lpq").as("lpq_uni"))),
        Seq(g, "w2"), "left")
      .join(broadcast(unkLp), Seq(g)) // inner: groups without a model drop
      .select(col(idCol), col(g),
        coalesce(col("lpq_bg"), col("lpq_uni"), col("lpq_unk")).as("lpq"))
      .groupBy(col(idCol), col(g))
      .agg(sum("lpq").as("__s"), count(lit(1)).as("n_scored"))
      .select(col(idCol), col(g), col("n_scored"),
        (-(col("__s").cast("double") / lit(LpScale) / col("n_scored").cast("double")))
          .as("logppl"))
  }

  def scoreLogPpl(
      corpus: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 0.1,
      minCount: Long = 1
  ): DataFrame =
    scoreWithTables(corpus, textCol, idCol,
      trainStupidBackoff(ref, textCol, alpha, minCount))

  /** Score against PRE-TRAINED stupid-backoff tables — the streaming
    * posture: train once on the trusted reference, then every micro-batch
    * (or any later corpus) pays only the broadcast probes. */
  def scoreWithTables(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      tables: (DataFrame, DataFrame, DataFrame)
  ): DataFrame = {
    val (bigLp, uniLp, unkLp) = tables
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

  /** DoReMi-posture domain difficulty weights: per source, the mean
    * negative log-prob of its text under a reference LM, kept in EXACT
    * integer arithmetic — (source, n_tokens, parts) where `parts =
    * (−Σ lpq) div n_tokens` (1e9-quantized nats per token, truncating
    * integer division). Feed `parts` straight into
    * [[graft.ext.Sampling.mixturePlan]]: domains the reference model
    * finds hard (= underrepresented in the reference distribution)
    * receive proportionally more of the token budget — the
    * excess-loss-driven reweighting published as DoReMi (Xie et al.
    * 2023), with the group-DRO proxy collapsed to one measured pass.
    * [[scoreWithTables]] closes into a per-doc double; this stays on the
    * raw int64 sums so the downstream plan arithmetic is engine-exact.
    *
    * Scale shape: identical to the scorer — three broadcast probes over
    * one corpus pass, then a sources-sized partial aggregate. Nothing
    * corpus-sized shuffles. */
  def domainLossWeights(
      corpus: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      sourceCol: String,
      alpha: Double = 0.1,
      minCount: Long = 1
  ): DataFrame = {
    val (bigLp, uniLp, unkLp) =
      trainStupidBackoff(ref, textCol, alpha, minCount)
    corpus
      .select(col(sourceCol), explode(bigramPairs(col(textCol))).as("p"))
      .select(col(sourceCol), col("p.bg").as("bg"), col("p.w2").as("w2"))
      .join(broadcast(bigLp.withColumnRenamed("lpq", "lpq_bg")), Seq("bg"), "left")
      .join(broadcast(uniLp.select(col("w").as("w2"), col("lpq").as("lpq_uni"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(unkLp))
      .select(col(sourceCol),
        coalesce(col("lpq_bg"), col("lpq_uni"), col("lpq_unk")).as("lpq"))
      .groupBy(col(sourceCol))
      .agg((-sum("lpq")).as("__nlp"), count(lit(1)).as("n_tokens"))
      .select(col(sourceCol), col("n_tokens"),
        expr("__nlp div n_tokens").as("parts"))
  }
}
