package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift monitoring: is the distribution of what a crawl is
  * bringing in moving away from the corpus it feeds?
  *
  * The steady-state pipelines this engine targets ingest batches forever;
  * a quality regression usually shows up as DISTRIBUTION shift (language
  * mix, boilerplate share, spam templates) long before any per-document
  * filter fires. The standard scalar for that is Jensen–Shannon
  * divergence between token distributions — symmetric, bounded
  * ([0, ln 2]), defined even where one side has zero mass.
  *
  * Scale shape: each side collapses to a `buckets`-sized hashed-token
  * histogram in ONE pass (explode → partial-agg count); everything after
  * is arithmetic on two histogram tables — corpus size never matters
  * again. Hashing tokens into a fixed bucket space (the hashing trick)
  * bounds state and makes the comparison streamable; bucket collisions
  * only ever UNDER-state divergence, shrinking as buckets grow.
  *
  * Determinism (the oracle contract, same discipline as
  * [[LanguageModel]]): each bucket's log-ratio is quantized —
  * `round(ln·1e9)` as int64 — and the JS sums run over exact integer
  * products (`count × quantized-log`), so any engine reproduces the
  * result bit-for-bit; the only doubles are one fixed-shape final
  * expression. */
object Drift {

  /** Hashed-token histogram: (bucket, n) with exactly `buckets` possible
    * rows. One corpus pass, map-side partial counts. */
  def tokenHistogram(df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "Drift: buckets must be positive")
    df.select(explode(TextStats.wsTokens(col(textCol))).as("tok"))
      .select((TextHash.hmod(col("tok")) % buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Jensen–Shannon divergence between the hashed-token distributions of
    * `ref` and `batch`:
    *
    *   JS(P,Q) = ½·Σᵢ pᵢ·ln(pᵢ/mᵢ) + ½·Σᵢ qᵢ·ln(qᵢ/mᵢ),  m = (P+Q)/2
    *
    * with pᵢ/mᵢ expanded over raw counts as 2·npᵢ·Nq / (npᵢ·Nq + nqᵢ·Np)
    * so no per-bucket normalization ever happens in floating point.
    *
    * Returns one row: (n_ref, n_batch, js). Identical distributions give
    * js = 0 exactly (the log ratio quantizes to 0); total disjointness
    * approaches ln 2 ≈ 0.6931. Either side empty is an error — there is
    * no distribution to compare. */
  def jsDivergence(ref: DataFrame, batch: DataFrame, textCol: String,
      buckets: Int = 4096): DataFrame =
    jsOfHistograms(
      tokenHistogram(ref, textCol, buckets).withColumnRenamed("n", "np"),
      tokenHistogram(batch, textCol, buckets).withColumnRenamed("n", "nq"))

  /** The JS core over two (bucket, count) histograms — the identical
    * quantized arithmetic for token and numeric variants. */
  private def jsOfHistograms(hp: DataFrame, hq: DataFrame): DataFrame = {
    val j = hp.join(hq, Seq("bucket"), "full_outer")
      .select(coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("nq"), lit(0L)).as("nq"))
    // totals are a buckets-sized aggregate; the one-row result broadcasts
    val tot = j.agg(sum("np").as("tnp"), sum("nq").as("tnq"))
    val joined = j.crossJoin(broadcast(tot))
    def d(c: String): Column = col(c).cast("double")
    // denom is 0 only when a SIDE is entirely empty (tnp or tnq = 0):
    // null-safe division then nulls the term and the final js — an empty
    // side yields js = NULL rather than an ANSI divide-by-zero (the
    // streaming drift monitor quarantines such batches on the null)
    val denom = d("np") * d("tnq") + d("nq") * d("tnp")
    val safeDenom = when(denom === 0.0, lit(null)).otherwise(denom)
    def term(n: String, t: String): Column =
      round(log(lit(2.0) * d(n) * d(t) / safeDenom) * lit(1e9)).cast("bigint")
    joined.agg(
        max(col("tnp")).as("n_ref"),
        max(col("tnq")).as("n_batch"),
        sum(when(col("np") > 0,
          col("np").cast("decimal(38,0)") * term("np", "tnq"))).as("__sp"),
        sum(when(col("nq") > 0,
          col("nq").cast("decimal(38,0)") * term("nq", "tnp"))).as("__sq"))
      .select(col("n_ref"), col("n_batch"),
        (col("__sp").cast("double") / (lit(2e9) * col("n_ref").cast("double")) +
          col("__sq").cast("double") / (lit(2e9) * col("n_batch").cast("double")))
          .as("js"))
  }

  /** JS divergence of a batch against a PRECOMPUTED reference histogram
    * (`(bucket, n)` from [[tokenHistogram]]) — the steady-state monitor
    * shape: the reference corpus collapses to its histogram ONCE, every
    * arriving batch then costs one batch-sized pass plus histogram
    * arithmetic. Same quantized JS core. */
  def jsDivergenceAgainstHistogram(refHist: DataFrame, batch: DataFrame,
      textCol: String, buckets: Int): DataFrame =
    jsOfHistograms(
      refHist.select(col("bucket"), col("n").as("np")),
      tokenHistogram(batch, textCol, buckets).withColumnRenamed("n", "nq"))

  /** Fixed-width numeric histogram over [lo, hi): bin −1 collects
    * underflow, bin `bins` overflow, interior bins are
    * floor((v − lo)·bins/(hi − lo)) — a fixed-shape double expression
    * any engine reproduces. Nulls are dropped (no value, no mass). */
  def numericHistogram(df: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, "Drift: bins must be positive")
    require(lo < hi, "Drift: lo must be < hi")
    val v = col(valueCol).cast("double")
    val bin = when(v < lo, lit(-1L))
      .when(v >= hi, lit(bins.toLong))
      .otherwise(floor((v - lit(lo)) * lit(bins.toDouble) / lit(hi - lo))
        .cast("long"))
    df.where(v.isNotNull)
      .select(bin.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** JS divergence between two NUMERIC distributions — the feature/
    * metric drift monitor (price mix, doc-length mix, score
    * distributions) beside the token-level corpus monitor. Same
    * one-pass histogram collapse (bins + 2 rows per side) and the same
    * quantized JS arithmetic; out-of-range mass lands in the under/
    * overflow bins rather than silently vanishing. */
  def jsDivergenceNumeric(ref: DataFrame, batch: DataFrame,
      valueCol: String, lo: Double, hi: Double, bins: Int = 256): DataFrame =
    jsOfHistograms(
      numericHistogram(ref, valueCol, lo, hi, bins)
        .withColumnRenamed("n", "np"),
      numericHistogram(batch, valueCol, lo, hi, bins)
        .withColumnRenamed("n", "nq"))

  /** Per-slice drift: JS divergence of every `keyCol` group in `batch`
    * against the whole reference — which source/language/host is driving
    * the shift. One histogram pass per side; the reference histogram is
    * computed once and re-joined per slice. Output: (keyCol, n_ref,
    * n_batch, js) per slice. */
  def jsDivergenceBySlice(ref: DataFrame, batch: DataFrame, textCol: String,
      keyCol: String, buckets: Int = 4096): DataFrame = {
    val hp = tokenHistogram(ref, textCol, buckets)
      .withColumnRenamed("n", "np")
    val hq = batch
      .select(col(keyCol), explode(TextStats.wsTokens(col(textCol))).as("tok"))
      .select(col(keyCol), (TextHash.hmod(col("tok")) % buckets).as("bucket"))
      .groupBy(keyCol, "bucket").agg(count(lit(1)).as("nq"))
    // every slice must see EVERY ref bucket (a bucket a slice lacks still
    // contributes its P-mass to that slice's sum) — materialize the
    // keys × buckets grid explicitly; both dimensions are bounded (the
    // slice key is a dimension, the histogram is `buckets`-sized), so the
    // grid broadcasts and the corpus-sized sides never re-shuffle for it
    val grid = hq.select(keyCol).distinct().crossJoin(broadcast(hp))
    val j = grid.join(hq, Seq(keyCol, "bucket"), "full_outer")
      .select(col(keyCol),
        coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("nq"), lit(0L)).as("nq"))
      .crossJoin(broadcast(hp.agg(sum("np").as("tnp"))))
    val totQ = j.groupBy(keyCol).agg(sum("nq").as("tnq"))
    val full = j.join(broadcast(totQ), keyCol)
    def d(c: String): Column = col(c).cast("double")
    // denom is 0 only when a SIDE is entirely empty (tnp or tnq = 0):
    // null-safe division then nulls the term and the final js — an empty
    // side yields js = NULL rather than an ANSI divide-by-zero (the
    // streaming drift monitor quarantines such batches on the null)
    val denom = d("np") * d("tnq") + d("nq") * d("tnp")
    val safeDenom = when(denom === 0.0, lit(null)).otherwise(denom)
    def term(n: String, t: String): Column =
      round(log(lit(2.0) * d(n) * d(t) / safeDenom) * lit(1e9)).cast("bigint")
    full.groupBy(keyCol)
      .agg(max(col("tnp")).as("n_ref"), max(col("tnq")).as("n_batch"),
        sum(when(col("np") > 0,
          col("np").cast("decimal(38,0)") * term("np", "tnq"))).as("__sp"),
        sum(when(col("nq") > 0,
          col("nq").cast("decimal(38,0)") * term("nq", "tnp"))).as("__sq"))
      .select(col(keyCol), col("n_ref"), col("n_batch"),
        (col("__sp").cast("double") / (lit(2e9) * col("n_ref").cast("double")) +
          col("__sq").cast("double") / (lit(2e9) * col("n_batch").cast("double")))
          .as("js"))
  }

  /** EMBEDDING-space drift between two corpus snapshots: per-key centroid
    * cosine and mean-shift, the retrain/re-embed alarm the token-frequency
    * JS divergence can't see (a paraphrased or re-encoded corpus keeps its
    * token histogram while its embedding geometry moves).
    *
    * Exact integer arithmetic end-to-end so any engine agrees: each side's
    * per-key, per-dim centroid is `sum(round(x·1e7)) div n` (the
    * [[graft.ext.Similarity.centroids]] quantization, then truncating
    * integer division — never a float mean), and the cosine/shift fold
    * over the 64-dim quantized centroids is int64 sums (|q| ≤ 1e7 ⇒
    * q²·dims ≤ 6.4e15, inside int64) with one final double
    * division/sqrt. Returns (key, n_ref, n_new, cosine, shift) where
    * `shift` is the L2 distance between centroids in original units.
    *
    * Scale shape: per-side partial-agg of dims × keys integer sums (the
    * shuffle carries keys × dims rows, never vectors), one keys-sized
    * join, one keys-sized fold. */
  /** One side's quantized-centroid state for [[embeddingDrift]]: (keyCol,
    * `<p>_n`, dim, `<p>_q`) where q = sum(round(x·1e7)) div n per (key,
    * dim). This IS the drift reference — freeze it (a keys × dims table)
    * and compare any later snapshot or micro-batch against it without
    * rescanning the reference corpus. */
  def quantizedCentroids(
      df: DataFrame, vecCol: String, keyCol: String,
      nDims: Int, p: String): DataFrame = {
    val sums = (0 until nDims).map(i =>
      sum(round(element_at(col(vecCol), i + 1).cast("double") * lit(1e7))
        .cast("long")).as(s"_s$i"))
    val wide = df.groupBy(col(keyCol))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as(s"${p}_n")): _*)
    val stackArgs = (0 until nDims)
      .map(i => s"$i, _s$i div ${p}_n").mkString(", ")
    wide.select(col(keyCol), col(s"${p}_n"),
      expr(s"stack($nDims, $stackArgs) AS (dim, ${p}_q)"))
  }

  def embeddingDrift(
      ref: DataFrame,
      cur: DataFrame,
      vecCol: String,
      keyCol: String,
      nDims: Int
  ): DataFrame =
    embeddingDriftAgainstCentroids(
      quantizedCentroids(ref, vecCol, keyCol, nDims, "ref"),
      cur, vecCol, keyCol, nDims)

  /** [[embeddingDrift]] against a PRECOMPUTED reference centroid table
    * ([[quantizedCentroids]] with prefix "ref") — the streaming posture:
    * the reference corpus is collapsed once; each micro-batch pays one
    * narrow centroid pass plus a keys-sized join. */
  def embeddingDriftAgainstCentroids(
      refCentroids: DataFrame, // (keyCol, ref_n, dim, ref_q)
      cur: DataFrame,
      vecCol: String,
      keyCol: String,
      nDims: Int
  ): DataFrame = {
    val b = quantizedCentroids(cur, vecCol, keyCol, nDims, "new")
    refCentroids.join(b, Seq(keyCol, "dim"))
      .groupBy(col(keyCol))
      .agg(
        max(col("ref_n")).as("n_ref"), max(col("new_n")).as("n_new"),
        sum(col("ref_q") * col("new_q")).as("__dot"),
        sum(col("ref_q") * col("ref_q")).as("__na"),
        sum(col("new_q") * col("new_q")).as("__nb"),
        sum((col("ref_q") - col("new_q")) * (col("ref_q") - col("new_q")))
          .as("__d2"))
      .select(col(keyCol), col("n_ref"), col("n_new"),
        (col("__dot").cast("double") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
          .as("cosine"),
        (sqrt(col("__d2").cast("double")) / lit(1e7)).as("shift"))
  }
}
