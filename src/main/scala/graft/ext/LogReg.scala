package graft.ext

import graft.ops.Lineage.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary logistic-regression quality classifier over hashed n-gram
  * features — the FineWeb-Edu / fastText-linear class of supervised
  * corpus filters (train on a small labeled slice, score the whole
  * corpus), trained entirely inside the engine with integer fixed-point
  * arithmetic so every weight is exact-replayable in any engine.
  *
  * The link is the HARD sigmoid σ̂(z) = clamp(z/4 + 1/2, 0, 1)
  * (piecewise-linear; the standard low-precision-training surrogate).
  * Because σ̂ is linear between its saturation points, the entire
  * full-batch gradient-descent recurrence is closed under integer
  * arithmetic: weights live as int64 at the engine-wide 1e-9 quantum
  * ([[LanguageModel.LpScale]]), per-doc margins are exact integer dot
  * products, the surrogate probability p4 = clamp(z_q + 2e9, 0, 4e9) is
  * σ̂ at scale 4e9, and the weight update
  *
  *   w_q ← w_q − (lrNum · Σ_docs (p4 − 4e9·y)·x) div (4·n·lrDen)
  *
  * is one truncating integer division (Spark `div` on decimals ==
  * DuckDB `//` on hugeint == BigInt `/`: all truncate toward zero).
  * Decision boundaries coincide with true-sigmoid LR (both fire at
  * z = 0); only the gradient weighting near saturation differs.
  *
  * Features are the [[Dsir.featureBuckets]] hashed unigram+bigram count
  * space (model size ≤ buckets+1 regardless of corpus size) plus a
  * constant bias feature at bucket −1, so the bias trains through the
  * same code path as every other weight.
  *
  * Scale shape at 100 TB: training touches only the LABELED slice
  * (classifier training sets are 1e5–1e6 docs — slice-sized). The
  * feature stream is computed once, pre-partitioned by doc and cached;
  * each of the T iterations is (a) a broadcast join against the
  * model-sized weight table + a partial-agg doc rollup that reuses the
  * cached partitioning, and (b) a co-partitioned error×feature join +
  * partial-agg bucket rollup to ≤ buckets+1 gradient rows. The weight
  * table is collected and re-broadcast per iteration — a codebook-class
  * collect (≤ buckets+1 rows), same discipline as the PQ/IVF codebooks.
  * Gradient sums are decimal(38,0): |e4| ≤ 4e9 per doc, so int64 would
  * overflow near ~2e9 labeled feature occurrences. Corpus scoring is ONE
  * pass: explode features, inner-join the broadcast final weights
  * (unseen buckets carry weight 0 and drop out of the sum; the bias row
  * keeps every doc scoring, including empty ones), partial-agg per doc.
  */
object LogReg {

  /** σ̂ scale: p4 = 4e9·σ̂(z), so p4 ∈ [0, 4e9] and z_q enters unscaled. */
  val Four: Long = 4000000000L
  private val Half: Long = Four / 2

  /** Hashed count features of `df` plus the bias row b = −1, x = 1 per
    * doc: (__doc, __y, b, x). Empty docs still emit their bias row. */
  private def features(
      df: DataFrame, textCol: String, idCol: String, label: Column,
      buckets: Int): DataFrame = {
    val base = df.select(col(idCol).as("__doc"), label.cast("long").as("__y"),
      col(textCol).as("__text"))
    base
      .select(col("__doc"), col("__y"),
        explode(Dsir.featureBuckets(col("__text"), buckets)).as("b"))
      .groupBy("__doc", "__y", "b").agg(count(lit(1)).as("x"))
      .unionByName(base.select(col("__doc"), col("__y"),
        lit(-1L).as("b"), lit(1L).as("x")))
  }

  /** Train T full-batch iterations from all-zero weights; returns the
    * final weight table (b, wq) over every bucket seen in the labeled
    * slice (buckets never seen have identically zero gradient and stay
    * 0 — materializing them would add nothing). `label` must evaluate
    * to 0/1. Learning rate is the rational lrNum/lrDen so the update
    * stays a single exact integer division. */
  def train(
      labeled: DataFrame,
      textCol: String,
      idCol: String,
      label: Column,
      buckets: Int = 1000,
      iterations: Int = 3,
      lrNum: Long = 1L,
      lrDen: Long = 1L,
      initWeights: Option[DataFrame] = None
  ): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(iterations >= 0, "iterations must be non-negative")
    require(lrNum > 0 && lrDen > 0, "learning rate must be positive")
    val spark = labeled.sparkSession
    import spark.implicits._
    // lazy localCheckpoint (not persist): LogicalRDD keeps the repartition's
    // output partitioning, so the per-iteration co-partitioned joins still
    // plan exchange-free — but each of the 2T+2 downstream actions now
    // plans against the checkpoint instead of re-analyzing the hashed
    // feature lineage
    val feats = features(labeled, textCol, idCol, label, buckets)
      .repartition(col("__doc")).cutLineage(eager = false)
    try {
      val n = feats.where(col("b") === -1L).count()
      require(n > 0, "labeled slice is empty")
      // weight state: model-sized (≤ buckets+1), driver-held between
      // iterations like a codebook; BigInt so the update itself cannot
      // overflow before the fits-in-long check. Warm start (the
      // periodic-refresh posture: yesterday's model, today's labels)
      // seeds from `initWeights` — continuing on the SAME data is
      // exactly equivalent to more cold iterations, spec-pinned.
      val init: Map[Long, BigInt] = initWeights
        .map(_.collect().map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap)
        .getOrElse(Map.empty)
      var w: Map[Long, BigInt] = init ++
        feats.select("b").distinct().as[Long].collect()
          .map(b => b -> init.getOrElse(b, BigInt(0))).toMap
      val den = BigInt(4) * n * lrDen
      for (_ <- 1 to iterations) {
        val wDf = w.toSeq.map { case (b, v) => (b, v.toLong) }.toDF("b", "wq")
        // one pass: margin per doc (broadcast weights; doc rollup reuses
        // the cached partitioning), then the clamped error e4 = p4 − 4e9·y
        val e = feats.join(broadcast(wDf), Seq("b"))
          .groupBy("__doc")
          .agg(sum(col("x").cast("decimal(38,0)") * col("wq")).as("z"),
            max("__y").as("y"))
          .select(col("__doc"),
            (greatest(lit(0L), least(lit(Four), col("z") + lit(Half)))
              - lit(Four) * col("y")).cast("long").as("e4"))
        // one pass: gradient per bucket (co-partitioned join on __doc)
        val g = feats.join(e, Seq("__doc"))
          .groupBy("b")
          .agg(sum(col("e4").cast("decimal(38,0)") * col("x")).as("g"))
          .collect()
        w = g.foldLeft(w) { (acc, row) =>
          val b = row.getLong(0)
          val grad = BigInt(row.getDecimal(1).toBigInteger)
          val next = acc(b) - (BigInt(lrNum) * grad) / den
          require(next.isValidLong, s"weight overflow at bucket $b: $next")
          acc.updated(b, next)
        }
      }
      w.toSeq.map { case (b, v) => (b, v.toLong) }.toDF("b", "wq")
    } finally {
      // the returned weights are driver-local — the feature checkpoint's
      // blocks are dead here; Dataset.unpersist would be a no-op on the
      // checkpointed frame, so release through the LogicalRDD (restores
      // the explicit lifecycle the persist→checkpoint swap dropped)
      graft.ops.Lineage.release(feats)
    }
  }

  /** Score every corpus doc under trained `weights`: (idCol, zq, p4,
    * pred) with zq the integer margin, p4 = 4e9·σ̂(zq) and pred =
    * 1 ⇔ zq ≥ 0 (the true-sigmoid decision too). One corpus pass;
    * unseen buckets drop out of the inner join (weight 0), the bias
    * row keeps empty docs scoring. */
  def score(
      corpus: DataFrame,
      weights: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = 1000
  ): DataFrame =
    features(corpus, textCol, idCol, lit(0L), buckets)
      .join(broadcast(weights), Seq("b"))
      .groupBy("__doc")
      .agg(sum(col("x").cast("decimal(38,0)") * col("wq")).as("z"))
      .select(col("__doc").as(idCol),
        col("z").cast("long").as("zq"),
        greatest(lit(0L), least(lit(Four), col("z") + lit(Half)))
          .cast("long").as("p4"),
        when(col("z") >= 0, 1L).otherwise(0L).as("pred"))
}
