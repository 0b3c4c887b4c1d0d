package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over hashed n-gram features — the
  * fastText-class supervised classifier of pretraining pipelines (domain
  * routing, FineWeb-Edu-style quality tagging), trained and applied
  * entirely inside the engine.
  *
  * Where [[Dsir]] reweights a corpus toward ONE target distribution, this
  * classifies every document into one of C labeled classes. Same
  * fixed-size hashed feature space ([[Dsir.featureBuckets]]: unigram +
  * bigram buckets — the model size is C·B regardless of corpus size), and
  * the same determinism discipline: per-(class, bucket) log-probs are
  * add-α smoothed over the DENSE bucket space (every pair materializes —
  * no missing-key path at scoring time) and quantized round(ln·1e9) int64
  * at training; scoring then sums integers and argmaxes on integers, so
  * prediction is exact-replayable in any engine — no float drift at all
  * outside the table build.
  *
  * Scale shape at 100 TB: training is one partial-agg groupBy over the
  * labeled slice's feature stream plus C·B-sized densification (a
  * crossJoin of C class rows × B generated bucket ids — model-sized, not
  * corpus-sized). Scoring explodes each doc's features once, probes the
  * broadcast model (each feature row fans out C ways — C is small and
  * fixed), and aggregates (doc, class) → doc with partial aggregation on
  * both shuffles; the argmax is a min-of-struct fold (ties pinned to the
  * lexicographically smallest label), never a window. */
object NaiveBayes {

  /** Train the dense quantized model from a labeled reference.
    *
    * Returns (model(label, b, lpq), priors(label, lpq_prior)): lpq =
    * round(ln((n + α)/(nc + α·B))·1e9) over EVERY (label, bucket) pair;
    * lpq_prior = round(ln(docs_c/docs_total)·1e9). */
  def train(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      buckets: Int = 10000,
      alpha: Double = 1.0,
      features: (Column, Int) => Column = Dsir.featureBuckets
  ): (DataFrame, DataFrame) = {
    require(buckets > 0, "buckets must be positive")
    require(alpha > 0, "alpha must be positive (unseen buckets need mass)")
    val q = (p: Column) => round(log(p) * lit(LanguageModel.LpScale)).cast("long")
    val counts = labeled
      .select(col(labelCol).as("label"),
        explode(features(col(textCol), buckets)).as("b"))
      .groupBy("label", "b").agg(count(lit(1)).as("n"))
    val classTotals = counts.groupBy("label").agg(sum("n").as("nc"))
    // dense C×B grid: every class × every bucket id (model-sized)
    val grid = classTotals.select(col("label"), col("nc"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("b"))
    val model = grid.join(counts, Seq("label", "b"), "left")
      .select(col("label"), col("b"),
        q((coalesce(col("n").cast("double"), lit(0.0)) + lit(alpha)) /
          (col("nc").cast("double") + lit(alpha * buckets))).as("lpq"))
    val docCounts = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("docs"))
    val priors = docCounts
      .crossJoin(broadcast(docCounts.agg(sum("docs").as("__t"))))
      .select(col("label"),
        q(col("docs").cast("double") / col("__t").cast("double")).as("lpq_prior"))
    (model, priors)
  }

  /** Classify every corpus document: (idCol, label, score_lpq) — label =
    * argmax_c [lpq_prior(c) + Σ_features lpq(c, b)], ties broken to the
    * smallest label (pinned via a min-of-struct on the negated integer
    * score — exact, no window). Documents with zero features (no tokens)
    * yield no row. */
  def classify(
      corpus: DataFrame,
      model: DataFrame,
      priors: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = 10000,
      features: (Column, Int) => Column = Dsir.featureBuckets
  ): DataFrame = {
    corpus
      .select(col(idCol),
        explode(features(col(textCol), buckets)).as("b"))
      .join(broadcast(model), Seq("b"))
      .groupBy(col(idCol), col("label"))
      .agg(sum("lpq").as("__s"))
      .join(broadcast(priors), Seq("label"))
      .select(col(idCol),
        struct((-(col("__s") + col("lpq_prior"))).as("negScore"),
          col("label")).as("__k"))
      .groupBy(col(idCol))
      .agg(min("__k").as("__best"))
      .select(col(idCol), col("__best.label").as("label"),
        (-col("__best.negScore")).as("score_lpq"))
  }

  /** Train on the labeled slice, classify the corpus, and cross-tabulate
    * predictions against the true labels — the corpus-QA artifact
    * (per-class accuracy lives on the diagonal). */
  def confusion(
      corpus: DataFrame,
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      idCol: String,
      buckets: Int = 10000,
      alpha: Double = 1.0,
      features: (Column, Int) => Column = Dsir.featureBuckets
  ): DataFrame = {
    val (model, priors) =
      train(labeled, textCol, labelCol, buckets, alpha, features)
    classify(corpus, model, priors, textCol, idCol, buckets, features)
      .join(corpus.select(col(idCol), col(labelCol).as("actual")), Seq(idCol))
      .groupBy(col("actual"), col("label").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
