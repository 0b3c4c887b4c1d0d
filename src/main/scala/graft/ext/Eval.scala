package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation metrics, oracle-exact: every statistic is
  * integer arithmetic over grouped counts — no floating ranks, no
  * division until the final exact-ppm step. */
object Eval {

  /** Exact ROC-AUC via the tie-aware Mann–Whitney U statistic, computed
    * on the DISTINCT-SCORE table:
    *
    *   2U = Σ_s 2·P_s·cumN_{<s} + P_s·N_s,   AUC = U / (nPos·nNeg)
    *
    * (P_s/N_s = positives/negatives at score s, cumN_{<s} = negatives
    * strictly below; the P_s·N_s term is the ½-credit for ties). Output
    * one row: (u2, n_pos, n_neg, auc_ppm) with u2 = 2U exactly and
    * auc_ppm = (u2·1e6) div (2·nPos·nNeg) — truncating integer division
    * computed in decimal(38,0) (u2 can pass 2^43 long before the ×1e6
    * product fits int64), bit-identical in any engine.
    *
    * Scale shape: one partial-agg groupBy collapses the corpus to the
    * distinct-score table; the running-negatives CDF over that table
    * then runs through [[graft.ops.PrefixSum]]'s two-pass partition-
    * offset scheme — a RANGE-PARTITIONED parallel sort, never an
    * unpartitioned Window. LR margins are per-doc int64 sums, so the
    * "collapsed" table can approach corpus cardinality; the CDF must
    * not assume it fits one task (the round-7 watch item this replaces).
    * Label must evaluate to 0/1; degenerate inputs (no positives or no
    * negatives) yield auc_ppm null. */
  def rocAuc(df: DataFrame, scoreCol: String, label: Column): DataFrame = {
    val y = label.cast("long")
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(sum(y).as("p"), sum(lit(1L) - y).as("n"))
    graft.ops.PrefixSum.running(g, Seq(col("s")), Seq("n" -> "__cn_incl"))
      .withColumn("cn", col("__cn_incl") - col("n"))
      .agg(
        sum((col("p") * col("cn") * 2 + col("p") * col("n"))
          .cast("decimal(38,0)")).as("u2"),
        sum("p").as("n_pos"), sum("n").as("n_neg"))
      .select(col("u2").cast("long").as("u2"),
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(cast(u2 as decimal(38,0)) * 1000000) div (2 * n_pos * n_neg)"))
          .as("auc_ppm"))
  }

  /** Exact precision/recall curve: one row per DISTINCT score s — the
    * operating point "predict positive iff score ≥ s" — with integer
    * tp/fp/fn and truncating-ppm precision/recall. Same collapsed-table
    * shape as [[rocAuc]], and the same two-pass CDF: both cumulative
    * counts (descending score, inclusive) ride ONE
    * [[graft.ops.PrefixSum]] range-sort — never an unpartitioned
    * Window — and the one-row totals broadcast (computed from the
    * checkpointed cumulative table, not a second corpus pass). Every
    * cell is integer arithmetic — the curve replays bit-for-bit. */
  def prCurve(df: DataFrame, scoreCol: String, label: Column): DataFrame = {
    val y = label.cast("long")
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(sum(y).as("p"), sum(lit(1L) - y).as("n"))
    val cum = graft.ops.PrefixSum.running(
      g, Seq(col("s").desc), Seq("p" -> "tp", "n" -> "fp"))
    cum
      .crossJoin(broadcast(cum.groupBy().agg(sum(col("p")).as("__np"))))
      .select(col("s"), col("tp"), col("fp"),
        (col("__np") - col("tp")).as("fn"),
        // ppm numerators in decimal(38,0): tp×1e6 would pass int64 once
        // tp nears 1e13 positives (the oracle's hugeint does the same)
        expr("(cast(tp as decimal(38,0)) * 1000000) div (tp + fp)")
          .as("precision_ppm"),
        when(col("__np") > 0,
          expr("(cast(tp as decimal(38,0)) * 1000000) div __np"))
          .as("recall_ppm"))
  }

  /** [[rocAuc]] per `groupCol` slice — where is the classifier weak?
    * (per-source/per-language filter quality, the slice-evaluation
    * twin of [[Drift.jsDivergenceBySlice]]). Same integer arithmetic;
    * the running-negatives window is KEYED by the group, so the
    * distinct-(group, score) table shuffles once on the group and no
    * global window exists. Output: (groupCol, u2, n_pos, n_neg,
    * auc_ppm) per group, degenerate groups null. */
  def rocAucByGroup(
      df: DataFrame, groupCol: String, scoreCol: String,
      label: Column): DataFrame = {
    val y = label.cast("long")
    val g = df.groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(sum(y).as("p"), sum(lit(1L) - y).as("n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cn", coalesce(sum(col("n")).over(w), lit(0L)))
      .groupBy(groupCol)
      .agg(
        sum((col("p") * col("cn") * 2 + col("p") * col("n"))
          .cast("decimal(38,0)")).as("u2"),
        sum("p").as("n_pos"), sum("n").as("n_neg"))
      .select(col(groupCol), col("u2").cast("long").as("u2"),
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(u2 * 1000000) div (2 * n_pos * n_neg)")).as("auc_ppm"))
  }

  /** Expected calibration error of a probabilistic classifier, exactly:
    * bins over the model's own probability (here the hard-sigmoid mass
    * p4 ∈ [0, 4e9], see [[LogReg]]), and per bin the gap between
    * PREDICTED positive mass (Σ p4) and ACTUAL positive mass
    * (n_pos · 4e9) — both exact int64 at the same scale, so
    *
    *   ece_ppm = (Σ_b |Σ p4 − n_pos·4e9| · 1e6) div (N · 4e9)
    *
    * is one truncating division, bit-identical in any engine. This is
    * the standard ECE (Σ n_b/N · |conf_b − acc_b|) with the absolute
    * gap taken on unnormalized masses — algebraically identical, no
    * per-bin division, no floats. Output one row: (n, n_bins, gap_sum,
    * ece_ppm). `binOf` maps a row to its bin id (e.g. the clamped
    * integer-margin bucket of the calibration report); `p4` and `label`
    * are the probability mass and 0/1 truth.
    *
    * Scale shape: one partial-agg groupBy to bins-sized rows, then a
    * one-row fold — the cheapest evaluation in the suite. */
  def calibrationError(
      df: DataFrame, binOf: Column, p4: Column, label: Column): DataFrame = {
    val y = label.cast("long")
    df.groupBy(binOf.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(y).as("n_pos"),
        sum(p4.cast("decimal(38,0)")).as("sp4"))
      .agg(sum("n").as("n"),
        count(lit(1)).as("n_bins"),
        sum(abs(col("sp4") - col("n_pos") * lit(4000000000L))).as("gap_sum"))
      .select(col("n"), col("n_bins"),
        col("gap_sum").cast("decimal(38,0)").as("gap_sum"),
        // denominator in decimal: n·4e9 would pass int64 near n ~ 2.3e9
        expr("(gap_sum * 1000000) div (cast(n as decimal(38,0)) * 4000000000)")
          .as("ece_ppm"))
  }

  /** Precision/recall of a predicted PAIR set against a truth pair set —
    * the evaluation leg of every candidate-generation screen (LSH bands,
    * SimHash buckets, blocking keys): recall is the near-dups the screen
    * missed, precision the bucket collisions it would pay to verify.
    * Both inputs are (a_id, b_id, …) frames; extra columns ignored, both
    * sides deduped so fan-out can't inflate counts, pairs assumed
    * canonical (a < b) as every graft pair producer emits them.
    *
    * Output one row: (n_pred, n_truth, n_hit, precision_ppm, recall_ppm)
    * with truncating-ppm integer arithmetic; a side with zero pairs
    * yields a null ppm rather than a fake 0 or crash.
    *
    * Scale shape: pair-set-sized join + one-row fold — costs no more
    * than materializing the inputs (the [[graft.ext.Similarity]]
    * `recallAtK` discipline, lifted from per-query to corpus pairs). */
  def pairPrf(predicted: DataFrame, truth: DataFrame): DataFrame = {
    val p = predicted.select(col("a_id"), col("b_id")).distinct()
      .withColumn("__p", lit(1L))
    val t = truth.select(col("a_id"), col("b_id")).distinct()
      .withColumn("__t", lit(1L))
    p.join(t, Seq("a_id", "b_id"), "full")
      .agg(sum(coalesce(col("__p"), lit(0L))).as("n_pred"),
        sum(coalesce(col("__t"), lit(0L))).as("n_truth"),
        sum(when(col("__p").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)).as("n_hit"))
      .select(col("n_pred"), col("n_truth"), col("n_hit"),
        when(col("n_pred") > 0,
          expr("(n_hit * 1000000) div n_pred")).as("precision_ppm"),
        when(col("n_truth") > 0,
          expr("(n_hit * 1000000) div n_truth")).as("recall_ppm"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters (label columns) on the same rows: the label-QA statistic for
    * annotator pairs, model-vs-truth, or router-vs-router comparisons,
    * where raw accuracy is inflated by class imbalance (a majority-class
    * rater scores high accuracy but kappa ≈ 0).
    *
    *   κ = (p_o − p_e)/(1 − p_e),  p_o = agree/n,
    *   p_e = Σ_k n_a(k)·n_b(k) / n²
    *
    * Everything is EXACT integer arithmetic in decimal(38,0) (the
    * products n_a·n_b and po·n reach n² — past int64 at ~3e9 rows):
    * output one row (n, n_agree, pe_num, kappa_num = po·n − pe_num,
    * kappa_den = n² − pe_num, kappa_ppm = kappa_num·1e6 div kappa_den).
    * Rows where either rater is null are excluded (no verdict, no
    * agreement credit); perfect chance agreement (kappa_den = 0, both
    * raters constant) yields null ppm rather than a fake value.
    *
    * Scale shape: ONE corpus exchange — the groupBy(a, b) confusion
    * matrix (K² rows, K = label-space size, fixed and small); marginals,
    * p_e, and the fold all derive from it, model-sized. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val conf = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val aTot = conf.groupBy("__a").agg(sum("__n").as("__na"))
    val bTot = conf.groupBy("__b").agg(sum("__n").as("__nb"))
    val pe = aTot.join(bTot, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__na").cast(d38) * col("__nb").cast(d38)),
        lit(0).cast(d38)).as("pe_num"))
    conf.agg(sum("__n").as("n"),
        sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
          .as("n_agree"))
      .crossJoin(broadcast(pe))
      .select(col("n"), col("n_agree"), col("pe_num"),
        (col("n_agree").cast(d38) * col("n").cast(d38) - col("pe_num"))
          .as("kappa_num"),
        (col("n").cast(d38) * col("n").cast(d38) - col("pe_num"))
          .as("kappa_den"))
      // sign-safe truncating ppm: kappa is NEGATIVE for worse-than-chance
      // raters, and engines disagree on negative integer division
      // (trunc vs floor) — divide magnitudes, reapply the sign
      .withColumn("kappa_ppm",
        when(col("kappa_den") =!= 0,
          expr("""cast(case when kappa_num >= 0
                 then (kappa_num * 1000000) div kappa_den
                 else -(((-kappa_num) * 1000000) div kappa_den)
                 end as bigint)""")))
  }

  /** Fleiss' kappa — chance-corrected agreement for n ≥ 2 raters over a
    * fixed category set (Fleiss 1971), the multi-rater generalization of
    * [[cohenKappa]] (which it does NOT reduce to at n = 2: Fleiss pools
    * marginals across raters; both are standard). The label-QA statistic
    * when an ensemble of classifiers/annotators labels the same corpus.
    *
    * Exact integer decomposition (the cohenKappa discipline): with
    * `S = Σ_i Σ_j n_ij²` (n_ij = raters assigning category j to item i),
    * `T = N·n` total assignments and `E = Σ_j (Σ_i n_ij)²`,
    * `κ = [(S − T)·T − E·(n−1)] / [(n−1)·(T² − E)]` — every term a
    * decimal(38,0) product of int64 counts; ppm is sign-safe truncating
    * (negative κ divides magnitudes, trunc-vs-floor portable). The
    * denominator is 0 exactly when every rater gives every item one
    * identical category (P̄ₑ = 1) — `kappa_ppm` is null then.
    *
    * Rows where ANY rater column is null are excluded (Fleiss requires a
    * constant rater count per item).
    *
    * Scale shape: one exchange keyed by item to count n_ij (partial-agg
    * friendly: the explode emits n rows per item and combines map-side),
    * then category-sized and one-row aggregates; no window, no product
    * join beyond one-row broadcasts.
    *
    * Output (one row): (n_items, n_raters, n_categories, s_sq, e_sq,
    * kappa_num, kappa_den, kappa_ppm). */
  def fleissKappa(
      df: DataFrame, idCol: String, raterCols: Seq[String]
  ): DataFrame = {
    require(raterCols.size >= 2, "fleissKappa: need >= 2 raters")
    val d38 = "decimal(38,0)"
    val nR = raterCols.size
    val nij = df
      .where(raterCols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(col(idCol).as("__i"),
        explode(array(raterCols.map(c => col(c).cast("string")): _*))
          .as("__cat"))
      .groupBy(col("__i"), col("__cat"))
      .agg(count(lit(1)).as("__nij"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sAgg = nij.agg(
      sum((col("__nij").cast(d38) * col("__nij").cast(d38))).as("s_sq"),
      sum(col("__nij")).as("__tot"))
    val eAgg = nij.groupBy("__cat").agg(sum(col("__nij")).as("__tj"))
      .agg(sum(col("__tj").cast(d38) * col("__tj").cast(d38)).as("e_sq"),
        count(lit(1)).as("n_categories"))
    sAgg.crossJoin(broadcast(eAgg))
      .select(
        expr(s"__tot div $nR").as("n_items"),
        lit(nR.toLong).as("n_raters"),
        col("n_categories"),
        col("s_sq"),
        col("e_sq"),
        ((col("s_sq") - col("__tot").cast(d38)) * col("__tot").cast(d38) -
          col("e_sq") * lit(nR - 1).cast(d38)).as("kappa_num"),
        (lit(nR - 1).cast(d38) *
          (col("__tot").cast(d38) * col("__tot").cast(d38) - col("e_sq")))
          .as("kappa_den"))
      .withColumn("kappa_ppm",
        when(col("kappa_den") =!= 0,
          expr("""cast(case when kappa_num >= 0
                 then (kappa_num * 1000000) div kappa_den
                 else -(((-kappa_num) * 1000000) div kappa_den)
                 end as bigint)""")))
  }
}
