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
    * auc_ppm = (u2·1e6) div (2·nPos·nNeg) — truncating integer division,
    * bit-identical in any engine.
    *
    * Scale shape: one partial-agg groupBy collapses the corpus to the
    * distinct-score table; the running-negatives window then runs over
    * THAT table, whose cardinality is the number of distinct scores —
    * for quantized margins (int64 at a fixed quantum) this is far below
    * corpus size, and a caller with a pathological score space coarsens
    * the quantum first. The window is unpartitioned by nature (a global
    * CDF): acceptable because its input is the collapsed table, never
    * the corpus. Label must evaluate to 0/1; degenerate inputs (no
    * positives or no negatives) yield auc_ppm null. */
  def rocAuc(df: DataFrame, scoreCol: String, label: Column): DataFrame = {
    val y = label.cast("long")
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(sum(y).as("p"), sum(lit(1L) - y).as("n"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cn", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(
        sum((col("p") * col("cn") * 2 + col("p") * col("n"))
          .cast("decimal(38,0)")).as("u2"),
        sum("p").as("n_pos"), sum("n").as("n_neg"))
      .select(col("u2").cast("long").as("u2"),
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(u2 * 1000000) div (2 * n_pos * n_neg)")).as("auc_ppm"))
  }

  /** Exact precision/recall curve: one row per DISTINCT score s — the
    * operating point "predict positive iff score ≥ s" — with integer
    * tp/fp/fn and truncating-ppm precision/recall. Same collapsed-table
    * shape as [[rocAuc]]: the corpus partial-aggregates to distinct
    * scores, cumulative counts run over that table (descending score,
    * inclusive), and the one-row totals broadcast. Every cell is
    * integer arithmetic — the curve replays bit-for-bit. */
  def prCurve(df: DataFrame, scoreCol: String, label: Column): DataFrame = {
    val y = label.cast("long")
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(sum(y).as("p"), sum(lit(1L) - y).as("n"))
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    g
      .withColumn("tp", sum(col("p")).over(w))
      .withColumn("fp", sum(col("n")).over(w))
      .crossJoin(broadcast(g.groupBy().agg(sum(col("p")).as("__np"))))
      .select(col("s"), col("tp"), col("fp"),
        (col("__np") - col("tp")).as("fn"),
        expr("(tp * 1000000) div (tp + fp)").as("precision_ppm"),
        when(col("__np") > 0, expr("(tp * 1000000) div __np"))
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
}
