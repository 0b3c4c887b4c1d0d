package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped percentiles with an explicit exact/approx tier — the same
  * two-tier contract as [[Profile]] (exact for bit-for-bit oracle checks,
  * sketch-based for production scale).
  *
  * Scale note: Spark's exact `percentile` is a TypedImperativeAggregate
  * that buffers EVERY value of a group in an executor-side
  * OpenHashMap before sorting — with few groups at 100 TB a single
  * aggregation buffer holds ~1/groups of the table: an OOM, not a plan.
  * `exact = false` uses `approx_percentile` (Greenwald-Khanna sketch,
  * bounded memory `O(1/accuracy)` per group, mergeable map-side), which is
  * the only shape that survives a 100× scale-up. The gate query runs the
  * exact tier because the DuckDB oracle must match bit-for-bit; production
  * callers get the sketch tier by default.
  */
object Percentiles {

  /** One row per group: count plus one column per requested percentile
    * (named by caller). `ps` maps output column name → fraction. */
  def grouped(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[(String, Double)],
      exact: Boolean = false,
      accuracy: Int = 10000
  ): DataFrame = {
    val aggs: Seq[Column] = ps.map { case (name, p) =>
      val c =
        if (exact) expr(s"percentile($valueCol, $p)")
        else expr(s"approx_percentile($valueCol, $p, $accuracy)").cast("double")
      c.as(name)
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** EXACT global percentiles that survive 100 TB: no executor-side value
    * buffer (the `percentile` aggregate's OOM shape) and no single-task
    * global sort. One row out: `n` plus one column per requested
    * percentile, exact discrete semantics — the p-quantile is the
    * smallest value whose cumulative count reaches `ceil(p·n)`.
    *
    * Shape: (1) per-VALUE counts — the only input-width exchange, fully
    * partial-agged, carrying one row per distinct value; (2)
    * [[PrefixSum.running]] turns the distinct-value table into a CDF with
    * a parallel range sort + partition-offset pass (ties impossible:
    * values are distinct by construction); (3) one bounded fold picks all
    * requested ranks in a single pass. Rank arithmetic is `ceil(p · n)`
    * in double — exact for n < 2^53 and identical in any IEEE engine.
    *
    * Use [[grouped]] with `exact = false` for per-group production
    * percentiles (GK sketch); this is the exact-global tier for the
    * cases a sketch can't serve — threshold picking on a CDF that must
    * be reproducible bit-for-bit across engines and runs. */
  def exactGlobal(
      df: DataFrame,
      valueCol: String,
      ps: Seq[(String, Double)]
  ): DataFrame = {
    require(ps.nonEmpty, "Percentiles.exactGlobal: at least one percentile")
    ps.foreach { case (n, p) =>
      require(p > 0.0 && p <= 1.0, s"percentile $n=$p outside (0, 1]")
    }
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__cnt"))
    val cdf = PrefixSum.running(counts, Seq(col("__v").asc),
      Seq("__cnt" -> "__cum"))
    val total = counts.agg(sum(col("__cnt")).as("__n"))
    val picks: Seq[Column] = ps.map { case (name, p) =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), col("__v"))).as(name)
    }
    cdf.crossJoin(broadcast(total))
      .agg(max(col("__n")).as("n"), picks: _*)
  }

  /** Per-group exact discrete percentiles with the same no-value-buffer
    * shape as [[exactGlobal]]: counts per (group, value) — the only
    * input-width exchange — then a group-PARTITIONED cumulative window
    * over the distinct-value table and one rank-pick aggregate per group.
    *
    * The window partitions by group, so no task ever sees more than one
    * group's DISTINCT VALUES (not its rows — a billion-row group with
    * bounded value cardinality costs its cardinality, which is why this
    * beats the buffering `percentile` aggregate). For a group whose
    * distinct-value count itself explodes, fall back to [[grouped]] with
    * `exact = false` (GK sketch). */
  def exactGrouped(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[(String, Double)]
  ): DataFrame = {
    require(groupCols.nonEmpty, "Percentiles.exactGrouped: need group cols")
    require(ps.nonEmpty, "Percentiles.exactGrouped: at least one percentile")
    ps.foreach { case (n, p) =>
      require(p > 0.0 && p <= 1.0, s"percentile $n=$p outside (0, 1]")
    }
    val gs = groupCols.map(col)
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(gs :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val cdf = counts
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(tot))
    val picks: Seq[Column] = ps.map { case (name, p) =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), col("__v"))).as(name)
    }
    cdf.groupBy(gs: _*).agg(max(col("__n")).as("n"), picks: _*)
  }
}
