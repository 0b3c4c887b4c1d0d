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
}
