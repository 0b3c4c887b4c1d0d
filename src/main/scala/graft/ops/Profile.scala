package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data profiling — the schema-quality report an ingest pipeline
  * runs before accepting a batch (the reference's validation pass reports
  * row/error counts; this is its column-level generalization: null counts,
  * cardinality, and value bounds per column).
  *
  * One job over the data: all per-column aggregates go into a single `agg`,
  * so the input is read once and partial aggregation happens map-side. The
  * wide one-row result is then unpivoted driver-free via explode of a
  * struct array (constant-size — #columns entries).
  *
  * Scale note: `exact = true` uses COUNT(DISTINCT), which Catalyst plans as
  * one Expand ×(distinct aggregates) over the input — exact but the scan
  * multiplies. At 100 TB run `exact = false` (HyperLogLog++
  * `approx_count_distinct`, one pass, mergeable sketches); the gate query
  * uses the exact tier because the oracle must match bit-for-bit.
  */
object Profile {

  /** Profile `cols` of `df`: (col_name, n, n_null, n_distinct, min_s, max_s),
    * one output row per column, min/max rendered as strings. Callers pick
    * columns whose string rendering is engine-portable (ints/strings). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
