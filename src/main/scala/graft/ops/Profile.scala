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

  /** Join/groupBy-key skew audit: the one-row report that decides whether a
    * planned shuffle on `keyCol` needs salting or AQE skew handling BEFORE
    * the expensive job runs. Emits the key-frequency shape in exact
    * integer arithmetic (truncating `div`, engine-portable):
    *
    *   - `n_rows`, `n_keys` — population and key cardinality;
    *   - `max_n` — the heaviest key's row count (the straggler task size
    *     a hash-partitioned shuffle on this key would produce);
    *   - `top_share_ppm` — `max_n / n_rows`, the fraction of all rows one
    *     reducer would absorb;
    *   - `skew_x_ppm` — `max_n / (n_rows / n_keys)` in ppm: how many times
    *     the mean key weight the heaviest key is (1e6 = perfectly even).
    *     Rule of thumb: ≥ ~20e6 on a join key ⇒ salt it (the
    *     [[graft.ops.FuzzyJoin]] / salted-agg discipline).
    *
    * Null keys are excluded (they broadcast to no join partner; count them
    * via [[profile]]'s n_null). Two exchanges, both bounded: the per-key
    * partial-agg count, then the one-row fold of the per-key counts —
    * nothing driver-side, no window, safe at any key universe. */
  def skewAudit(df: DataFrame, keyCol: String): DataFrame =
    df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"))
      .select(col("n_rows"), col("n_keys"), col("max_n"),
        expr("(max_n * 1000000) div n_rows").as("top_share_ppm"),
        expr("(max_n * n_keys * 1000000) div n_rows").as("skew_x_ppm"))

  /** Per-source DATA CARD — the datasheet row every corpus release ships
    * (Gebru et al., "Datasheets for Datasets"): document/char/token mass,
    * language spread, and the exact-duplicate surplus (docs beyond one
    * canonical per identical text, WITHIN the source), all exact int64.
    * The token column is the whitespace count ([[graft.ext.TextStats
    * .wsTokens]]) — the cheap proxy; swap in BPE mass via
    * [[graft.ext.Bpe.tokenize]] when the card feeds a token budget.
    *
    * Scale shape: one corpus pass for the additive stats + one
    * (source, text-fingerprint) partial-agg pass for the dup surplus —
    * both map-side combined, the join is sources-sized. */
  def dataCard(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String
  ): DataFrame = {
    val base = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol)).cast("long")).as("n_chars"),
      sum(size(graft.ext.TextStats.wsTokens(col(textCol))).cast("long"))
        .as("n_ws_tokens"),
      countDistinct(col(langCol)).as("n_langs"))
    val dups = df
      .groupBy(col(sourceCol), md5(col(textCol)).as("__fp"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(sourceCol))
      .agg(sum(col("__n") - 1).as("n_dup_docs"))
    base.join(dups, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"), col("n_chars"),
        col("n_ws_tokens"), col("n_langs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
  }
}
