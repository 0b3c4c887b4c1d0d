package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handling (enabled in GraftSession) covers joins; for
  * aggregations over heavily-skewed keys (a handful of event types across
  * 100 TB of events), salting splits each hot key across `buckets` reducers
  * in a first phase, then combines the per-salt partials — two small
  * shuffles instead of one shuffle with a straggler reducer.
  *
  * Only algebraic aggregates compose across phases; the helper takes the
  * per-phase expressions explicitly so the caller controls the algebra
  * (count→sum, sum→sum, min→min, max→max).
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable row content. */
  def salt(buckets: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong))

  /** Two-phase salted aggregation.
    *
    * @param partial  phase-1 aggregates over (keys, salt), e.g.
    *                 `count(lit(1)).as("n")`
    * @param combine  phase-2 aggregates over keys combining the partials,
    *                 e.g. `sum(col("n")).as("n")`
    * @param saltFrom columns providing entropy for the salt (must not be
    *                 the grouping keys themselves)
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      saltFrom: Seq[Column],
      partial: Seq[Column],
      combine: Seq[Column]
  ): DataFrame =
    df.withColumn("__salt", salt(buckets, saltFrom))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
}
