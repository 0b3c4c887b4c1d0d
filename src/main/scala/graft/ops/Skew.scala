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

  /** Salted equi-join for skewed join keys — the explicit-plan fallback
    * when AQE's runtime skew split cannot apply (first execution of a
    * stage whose hot key is born skewed, a build side too large to
    * broadcast, or a fixed-topology streaming plan). The fact side salts
    * each row into one of `buckets` sub-keys; the `dim` side replicates
    * every row across ALL buckets (explode of a `sequence` literal — a
    * buckets× inflation, so keep dim ≪ fact); the join runs on
    * (key, salt), splitting every hot key's rows over `buckets` reducers
    * instead of one straggler. Result is EXACTLY the plain inner join
    * (each fact row meets its dim match in precisely its own salt bucket),
    * in any row order.
    *
    * `saltFrom` provides the fact-side entropy (any stable non-key
    * columns; uniformity helps balance but ANY distribution is correct).
    * Output columns: fact.* then dim.* minus its join key. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int,
      saltFrom: Seq[Column]
  ): DataFrame = {
    require(buckets >= 1, s"saltedJoin: buckets $buckets < 1")
    val saltedFact = fact.withColumn("__salt", salt(buckets, saltFrom))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-split join for LARGE dims, where [[saltedJoin]]'s whole-dim
    * replication would dominate: rows whose key is in `hotKeys` (a
    * handful — feed it from the skew audit's heavy-hitter report) take
    * the salted path against ONLY the hot slice of the dim (hot-slice
    * replication cost: |hotKeys| · buckets rows, trivial); every other
    * row takes the plain equi-join, whose per-key volume is bounded by
    * NOT being hot. Union of the two legs == the plain inner join
    * exactly, because the key predicate partitions the fact (null keys
    * drop from both legs, as inner-join semantics already demand). */
  def skewSplitJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      hotKeys: Seq[Any],
      buckets: Int,
      saltFrom: Seq[Column]
  ): DataFrame = {
    require(hotKeys.nonEmpty, "skewSplitJoin: empty hotKeys — use a plain join")
    val isHot = col(key).isin(hotKeys: _*)
    val hotLeg = saltedJoin(fact.where(isHot), dim.where(isHot),
      key, buckets, saltFrom)
    val coldLeg = fact.where(!isHot).join(dim.where(!isHot), key)
    hotLeg.unionByName(coldLeg)
  }
}
