package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over integral (epoch) time columns: batch
  * sessionization by inactivity gap and fixed-step resampling with
  * forward fill. Both are one-keyed-shuffle plans — hash-partition by the
  * entity key, sort within partitions, then O(n) running windows — the
  * same cost shape as any keyed join at 100 TB; no per-key collect, no
  * global sort, no cross-row UDFs. */
object TimeSeries {

  /** Batch sessionization: number each key's events with a session
    * sequence that increments whenever the gap since the previous event
    * exceeds `gap` (same units as `timeCol`). The pair (key,
    * `session_seq`) is the session id; downstream aggs group by it.
    *
    * Matches the streaming session-window semantics
    * ([[graft.streaming.StreamingIngest]]) on in-order data: an event at
    * exactly `gap` after its predecessor stays in the session (strict
    * `>` starts a new one). Null times sort first (Spark default) and
    * start their own session run. */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      gap: Long
  ): DataFrame = {
    require(gap > 0, "gap must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val prev = lag(col(timeCol), 1).over(w)
    df.withColumn("session_seq",
      sum(when(prev.isNull || col(timeCol) - prev > gap, 1L).otherwise(0L))
        .over(run))
  }

  /** Fixed-step resample with forward fill: one row per (key, bucket) on
    * each key's complete `step`-aligned grid between its first and last
    * observation; buckets with observations carry the LATEST value in the
    * bucket (ties on time break by greatest value — deterministic), empty
    * buckets carry the previous bucket's value (nulls until the first
    * observation never occur, since the grid starts at it). A NULL-valued
    * observation counts as missing: at equal times it loses to any
    * non-null value (struct ordering ranks nulls first), and when it IS
    * the bucket's latest the forward fill skips it (ignoreNulls) and
    * carries the prior value — the usual convention for sensor gaps
    * reported as explicit nulls.
    *
    * Scale shape: the grid generates per key from a (min, max) aggregate
    * — never a global calendar join; the per-bucket latest observation is
    * a partial-agg groupBy; the fill is one O(n) running `last(ignore
    * nulls)` window per key. An outlier key spanning more than
    * `maxBucketsPerKey` grid cells fails fast with a contract error
    * (same guard discipline as [[RangeJoin]]) instead of exploding an
    * unbounded `sequence()`. */
  def resampleFill(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      step: Long,
      maxBucketsPerKey: Long = 1000000L
  ): DataFrame = {
    require(step > 0, "step must be positive")
    require(maxBucketsPerKey > 0, "maxBucketsPerKey must be positive")
    def bucketOf(c: Column) = (c - pmod(c, lit(step)))
    val obs = df
      .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .groupBy(col(keyCol), bucketOf(col(timeCol)).as("bucket"))
      .agg(max(struct(col(timeCol).as("t"), col(valueCol).as("v"))).as("last_obs"))
      .select(col(keyCol), col("bucket"), col("last_obs.v").as("obs_value"))
    val spanBuckets = (col("__mx").cast("double") - col("__mn").cast("double")) /
      lit(step.toDouble)
    val grid = df
      .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(col(timeCol)).as("__mn"), max(col(timeCol)).as("__mx"))
      .select(col(keyCol),
        explode(when(spanBuckets <= lit(maxBucketsPerKey.toDouble),
          sequence(bucketOf(col("__mn")), bucketOf(col("__mx")), lit(step)))
          .otherwise(raise_error(concat(
            lit(s"graft.TimeSeries: key spans more than $maxBucketsPerKey " +
              s"buckets at step=$step — raise step/maxBucketsPerKey or filter " +
              "outlier keys: "),
            col(keyCol).cast("string"))))).as("bucket"))
    val fill = Window.partitionBy(keyCol).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .withColumn("value", last(col("obs_value"), ignoreNulls = true).over(fill))
      .drop("obs_value")
  }

  /** Rolling z-score anomaly flags over an INTEGRAL value column — the
    * metric-monitoring primitive (error-rate spikes, volume collapses)
    * with a twist that makes it oracle-exact: the flag is decided by an
    * integer discriminant, never a floating z. Each value compares to
    * the `window` PRECEDING observations (current row EXCLUDED — an
    * inclusive window bounds z² by n−1, so a 10-window spike could
    * never exceed 3σ by construction). With S = Σv, Q = Σv² over that
    * trailing window, (v−μ)²/σ² = (n·v−S)²/(n·Q−S²) algebraically, so
    *
    *   |z| > t  ⇔  (n·v − S)²·tDen² > tNum²·(n·Q − S²)
    *
    * — pure decimal(38,0) arithmetic on both engines, no mean, no
    * sqrt, no float accumulation order. A zero-variance window flags
    * any departing value (conceptually infinite z) and never flags a
    * matching one; rows with fewer than 2 predecessors never flag.
    * Scale doubles to integers upstream (e.g. cents via round(v·100)).
    *
    * One keyed window (hash-partition by key, sort within — the
    * [[sessionize]] cost shape). `order` must totalize ties or rolling
    * sums differ between engines. Output: input + (n, flag), n = the
    * preceding-window size actually seen. */
  def rollingAnomalies(
      df: DataFrame,
      keyCol: String,
      order: Seq[Column],
      valueCol: String,
      window: Int,
      tNum: Long,
      tDen: Long = 1L
  ): DataFrame = {
    require(window > 1, "window must hold at least two predecessors")
    require(tNum > 0 && tDen > 0, "threshold must be positive")
    // preceding-window sums as prefix-sum differences:
    // Σ[i−W, i−1] = cum[i−1] − cum[i−W−1]. The growing (unbounded →
    // current) frame and lag/row_number are all O(1) per row in
    // WindowExec; the naive rowsBetween(−W, −1) frame re-scans W rows
    // of decimal per row per aggregate (benched 6.7 s → 1 s class at
    // sf0.1). One sort serves every function.
    val ws = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val run = ws.rowsBetween(Window.unboundedPreceding, 0)
    val v = col(valueCol).cast("decimal(38,0)")
    val zero = lit(0).cast("decimal(38,0)")
    def winSum(cum: Column): Column =
      coalesce(lag(cum, 1).over(ws), zero) -
        coalesce(lag(cum, window + 1).over(ws), zero)
    val dS = winSum(sum(v).over(run))
    val dQ = winSum(sum(v * v).over(run))
    val n = least(row_number().over(ws) - 1, lit(window)).cast("long")
    val dn = n.cast("decimal(38,0)")
    val dev = dn * v - dS
    df
      .withColumn("n", n)
      .withColumn("flag", n >= 2 &&
        dev * dev * lit(tDen * tDen) > lit(tNum * tNum) * (dn * dQ - dS * dS))
  }

  /** Ordered funnel analysis: per key, how far through the `steps`
    * sequence did the events progress? Stage k+1 counts only when an
    * event of that type occurs STRICTLY after the event that completed
    * stage k (simultaneous timestamps do not advance — the semantics of
    * the classic min-chain SQL funnel, to which this fold is provably
    * equivalent: over time-sorted events, the first next-step event with
    * ts > t_k IS min(ts | type = step_{k+1}, ts > t_k)).
    *
    * One keyed shuffle: irrelevant event types are filtered BEFORE the
    * aggregate, each key folds its own time-sorted event list (per-key
    * memory = that key's relevant-event count — cap upstream for
    * pathological keys, same caveat as [[sessionize]]), and the fold is
    * a single linear pass. No window, no self-join, no per-stage pass —
    * a k-stage funnel over 100 TB of events costs one partial-agg
    * shuffle of the filtered stream, not k of them.
    *
    * Output: (keyCol, stage, t_last) — stages completed (0..k) and the
    * completion time of the last completed stage (null at stage 0).
    * Keys with no relevant events yield no row. */
  def funnel(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      typeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val stepArr = typedLit(steps)
    val n = steps.size
    val folded = aggregate(
      sort_array(col("evs")),
      struct(lit(0L).as("stage"), lit(Long.MinValue).as("t")),
      (acc, e) => {
        val stage = acc.getField("stage")
        val adv = stage < n &&
          e.getField("e") === element_at(stepArr, (stage + 1).cast("int")) &&
          e.getField("t") > acc.getField("t")
        struct(when(adv, stage + 1).otherwise(stage).as("stage"),
          when(adv, e.getField("t")).otherwise(acc.getField("t")).as("t"))
      })
    events
      .where(col(typeCol).isin(steps: _*))
      .groupBy(col(keyCol))
      .agg(collect_list(struct(col(timeCol).as("t"), col(typeCol).as("e")))
        .as("evs"))
      .select(col(keyCol), folded.getField("stage").as("stage"),
        when(folded.getField("stage") > 0, folded.getField("t"))
          .as("t_last"))
  }
}
