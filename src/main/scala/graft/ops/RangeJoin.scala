package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interval (range) join: pair every point row with every
  * interval row satisfying `lo <= point < hi` — the time-window join
  * (events in a session window, readings during an outage, clicks inside
  * an attribution window) that Spark can only plan as a broadcast
  * nested-loop or cartesian product when written as a raw `ON p >= lo AND
  * p < hi` condition. A nested loop is O(|points| × |intervals|)
  * comparisons — at 100 TB it never finishes, and it forces one side to
  * broadcast no matter how large.
  *
  * Spark-first formulation — turn the inequality into an EQUI join on a
  * derived bin key so Catalyst plans a plain shuffle join:
  *
  *   - points map to the single bin `floor(p / binWidth)`;
  *   - each interval explodes to the bins it overlaps
  *     (`floor(lo/binWidth) .. floor((hi-1)/binWidth)`, inclusive);
  *   - equi-join on the bin, then apply the exact residual predicate.
  *
  * Cost at scale: ONE hash shuffle of each side on the bin key (the same
  * price as any join), with the interval side replicated
  * `len/binWidth + 1`-fold — so pick `binWidth` near the typical interval
  * length to keep replication ≈ 2×. Every comparison after the shuffle is
  * bin-local; hot bins are ordinary join skew, which AQE's skew-join
  * splitting already handles (it's a standard SortMergeJoin). Bin
  * arithmetic is exact int64 (floor semantics via pmod, correct for
  * negative coordinates too — no double rounding at ns magnitudes).
  */
object RangeJoin {

  /** Inner-join `points` × `intervals` on `lo <= point < hi`.
    * `pointCol`/`loCol`/`hiCol` must be integral (cast timestamps to
    * epoch-long first); column sets must be disjoint. Empty or inverted
    * intervals (`hi <= lo`) match nothing; null coordinates never match
    * (SQL comparison semantics).
    *
    * Replication guard: an interval spanning more than
    * `maxBinsPerInterval` bins (default 65 536) fails the job fast with a
    * clear contract error instead of materializing an unbounded
    * `sequence()` — one outlier row with an open-ended sentinel hi (e.g.
    * `Long.MaxValue`) would otherwise try to enumerate ~2^63/binWidth
    * elements and OOM a single task. The check is evaluated inline on the
    * interval scan (no extra pre-pass over the data); hitting it means
    * either the data has sentinel/corrupt bounds to filter upstream, or
    * `binWidth` is far below the real interval lengths and should be
    * raised (replication ≈ len/binWidth + 1 per interval). */
  def binnedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      maxBinsPerInterval: Long = 65536L
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"point/interval column collision: $overlap")
    var bin = "__bin"
    while (points.columns.contains(bin) || intervals.columns.contains(bin))
      bin += "_"
    // bin key = the bin's START COORDINATE (not its index): floor-align via
    // pmod and enumerate with a stepped sequence — pure int64, no division,
    // exact at any magnitude, floor semantics for negatives too
    def binStart(c: org.apache.spark.sql.Column) =
      (c.cast("long") - pmod(c.cast("long"), lit(binWidth)))
    val p = points.withColumn(bin, binStart(col(pointCol)))
    // replication guard, evaluated inline before the sequence materializes:
    // double arithmetic so a sentinel span (hi=Long.MaxValue) cannot
    // overflow the check itself; the +1-bin slack of the double estimate
    // is irrelevant at guard granularity
    val spanBins =
      (col(hiCol).cast("double") - col(loCol).cast("double")) / lit(binWidth.toDouble)
    val i = intervals
      .where(col(hiCol) > col(loCol) && col(loCol).isNotNull)
      .withColumn(bin,
        explode(when(spanBins <= lit(maxBinsPerInterval.toDouble),
          sequence(
            binStart(col(loCol)), binStart(col(hiCol) - 1), lit(binWidth)))
          .otherwise(raise_error(concat(
            lit(s"graft.RangeJoin: interval spans more than $maxBinsPerInterval " +
              s"bins at binWidth=$binWidth — filter sentinel bounds upstream or " +
              "raise binWidth/maxBinsPerInterval: ["),
            col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"), lit(")"))))))
    p.join(i, bin)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bin)
  }
}
