package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: matches the naive inequality join exactly (boundary
  * inclusivity, multi-bin intervals, nulls, inverted intervals) while
  * planning as an equi shuffle join — never a nested loop. */
class RangeJoinSpec extends SparkSpec {

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))

  test("matches the naive inequality join on adversarial boundaries") {
    import spark.implicits._
    // points on every boundary of width-10 bins; intervals spanning
    // 0, 1, and many bins, incl. exact-bin-edge lo/hi
    val points = (0L to 100L).map(i => (i, i)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 0L, 10L), // exactly one bin
      (2L, 5L, 6L), // single point
      (3L, 9L, 11L), // straddles a bin edge
      (4L, 10L, 10L), // empty (hi == lo) → matches nothing
      (5L, 30L, 20L), // inverted → matches nothing
      (6L, 0L, 95L), // spans ten bins
      (7L, 88L, 200L) // extends past all points
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.binnedRangeJoin(points, intervals, "p", "lo", "hi", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = naive(points, intervals)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.contains((9L, 3L)) && want.contains((10L, 3L)) &&
      !want.exists(_._2 == 4L) && !want.exists(_._2 == 5L))
    // lo inclusive, hi exclusive
    assert(got.contains((0L, 1L)) && !got.contains((10L, 1L)))
  }

  test("null coordinates never match; negative coordinates bin correctly") {
    import spark.implicits._
    val points = Seq(
      (1L, Some(-25L)), (2L, Some(-20L)), (3L, Some(0L)), (4L, None)
    ).toDF("pid", "p")
    val intervals = Seq(
      (1L, Some(-30L), Some(-10L)), // negative range: floor-aligned bins
      (2L, None, Some(50L)), // null lo → matches nothing
      (3L, Some(-5L), Some(5L))
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.binnedRangeJoin(points, intervals, "p", "lo", "hi", 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  test("plans as an equi join — no nested loop, no cartesian product") {
    import spark.implicits._
    val points = spark.range(0, 10000).select(col("id").as("pid"),
      (col("id") * 13 % 100000).as("p"))
    val intervals = spark.range(0, 2000).select(col("id").as("iid"),
      (col("id") * 50).as("lo"), (col("id") * 50 + 75).as("hi"))
    val joined = RangeJoin.binnedRangeJoin(points, intervals, "p", "lo", "hi", 64L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must plan as an equi join:\n$plan")
    // and it still agrees with the naive join at this size
    assert(joined.count() ==
      naive(points, intervals).count())
  }

  test("sentinel interval fails fast with a contract error, not an OOM") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "p")
    // an open-ended sentinel hi: without the guard, sequence() would try
    // to enumerate ~2^63/binWidth bin starts in one task
    val intervals = Seq(
      (1L, 0L, 10L),
      (2L, 0L, Long.MaxValue)
    ).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.binnedRangeJoin(points, intervals, "p", "lo", "hi", 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("graft.RangeJoin")),
      s"expected the replication-guard contract error, got: $e")
    // a raised ceiling admits wide-but-bounded intervals
    val wide = Seq((3L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val n = RangeJoin.binnedRangeJoin(points, wide, "p", "lo", "hi", 10L,
      maxBinsPerInterval = 200000L).count()
    assert(n == 1L)
  }

  test("rejects colliding column names and non-positive widths") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "p")
    val iv = Seq((1L, 0L, 5L)).toDF("a", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(df, iv, "p", "lo", "hi", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(df, iv.toDF("b", "lo", "hi"), "p", "lo", "hi", 0L)
    }
  }
}
