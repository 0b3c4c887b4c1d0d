package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sessionization gap semantics, resample grid/fill invariants, and the
  * outlier-span guard. */
class TimeSeriesSpec extends SparkSpec {

  test("sessionize: strict gap starts a session; ties share a session") {
    import spark.implicits._
    val e = Seq(
      (1L, 10L, 0L), (2L, 10L, 100L), // same session
      (3L, 10L, 100L), // tie with event 2 — same session either order
      (4L, 10L, 201L), // gap 101 > 100 → new session
      (5L, 10L, 301L), // gap exactly 100 → SAME session (strict >)
      (6L, 20L, 0L), // another key: independent numbering
      (7L, 20L, 1000L)
    ).toDF("event_id", "user_id", "t")
    val got = TimeSeries.sessionize(e, "user_id", "t", gap = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 1L, 7L -> 2L), s"got $got")
  }

  test("resampleFill: complete grid, bucket-latest value, forward fill") {
    import spark.implicits._
    val e = Seq(
      (10L, 105L, 1.0), // bucket 100
      (10L, 108L, 2.0), // later in bucket 100 → bucket value 2.0
      (10L, 430L, 9.0), // bucket 400; 200/300 empty → filled with 2.0
      (20L, 15L, 5.0) // single-observation key → one-bucket grid
    ).toDF("user_id", "t", "v")
    val got = TimeSeries.resampleFill(e, "user_id", "t", "v", step = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map(
      (10L, 100L) -> 2.0, (10L, 200L) -> 2.0, (10L, 300L) -> 2.0,
      (10L, 400L) -> 9.0, (20L, 0L) -> 5.0), s"got $got")
  }

  test("resampleFill: null-valued observations are gaps, not values") {
    import spark.implicits._
    val e = Seq(
      (1L, 105L, Some(1.0)),
      (1L, 210L, None), // null obs is the bucket's latest → fill carries 1.0
      (1L, 305L, None), (1L, 308L, Some(3.0)), // non-null wins the bucket
      (1L, 430L, None) // trailing null bucket → still 3.0
    ).toDF("user_id", "t", "v")
    val got = TimeSeries.resampleFill(e, "user_id", "t", "v", step = 100L)
      .collect().map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got == Map(100L -> Some(1.0), 200L -> Some(1.0),
      300L -> Some(3.0), 400L -> Some(3.0)), s"got $got")
  }

  test("resampleFill: an outlier span fails fast with the contract error") {
    import spark.implicits._
    val e = Seq((1L, 0L, 1.0), (1L, Long.MaxValue / 2, 2.0)).toDF("user_id", "t", "v")
    val ex = intercept[Exception] {
      TimeSeries.resampleFill(e, "user_id", "t", "v", step = 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("graft.TimeSeries")),
      s"expected the span-guard contract error, got: $ex")
  }
}
