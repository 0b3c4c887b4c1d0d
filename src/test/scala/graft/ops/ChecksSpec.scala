package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dataset-level constraint suite: verdict semantics per check type,
  * exact truncating ppm arithmetic, null handling, empty input, and the
  * approx tier's pass/fail agreement on clean data. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), "x"), (2L, Some("b"), "x"), (3L, None, "y"),
    (4L, Some("d"), "z"), (4L, Some("e"), "x"))
    .toDF("k", "v", "cat")

  private def verdicts(checks: Seq[Checks.Check]) =
    Checks.run(fixture, checks).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(6))).toMap

  test("complete: truncating ppm against total rows, null-aware") {
    // 4 of 5 non-null -> 800000 ppm exactly
    val got = verdicts(Seq(
      Checks.Complete("v", 800000L), Checks.Complete("v", 800001L),
      Checks.Complete("k")))
    assert(got == Map(0L -> ((800000L, true)), 1L -> ((800000L, false)),
      2L -> ((1000000L, true))), got)
  }

  test("unique: duplicate count over non-null key rows") {
    val got = verdicts(Seq(
      Checks.Unique(Seq("k")),           // 4L twice -> 1 dup
      Checks.Unique(Seq("k", "v"))))     // (4,d) vs (4,e) distinct
    assert(got == Map(0L -> ((1L, false)), 1L -> ((0L, true))), got)
  }

  test("unique approx tier: null-key rows excluded from BOTH sides") {
    // the dup count is total(non-null keys) − distinct(non-null keys).
    // A struct with null fields is itself non-null, so the approx sketch
    // must null out null-key rows explicitly or dups could go NEGATIVE
    // (distinct > total) independent of HLL error. HLL++ is exact at
    // these cardinalities (sparse mode), so approx must equal exact here.
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("c")),
      (None, Some("c")), (Some(2L), None))
      .toDF("k", "v")
    for (cols <- Seq(Seq("k"), Seq("v"), Seq("k", "v"))) {
      val exact = Checks.run(df, Seq(Checks.Unique(cols)), exact = true)
        .first()
      val approx = Checks.run(df, Seq(Checks.Unique(cols)), exact = false)
        .first()
      assert(approx.getLong(3) >= 0L,
        s"$cols: approx dups must never go negative")
      assert(approx.getLong(3) == exact.getLong(3),
        s"$cols: approx=${approx.getLong(3)} exact=${exact.getLong(3)}")
    }
  }

  test("bounds, in_set, row_count verdicts") {
    val got = verdicts(Seq(
      Checks.Bounds("k", Some(1L), Some(4L)),
      Checks.Bounds("k", Some(2L), None),
      Checks.InSet("cat", Seq("x", "y"), 800000L),  // 4/5 = 800000
      Checks.InSet("cat", Seq("x"), 700000L),       // 3/5 = 600000
      Checks.RowCount(5L, 5L), Checks.RowCount(6L, 9L)))
    assert(got == Map(0L -> ((0L, true)), 1L -> ((1L, false)),
      2L -> ((800000L, true)), 3L -> ((600000L, false)),
      4L -> ((5L, true)), 5L -> ((5L, false))), got)
  }

  test("empty input: ratios vacuously pass, row-count floor fails") {
    val empty = fixture.where(lit(false))
    val got = Checks.run(empty, Seq(
      Checks.Complete("v"), Checks.RowCount(1L, 10L))).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(got == Map(0L -> true, 1L -> false), got)
  }

  test("accept is the conjunction; approx tier agrees on clean data") {
    assert(Checks.accept(fixture, Seq(Checks.Unique(Seq("k", "v")))))
    assert(!Checks.accept(fixture, Seq(Checks.Unique(Seq("k")))))
    // approx distinct tier: exact-agreeing verdict on this cardinality
    assert(Checks.accept(fixture, Seq(Checks.Unique(Seq("k", "v"))),
      exact = false))
  }
}
