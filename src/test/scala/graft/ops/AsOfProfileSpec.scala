package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics (inclusive match, per-key isolation, no-match null)
  * and per-column profiling (null/distinct/bounds, exact vs approx tier). */
class AsOfProfileSpec extends SparkSpec {

  test("asOfTime: latest right <= left time, per key, inclusive ties") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // user 10: click at 100 exactly → inclusive match
      (2L, 10L, 250L), // user 10: latest of {100, 200}
      (3L, 20L, 50L), // user 20: no click yet → null
      (4L, 30L, 99L) // user 30 has no clicks at all → null
    ).toDF("event_id", "user_id", "us")
    val right = Seq((10L, 100L), (10L, 200L), (20L, 60L))
      .toDF("user_id", "us")
    val got = AsOfJoin.asOfTime(left, right, "user_id", "us", "click_us")
      .orderBy("event_id")
      .select("event_id", "click_us")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq == Seq(
      1L -> Some(100L), 2L -> Some(200L), 3L -> None, 4L -> None))
  }

  test("asOfDirectional: all directions/tolerances equal brute force, both exec paths") {
    import spark.implicits._
    // randomized-ish but fixed fixture: keys with interleaved, tied, and
    // missing times on either side
    val left = (for (i <- 0 until 40) yield
      (i.toLong, (i % 5).toLong, (i * 37 % 100).toLong)).toDF("event_id", "user_id", "us")
    val right = (for (i <- 0 until 60) yield
      ((i % 6).toLong, (i * 23 % 100).toLong)).toDF("user_id", "us")
    val l = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r = right.collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    def brute(dir: String, tol: Option[Long]): Map[Long, Option[Long]] =
      l.map { case (id, k, t) =>
        val cands = r.filter(_._1 == k).map(_._2)
        val bwd = cands.filter(_ <= t).sorted.lastOption
          .filter(m => tol.forall(tv => t - m <= tv))
        val fwd = cands.filter(_ >= t).sorted.headOption
          .filter(m => tol.forall(tv => m - t <= tv))
        id -> (dir match {
          case "backward" => bwd
          case "forward"  => fwd
          case "nearest" => (bwd, fwd) match {
            case (Some(b), Some(f)) => Some(if (f - t < t - b) f else b)
            case (b, f)             => b.orElse(f)
          }
        })
      }.toMap
    for {
      merged <- Seq(false, true)
      (dir, dirName) <- Seq(AsOfJoin.Backward -> "backward",
        AsOfJoin.Forward -> "forward", AsOfJoin.Nearest -> "nearest")
      tol <- Seq(None, Some(7L))
    } {
      val got = AsOfJoin.asOfDirectional(left, right, "user_id", "us",
        dir, tol, "m", merged = merged)
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(x.fieldIndex("m"))) None
           else Some(x.getLong(x.fieldIndex("m"))))).toMap
      assert(got == brute(dirName, tol),
        s"direction=$dirName tol=$tol merged=$merged diverged from brute force")
    }
  }

  test("asOfTime preserves every left column and row count") {
    import spark.implicits._
    val left = Seq((1L, 5L, 10L, "x"), (2L, 5L, 20L, "y"))
      .toDF("event_id", "user_id", "us", "payload")
    val right = Seq((5L, 15L)).toDF("user_id", "us")
    val out = AsOfJoin.asOfTime(left, right, "user_id", "us")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "us", "payload", "asof_time"))
    assert(out.count() == 2)
  }

  test("asOfTime: null keys/times never match (SQL join semantics)") {
    import spark.implicits._
    val left = Seq(
      (1L, None, Some(100L)), // null-key left row: survives, matches nothing
      (2L, Some(10L), None), // null-time left row: survives, matches nothing
      (3L, Some(10L), Some(100L)) // sanity: real match still works
    ).toDF("event_id", "user_id", "us")
    val right = Seq(
      (None, Some(50L)), // null-key right row: must not match the null-key left
      (Some(10L), None), // null-time right row: must never be "earliest"
      (Some(10L), Some(90L))
    ).toDF("user_id", "us")
    val got = AsOfJoin.asOfTime(left, right, "user_id", "us", "click_us")
      .orderBy("event_id")
      .select("event_id", "click_us")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq == Seq(1L -> None, 2L -> None, 3L -> Some(90L)))
  }

  test("asOfTime: internal names survive a keyCol that collides") {
    import spark.implicits._
    // keyCol literally named like an internal working column
    val left = Seq((1L, 7L, 100L, "keep"))
      .toDF("event_id", "__asof_t", "us", "payload")
    val right = Seq((7L, 90L)).toDF("__asof_t", "us")
    val out = AsOfJoin.asOfTime(left, right, "__asof_t", "us", "m")
    val row = out.collect().head
    assert(out.columns.toSeq == Seq("event_id", "__asof_t", "us", "payload", "m"))
    assert(row.getLong(1) == 7L && row.getString(3) == "keep" && row.getLong(4) == 90L)
  }

  test("profile: nulls, distincts, and string-rendered bounds per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("b")), (Some(2L), Some("a")))
      .toDF("k", "s")
    val rows = Profile.profile(df, Seq("k", "s")).orderBy("col_name").collect()
    val k = rows(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 4 && k.getLong(2) == 1 &&
      k.getLong(3) == 2 && k.getString(4) == "1" && k.getString(5) == "2")
    val s = rows(1)
    assert(s.getString(0) == "s" && s.getLong(2) == 1 && s.getLong(3) == 2 &&
      s.getString(4) == "a" && s.getString(5) == "b")
  }

  test("skewAudit: exact integer shape of a skewed key distribution") {
    import spark.implicits._
    // key 7 carries 6 of 10 rows; 4 singleton keys; one null key (excluded)
    val df = (Seq.fill(6)(Some(7L)) ++ Seq(Some(1L), Some(2L), Some(3L),
      Some(4L), None)).toDF("k")
    val r = Profile.skewAudit(df, "k").collect().head
    assert(r.getLong(0) == 10 && r.getLong(1) == 5 && r.getLong(2) == 6)
    // top share = 6e6/10 ppm; skew = 6 / (10/5 mean) = 3e6 ppm
    assert(r.getLong(3) == 600000 && r.getLong(4) == 3000000)
  }

  test("profile approx tier stays within HLL error and avoids Expand blowup") {
    val df = spark.range(10000).select(
      (col("id") % 1000).as("m"), col("id").as("u"))
    val approx = Profile.profile(df, Seq("m", "u"), exact = false).collect()
    val byName = approx.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(byName("m") - 1000L) < 100, s"m: ${byName("m")}")
    assert(math.abs(byName("u") - 10000L) < 1000, s"u: ${byName("u")}")
    val plan = Profile.profile(df, Seq("m", "u"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx tier must be a single pass, no Expand")
  }
}
