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

  test("funnel: ordered stages, strict-time advance, stage-0 rows") {
    import spark.implicits._
    val e = Seq(
      // user 1: full funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      // user 2: click before view doesn't count; no click after -> stage 1
      (2L, 5L, "click"), (2L, 10L, "view"),
      // user 3: simultaneous view+click -> click must NOT advance
      (3L, 10L, "view"), (3L, 10L, "click"), (3L, 40L, "buy"),
      // user 4: relevant events but never step 1 -> stage 0, null t_last
      (4L, 10L, "click"), (4L, 20L, "buy"),
      // user 5: only irrelevant events -> no row
      (5L, 10L, "other"))
      .toDF("u", "t", "e")
    val got = TimeSeries.funnel(e, "u", "t", "e", Seq("view", "click", "buy"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((3L, 30L)), 2L -> ((1L, 10L)), 3L -> ((1L, 10L)),
      4L -> ((0L, -1L))), got)
  }

  test("funnel fold == independent min-chain reference on random streams") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    def ref(evs: Seq[(Long, String)]): (Long, Option[Long]) = {
      var stage = 0
      var t = Long.MinValue
      var done = false
      while (!done && stage < steps.size) {
        val nxt = evs.filter(x => x._2 == steps(stage) && x._1 > t)
        if (nxt.isEmpty) done = true
        else { t = nxt.map(_._1).min; stage += 1 }
      }
      (stage.toLong, if (stage > 0) Some(t) else None)
    }
    val rnd = new scala.util.Random(23)
    val types = Vector("a", "b", "c", "x")
    val rows = for {
      u <- 0 until 60
      _ <- 0 until (1 + rnd.nextInt(10))
    } yield (u.toLong, rnd.nextInt(8).toLong, types(rnd.nextInt(types.size)))
    val got = TimeSeries.funnel(rows.toDF("u", "t", "e"), "u", "t", "e", steps)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    rows.groupBy(_._1).foreach { case (u, evs) =>
      val rel = evs.filter(x => steps.contains(x._3)).map(x => (x._2, x._3))
      if (rel.nonEmpty)
        assert(got(u) == ref(rel), s"user $u: events $rel")
      else assert(!got.contains(u), s"user $u must emit no row")
    }
  }

  test("rollingAnomalies: spike flags at 3σ, flat series never flags") {
    import spark.implicits._
    // 20 steady observations then a spike; window 10, t = 3
    val vals = Seq.fill(20)(100L) :+ 500L
    val e = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "t", "v")
    val got = TimeSeries.rollingAnomalies(e, "k", Seq(col("t")), "v",
        window = 10, tNum = 3)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(got(20L), "the spike must flag")
    assert((0L until 20L).forall(!got(_)), "a flat series never flags")
  }

  test("rollingAnomalies == double-precision reference on random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = for (k <- 0 until 5; i <- 0 until 80)
      yield (k.toString, i.toLong, rnd.nextInt(1000).toLong)
    val W = 12
    val got = TimeSeries.rollingAnomalies(rows.toDF("k", "t", "v"), "k",
        Seq(col("t")), "v", window = W, tNum = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    rows.groupBy(_._1).foreach { case (k, es) =>
      val sorted = es.sortBy(_._2)
      sorted.indices.foreach { i =>
        val win = sorted.slice(math.max(0, i - W), i).map(_._3)
        val n = win.size
        val v = sorted(i)._3
        val s = win.sum
        val q = win.map(x => x * x).sum
        // exact integer discriminant, same algebra as the operator
        val dev = BigInt(n) * v - s
        val want = n >= 2 &&
          dev * dev > BigInt(9) * (BigInt(n) * q - BigInt(s) * s)
        val (gn, gf) = got((k, sorted(i)._2))
        assert(gn == n && gf == want, s"key $k row $i")
      }
    }
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
