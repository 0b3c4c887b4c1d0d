package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Exact ROC-AUC: hand-checked boundary cases and a brute-force
  * pair-counting reference on random scored sets. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Option[Long]) = {
    val r = Eval.rocAuc(rows.toDF("s", "y"), "s", col("y")).first()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("perfect separation 1e6, reversal 0, all-ties 0.5, degenerate null") {
    assert(auc(Seq((10L, 1L), (20L, 1L), (1L, 0L), (2L, 0L)))._4
      == Some(1000000L))
    assert(auc(Seq((1L, 1L), (2L, 1L), (10L, 0L), (20L, 0L)))._4 == Some(0L))
    assert(auc(Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L)))._4 == Some(500000L))
    assert(auc(Seq((1L, 1L), (2L, 1L)))._4 == None, "no negatives -> null")
  }

  test("by-group AUC equals per-slice global computation") {
    val rnd = new Random(29)
    val rows = (0 until 300).map(_ => (s"g${rnd.nextInt(4)}",
      rnd.nextInt(15).toLong, rnd.nextInt(2).toLong))
    val grouped = Eval.rocAucByGroup(rows.toDF("g", "s", "y"), "g", "s",
        col("y")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    rows.groupBy(_._1).foreach { case (g, es) =>
      val alone = Eval.rocAuc(
        es.map(e => (e._2, e._3)).toDF("s", "y"), "s", col("y")).first()
      val want = if (alone.isNullAt(3)) None else Some(alone.getLong(3))
      assert(grouped(g) == want, s"group $g")
    }
  }

  test("pr curve: hand-checked operating points, brute-force on random sets") {
    // scores desc: 10(pos), 5(neg), 5(pos), 1(neg) -> thresholds 10,5,1
    val rows = Seq((10L, 1L), (5L, 0L), (5L, 1L), (1L, 0L))
    val got = Eval.prCurve(rows.toDF("s", "y"), "s", col("y"))
      .orderBy(col("s").desc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (10L, 1L, 0L, 1L, 1000000L, 500000L),
      (5L, 2L, 1L, 0L, 666666L, 1000000L),
      (1L, 2L, 2L, 0L, 500000L, 1000000L)), got.toSeq)
    // brute-force on random data
    val rnd = new Random(37)
    val rand = (0 until 150).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(2).toLong))
    val np = rand.count(_._2 == 1L).toLong
    val curve = Eval.prCurve(rand.toDF("s", "y"), "s", col("y")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rand.map(_._1).distinct.foreach { s =>
      val tp = rand.count(r => r._1 >= s && r._2 == 1L).toLong
      val fp = rand.count(r => r._1 >= s && r._2 == 0L).toLong
      assert(curve(s) == ((tp, fp)), s"threshold $s")
    }
    assert(curve.size == rand.map(_._1).distinct.size)
    assert(np > 0)
  }

  test("matches brute-force tie-aware pair counting on random sets") {
    val rnd = new Random(17)
    for (round <- 1 to 5) {
      val rows = (0 until 200).map(_ =>
        (rnd.nextInt(20).toLong, rnd.nextInt(2).toLong))
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val u2ref = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      val (u2, np, nn, ppm) = auc(rows)
      assert(u2 == u2ref && np == pos.size && nn == neg.size, s"round $round")
      assert(ppm == Some(u2ref * 1000000L / (2L * pos.size * neg.size)),
        s"round $round")
    }
  }

  test("calibration error: perfect 0, inverted 1e6, hand-checked mixed") {
    val Four = 4000000000L
    def ece(rows: Seq[(Long, Long, Long)]): (Long, Long, Long) = {
      // (bin, p4, y)
      val r = Eval.calibrationError(rows.toDF("bin", "p4", "y"),
        col("bin"), col("p4"), col("y")).first()
      (r.getLong(0), r.getLong(1), r.getLong(3))
    }
    // perfectly calibrated: predicted mass == actual mass in every bin
    assert(ece(Seq((0L, Four, 1L), (0L, 0L, 0L), (1L, Four / 2, 1L),
      (1L, Four / 2, 0L))) == ((4L, 2L, 0L)))
    // inverted: every prediction carries the full opposite mass (in
    // SEPARATE bins — within one bin opposite errors cancel, the
    // standard ECE blind spot)
    assert(ece(Seq((0L, 0L, 1L), (1L, Four, 0L))) == ((2L, 2L, 1000000L)))
    // mixed, hand-checked: bin0 gap |3e9 - 4e9| = 1e9; bin1 gap
    // |1e9 - 0| = 1e9; ece = 2e9*1e6 div (3*4e9) = 166666
    assert(ece(Seq((0L, 3000000000L, 1L), (1L, 500000000L, 0L),
      (1L, 500000000L, 0L))) == ((3L, 2L, 166666L)))
    // brute-force reference on random sets: normalized Σ n_b/N·|conf−acc|
    val rnd = new Random(7)
    for (round <- 1 to 5) {
      val rows = Seq.fill(200)((rnd.nextInt(4).toLong,
        (rnd.nextDouble() * Four).toLong, rnd.nextInt(2).toLong))
      val byBin = rows.groupBy(_._1).values
      val gapSum = byBin.map(b =>
        math.abs(b.map(_._2).sum - b.map(_._3).sum * Four)).sum
      val expect = gapSum * 1000000L / (rows.size * Four)
      assert(ece(rows)._3 == expect, s"round $round")
    }
  }

  test("pairPrf: hand-checked P/R, dedup of fanned-out inputs, empty sides") {
    def prf(pred: Seq[(Long, Long)], truth: Seq[(Long, Long)]) = {
      val r = Eval.pairPrf(pred.toDF("a_id", "b_id"),
        truth.toDF("a_id", "b_id")).first()
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    // 2 predicted, 4 truth, 1 hit -> P=1/2, R=1/4 (truncating ppm)
    assert(prf(Seq((1L, 2L), (3L, 4L)),
      Seq((1L, 2L), (5L, 6L), (7L, 8L), (9L, 10L)))
      == ((2L, 4L, 1L, Some(500000L), Some(250000L))))
    // duplicated input rows must not inflate counts
    assert(prf(Seq((1L, 2L), (1L, 2L)), Seq((1L, 2L)))
      == ((1L, 1L, 1L, Some(1000000L), Some(1000000L))))
    // empty predicted -> null precision; empty truth -> null recall
    assert(prf(Seq.empty, Seq((1L, 2L))) == ((0L, 1L, 0L, None, Some(0L))))
    assert(prf(Seq((1L, 2L)), Seq.empty) == ((1L, 0L, 0L, Some(0L), None)))
  }

  test("cohenKappa: exact decomposition, negative kappa, degenerate cases") {
    import spark.implicits._
    def kap(rows: Seq[(Option[String], Option[String])]) = {
      val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").first()
      (r.getLong(0), r.getLong(1),
        r.getDecimal(2).longValueExact(), r.getDecimal(3).longValueExact(),
        r.getDecimal(4).longValueExact(),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }
    def s(x: String) = Option(x)
    // classic 2x2: a=(y,y,n,n), b=(y,n,y,n): po=1/2, pe=1/2 -> kappa 0
    assert(kap(Seq((s("y"), s("y")), (s("y"), s("n")),
      (s("n"), s("y")), (s("n"), s("n"))))
      == ((4L, 2L, 8L, 0L, 8L, Some(0L))))
    // perfect agreement on an imbalanced set: kappa exactly 1
    assert(kap(Seq((s("y"), s("y")), (s("y"), s("y")), (s("n"), s("n"))))
      == ((3L, 3L, 5L, 4L, 4L, Some(1000000L))))
    // systematic DISagreement: po=0, pe=1/2 -> kappa = -1 (sign-safe ppm)
    assert(kap(Seq((s("y"), s("n")), (s("n"), s("y"))))
      == ((2L, 0L, 2L, -2L, 2L, Some(-1000000L))))
    // both raters constant and equal: pe = n^2 -> kappa_den 0 -> null
    assert(kap(Seq((s("y"), s("y")), (s("y"), s("y"))))
      == ((2L, 2L, 4L, 0L, 0L, None)))
    // null verdicts on either side are excluded rows, not a class
    assert(kap(Seq((s("y"), s("y")), (None, s("y")), (s("n"), None),
      (s("n"), s("n"))))
      == ((2L, 2L, 2L, 2L, 2L, Some(1000000L))))
    // hand-checked 3-class asymmetric confusion:
    // a: x,x,x,y,y,z  b: x,x,y,y,z,z -> agree 4 (xx, xx, yy, zz),
    // pe = 3*2+2*2+1*2 = 12, kappa = (24-12)/(36-12) = 1/2
    assert(kap(Seq((s("x"), s("x")), (s("x"), s("x")), (s("x"), s("y")),
      (s("y"), s("y")), (s("y"), s("z")), (s("z"), s("z"))))
      == ((6L, 4L, 12L, 12L, 24L, Some(500000L))))
  }

  test("fleissKappa: hand-computed decomposition, degenerate and null cases") {
    def fk(rows: Seq[(Long, Option[String], Option[String], Option[String])]) = {
      val r = Eval.fleissKappa(rows.toDF("id", "r1", "r2", "r3"),
        "id", Seq("r1", "r2", "r3")).first()
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValueExact(), r.getDecimal(4).longValueExact(),
        r.getDecimal(5).longValueExact(), r.getDecimal(6).longValueExact(),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))
    }
    val s = Option.apply[String] _
    // hand-worked: items (a,a,a),(a,b,b),(b,b,a):
    // S = 9+5+5 = 19, T = 9, Tj = (a:5, b:4) -> E = 41
    // kappa = [(19-9)*9 - 41*2] / [2*(81-41)] = 8/80 = 0.1 exactly
    assert(fk(Seq(
      (1L, s("a"), s("a"), s("a")),
      (2L, s("a"), s("b"), s("b")),
      (3L, s("b"), s("b"), s("a"))))
      == ((3L, 3L, 2L, 19L, 41L, 8L, 80L, Some(100000L))))
    // unanimous single category: P̄e = 1 -> denominator 0 -> null ppm
    assert(fk(Seq((1L, s("a"), s("a"), s("a")), (2L, s("a"), s("a"), s("a"))))
      == ((2L, 3L, 1L, 18L, 36L, 0L, 0L, None)))
    // an item with ANY null rater is excluded entirely
    assert(fk(Seq(
      (1L, s("a"), s("a"), s("a")),
      (2L, s("a"), None, s("b")),
      (3L, s("b"), s("b"), s("a"))))._1 == 2L)
    // worse than chance: every item maximally split across 3 categories
    // S = 3 per item, P̄ = 0 -> kappa negative, sign-safe truncation
    val split = fk(Seq(
      (1L, s("a"), s("b"), s("c")), (2L, s("a"), s("b"), s("c"))))
    assert(split._6 < 0L && split._8.exists(_ < 0L), split)
  }
}
