package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Hard-sigmoid fixed-point logistic regression: the engine's training
  * loop must match an independently-written BigInt reference EXACTLY
  * (same hash, same truncating division), separable data must classify
  * correctly, and the bias/unseen-bucket scoring contract holds. */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  // ---- independent reference: plain-Scala BigInt replay of the spec ----

  private def md5mod(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % TextHash.P
  }

  private def refFeatures(text: String, buckets: Int): Map[Long, Long] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val uni = toks.map(t => md5mod(t) % buckets)
    val bi = toks.sliding(2).filter(_.length == 2)
      .map(p => md5mod(p.mkString(" ")) % buckets).toSeq
    val counts = (uni ++ bi).groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    counts + (-1L -> 1L)
  }

  /** Full-batch hard-sigmoid GD in driver-only BigInt arithmetic. */
  private def refTrain(
      docs: Seq[(String, Long)], buckets: Int, iters: Int,
      lrNum: Long = 1L, lrDen: Long = 1L): Map[Long, BigInt] = {
    val feats = docs.map { case (text, y) => (refFeatures(text, buckets), y) }
    val support = feats.flatMap(_._1.keys).distinct
    var w: Map[Long, BigInt] = support.map(_ -> BigInt(0)).toMap
    val den = BigInt(4) * docs.size * lrDen
    for (_ <- 1 to iters) {
      val e4 = feats.map { case (f, y) =>
        val z = f.map { case (b, x) => w(b) * x }.sum
        val p4 = (z + 2000000000L).max(BigInt(0)).min(BigInt(4000000000L))
        (f, p4 - BigInt(4000000000L) * y)
      }
      val g = e4.flatMap { case (f, e) => f.map { case (b, x) => b -> e * x } }
        .groupBy(_._1).map { case (b, rows) => b -> rows.map(_._2).sum }
      w = w.map { case (b, v) =>
        b -> (v - (BigInt(lrNum) * g.getOrElse(b, BigInt(0))) / den)
      }
    }
    w
  }

  private def trainBoth(docs: Seq[(String, Long)], iters: Int,
      lrNum: Long = 1L, lrDen: Long = 1L): (Map[Long, Long], Map[Long, BigInt]) = {
    val df = docs.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }.toDF("doc_id", "text", "y")
    val got = LogReg.train(df, "text", "doc_id", col("y"), B, iters, lrNum, lrDen)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (got, refTrain(docs, B, iters, lrNum, lrDen))
  }

  test("fuzz: engine weights equal the BigInt reference bit-for-bit") {
    val rnd = new Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    for (round <- 1 to 5) {
      val docs = (0 until (5 + rnd.nextInt(20))).map { _ =>
        val n = rnd.nextInt(12)
        val text = Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (text, rnd.nextInt(2).toLong)
      }
      val (got, want) = trainBoth(docs, iters = 1 + rnd.nextInt(4),
        lrNum = 1 + rnd.nextInt(3), lrDen = 1 + rnd.nextInt(3))
      assert(got == want.map { case (b, v) => b -> v.toLong },
        s"round $round diverged")
    }
  }

  test("separable vocabularies: trained model classifies both classes") {
    val pos = Seq.fill(6)("good fine great good").map((_, 1L))
    val neg = Seq.fill(6)("bad awful worse bad").map((_, 0L))
    val docs = (pos ++ neg).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }.toDF("doc_id", "text", "y")
    val w = LogReg.train(docs, "text", "doc_id", col("y"), B, iterations = 4)
    val out = LogReg.score(docs, w, "text", "doc_id", B)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    (0 until 6).foreach(i => assert(out(i.toLong) == 1L, s"pos doc $i"))
    (6 until 12).foreach(i => assert(out(i.toLong) == 0L, s"neg doc $i"))
  }

  test("bias-only: empty docs train the bias toward the majority label") {
    // all-empty docs, 3 of 4 labeled 1: z=0 → p4=2e9, e4 = −2e9 for the
    // three y=1 docs and +2e9 for the y=0 doc → G = −4e9,
    // Δw = −G/(4·n) = 4e9/16 = 250e6
    val docs = Seq((1L, "", 1L), (2L, "", 1L), (3L, "", 1L), (4L, "", 0L))
      .toDF("doc_id", "text", "y")
    val w = LogReg.train(docs, "text", "doc_id", col("y"), B, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == Map(-1L -> 250000000L), s"got $w")
    // empty docs still score through the bias row, pred = 1 (z ≥ 0)
    val s = LogReg.score(Seq((9L, "")).toDF("doc_id", "text"),
      docs.sparkSession.createDataFrame(
        Seq((-1L, 375000000L))).toDF("b", "wq"), "text", "doc_id", B)
      .collect()
    assert(s.length == 1 && s(0).getLong(1) == 375000000L && s(0).getLong(3) == 1L)
  }

  test("warm start: 2 cold + 1 warm iterations == 3 cold; weights carry over") {
    val docs = Seq((1L, "good fine text", 1L), (2L, "bad junk words", 0L),
      (3L, "good stuff here", 1L), (4L, "junk filler bad", 0L))
      .toDF("doc_id", "text", "y")
    def weights(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold3 = weights(LogReg.train(docs, "text", "doc_id", col("y"), B, 3))
    val w2 = LogReg.train(docs, "text", "doc_id", col("y"), B, 2)
    val warm = weights(LogReg.train(docs, "text", "doc_id", col("y"), B, 1,
      initWeights = Some(w2)))
    assert(warm == cold3, "continuing on the same data must equal cold training")
    // a refresh on a DISJOINT vocabulary keeps the old buckets' weights
    val fresh = Seq((9L, "novel unseen tokens", 1L), (10L, "other new words", 0L))
      .toDF("doc_id", "text", "y")
    val refreshed = weights(LogReg.train(fresh, "text", "doc_id", col("y"), B, 1,
      initWeights = Some(w2)))
    val freshSupport = Seq("novel unseen tokens", "other new words")
      .flatMap(t => refFeatures(t, B).keys).toSet
    weights(w2).foreach { case (b, v) =>
      if (!freshSupport(b)) // untouched by the refresh slice (bias always is)
        assert(refreshed(b) == v, s"carried-over bucket $b must keep its weight")
    }
  }

  test("scoring ignores buckets absent from the weight table") {
    // weights trained on one vocabulary, scored on a disjoint one:
    // every token bucket is unseen → only the bias contributes
    val w = Seq((-1L, -5L)).toDF("b", "wq")
    val out = LogReg.score(Seq((1L, "zzz qqq ppp")).toDF("doc_id", "text"),
      w, "text", "doc_id", B).collect()
    assert(out.length == 1 && out(0).getLong(1) == -5L && out(0).getLong(3) == 0L)
  }
}
