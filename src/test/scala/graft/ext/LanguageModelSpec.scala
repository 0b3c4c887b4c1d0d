package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CCNet-style stupid-backoff LM scoring: hand-computed log-probs, backoff
  * tiers, pruning, and the quantization contract. */
class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val Alpha = 0.1

  /** Reference-side quantized lp mirror of the implementation (HALF_UP on
    * the decimal magnitude — Spark round(), not Scala math.round, which
    * differs on negative .5 boundaries). */
  private def q(lp: Double): Long =
    BigDecimal(lp * LanguageModel.LpScale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("hand-computed scores: bigram tier, unigram backoff, unknown backoff") {
    // ref "a b a c": uni a:2 b:1 c:1 (C=4, V=3); bigrams "a b":1 "b a":1 "a c":1
    val ref = Seq((1L, "a b a c")).toDF("doc_id", "text")
    // corpus doc 10: "a b x" → ("a b",b) seen bigram ln(1/2);
    //                          ("b x",x) unseen bigram, x unseen → unk tier
    // corpus doc 11: "c b"   → ("c b",b) unseen bigram, b SEEN → unigram tier
    val corpus = Seq((10L, "a b x"), (11L, "c b")).toDF("doc_id", "text")
    val out = LanguageModel.scoreLogPpl(corpus, ref, "text", "doc_id", Alpha)
      .orderBy("doc_id").collect()

    val denom = 4.0 + Alpha * 3.0
    val lpAB = q(math.log(1.0 / 2.0))
    val lpUnk = q(math.log(0.4 * (0.0 + Alpha) / denom))
    val lpB = q(math.log(0.4 * (1.0 + Alpha) / denom))

    assert(out.length == 2)
    val d10 = out(0)
    assert(d10.getLong(0) == 10L && d10.getLong(1) == 2L)
    assert(d10.getDouble(2) ==
      -((lpAB + lpUnk).toDouble / LanguageModel.LpScale / 2.0))
    val d11 = out(1)
    assert(d11.getLong(0) == 11L && d11.getLong(1) == 1L)
    assert(d11.getDouble(2) == -(lpB.toDouble / LanguageModel.LpScale / 1.0))
  }

  test("documents with fewer than two tokens yield no score row") {
    val ref = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val corpus = Seq((10L, "a"), (11L, ""), (12L, "a b")).toDF("doc_id", "text")
    val ids = LanguageModel.scoreLogPpl(corpus, ref, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(12L))
  }

  test("minCount pruning drops rare n-grams to the backoff tier, totals unchanged") {
    // "a a a a b": uni a:4 b:1; bigram "a a":3, "a b":1. minCount=2 prunes
    // b and "a b" — but C=5, V=2 stay computed from the unpruned counts.
    val ref = Seq((1L, "a a a a b")).toDF("doc_id", "text")
    val corpus = Seq((10L, "a a"), (11L, "a b")).toDF("doc_id", "text")
    val out = LanguageModel
      .scoreLogPpl(corpus, ref, "text", "doc_id", Alpha, minCount = 2)
      .orderBy("doc_id").collect()
    val denom = 5.0 + Alpha * 2.0
    // doc 10: "a a" seen (c12=3, c1=4)
    assert(out(0).getDouble(2) ==
      -(q(math.log(3.0 / 4.0)).toDouble / LanguageModel.LpScale))
    // doc 11: "a b" pruned; b pruned from the unigram table too → unk tier
    assert(out(1).getDouble(2) ==
      -(q(math.log(0.4 * (0.0 + Alpha) / denom)).toDouble / LanguageModel.LpScale))
  }

  test("pplBuckets: thirds split, head holds the most fluent docs") {
    import org.apache.spark.sql.functions.col
    val ref = (0 until 100).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran to the cat"))
      .toDF("doc_id", "text")
    // 30 fluent, 30 shuffled, 30 unknown-vocab docs → bucket order must
    // follow fluency; exact-tier cuts at 1/3 and 2/3
    val corpus = ((0 until 30).map(i => (1000L + i, "the cat sat on the mat")) ++
      (0 until 30).map(i => (2000L + i, "mat the on sat cat the")) ++
      (0 until 30).map(i => (3000L + i, "zq xv qq ww ee rr"))).toDF("doc_id", "text")
    val out = LanguageModel.pplBuckets(corpus, ref, "text", "doc_id", exact = true)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert((0 until 30).forall(i => out(1000L + i) == "head"), s"fluent=head: $out")
    assert((0 until 30).forall(i => out(2000L + i) == "middle"))
    assert((0 until 30).forall(i => out(3000L + i) == "tail"))
    // sketch tier agrees on this well-separated corpus
    val approx = LanguageModel.pplBuckets(corpus, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(approx == out, "approx tier must agree on well-separated scores")
  }

  test("fluent text under the reference LM scores better than shuffled/unknown text") {
    val ref = (0 until 200).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran to the cat"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1000L, "the cat sat on the mat"),     // in-distribution
      (1001L, "mat the on sat cat the"),     // same words, broken order
      (1002L, "zq xv qq ww ee rr")).toDF("doc_id", "text") // unknown
    val scores = LanguageModel.scoreLogPpl(corpus, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1000L) < scores(1001L),
      s"fluent must beat shuffled: $scores")
    assert(scores(1001L) < scores(1002L),
      s"shuffled known words must beat unknown words: $scores")
  }
}
