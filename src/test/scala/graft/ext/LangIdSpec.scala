package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained char-n-gram language ID — the router that replaces the
  * marker heuristic. */
class LangIdSpec extends SparkSpec {

  private val phrases = Map(
    "en" -> "the quick brown fox jumps over the lazy dog and runs",
    "de" -> "der schnelle braune fuchs springt über den faulen hund",
    "fr" -> "le rapide renard brun saute pardessus le chien paresseux",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso",
    "zh" -> "快速的棕色狐狸跳过懒惰的狗然后安静地休息")

  private def corpus(n: Int) = {
    import spark.implicits._
    val langs = phrases.keys.toSeq.sorted
    (0 until n).map { i =>
      val l = langs(i % langs.size)
      (i.toLong, l, s"${phrases(l)} filler ${i % 17}")
    }.toDF("id", "lang", "text")
  }

  test("separable corpus classifies perfectly; labeled slice generalizes") {
    val c = corpus(200)
    val out = LangId.classify(c, c.where(col("id") % 4 === 0),
      "text", "id", "lang")
    val joined = out.select(col("id"), col("lang").as("pred"))
      .join(c.select("id", "lang"), "id")
    assert(joined.count() == 200)
    assert(joined.where(col("pred") =!= col("lang")).isEmpty)
  }

  test("beats the marker heuristic where markers don't exist (zh)") {
    val c = corpus(100)
    val trained = LangId.classify(c, c.where(col("id") % 4 === 0),
      "text", "id", "lang").select(col("id"), col("lang").as("pred"))
    val heur = TextStats.langId(c, "text")
      .select(col("id"), col("lang_pred"))
    val zh = c.where(col("lang") === "zh").select("id")
    // heuristic structurally cannot say zh (no markers); trained must
    assert(heur.join(zh, "id").where(col("lang_pred") === "zh").isEmpty)
    assert(trained.join(zh, "id").where(col("pred") =!= "zh").isEmpty)
  }

  test("texts shorter than n yield no verdict; case-insensitive features") {
    import spark.implicits._
    val labeled = corpus(40)
    val probe = Seq(
      (1000L, "xx", "ab"),                       // < 3 chars -> no row
      (1001L, "xx", "DER SCHNELLE BRAUNE FUCHS") // uppercased de evidence
    ).toDF("id", "lang", "text")
    val out = LangId.classify(probe, labeled, "text", "id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.contains(1000L))
    assert(out(1001L) == "de", out)
  }

  test("classifyMargin: clear docs route, weak-margin docs abstain to und") {
    import spark.implicits._
    val labeled = corpus(40)
    val (m, p) = NaiveBayes.train(labeled, "text", "lang", 2000, 1.0,
      LangId.charGramBuckets(3))
    val probe = Seq(
      (1L, phrases("de")),           // strong single-language evidence
      (2L, "zzz qqq xxx www vvv"),   // out-of-vocab: margin is noise
      (3L, "ab")                     // < n chars -> no row at all
    ).toDF("id", "text")
    val out = LangId.classifyMargin(probe, m, p, "text", "id",
        minMarginLpq = 20000000000L) // 20 nats
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(1L)._1 == "de" && out(1L)._2 >= 20000000000L, out)
    assert(out(2L)._1 == "und", out)
    assert(!out.contains(3L))
    // threshold 0 routes everything (margin >= 0 always)
    val all = LangId.classifyMargin(probe, m, p, "text", "id", 0L)
    assert(all.where(col("lang") === "und").isEmpty)
    // margin agrees with classifyWith's argmax pick when routed
    val argmax = LangId.classifyWith(probe, m, p, "text", "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L)._1 == argmax(1L))
  }

  test("classifyMargin: single-class model routes (no top-2 exists)") {
    import spark.implicits._
    val labeled = corpus(40).where(col("lang") === "en")
    val (m, p) = NaiveBayes.train(labeled, "text", "lang", 2000, 1.0,
      LangId.charGramBuckets(3))
    val got = LangId.classifyMargin(
        Seq((1L, "anything at all")).toDF("id", "text"),
        m, p, "text", "id", minMarginLpq = 1000000000000L)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.sameElements(Array(("en", 0L))), got.toSeq)
  }

  test("charGramBuckets: occurrence stream, bounded, empty for short text") {
    import spark.implicits._
    val got = Seq("abcab", "ab", "").toDF("t")
      .select(LangId.charGramBuckets(3)(col("t"), 50).as("g"))
      .collect().map(_.getSeq[Long](0))
    assert(got(0).length == 3) // abc, bca, cab
    assert(got(0).forall(b => b >= 0 && b < 50))
    assert(got(1).isEmpty && got(2).isEmpty)
  }
}
