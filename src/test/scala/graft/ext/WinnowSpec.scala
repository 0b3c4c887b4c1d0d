package graft.ext

import graft.SparkSpec

/** Winnowing against a brute-force reference, the paper's detection
  * guarantee (matches ≥ w+k−1 share a fingerprint), edge cases, and the
  * zero-shuffle plan property. */
class WinnowSpec extends SparkSpec {

  private def hashGram(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % TextHash.P)

  /** Literal transcription of the paper's algorithm with the rightmost-min
    * tie rule; positions 1-indexed like the operator. */
  private def brute(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    if (text.length < k) return Set.empty
    val hs = (0 to text.length - k).map(i => hashGram(text.substring(i, i + k)))
    if (hs.size < w) return Set.empty
    (0 to hs.size - w).map { j =>
      var best = (Long.MaxValue, 0)
      for (x <- j until j + w)
        if (hs(x) <= best._1) best = (hs(x), x + 1)
      (best._2.toLong, best._1)
    }.toSet
  }

  private def run(texts: Seq[(Long, String)], k: Int, w: Int): Map[Long, Set[(Long, Long)]] = {
    import spark.implicits._
    Winnow.fingerprints(texts.toDF("doc_id", "text"), "text", "doc_id", k, w)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet
      }
  }

  test("matches the brute-force reference on random texts") {
    val rnd = new scala.util.Random(42)
    val texts = (0L until 30L).map { i =>
      val len = 1 + rnd.nextInt(120)
      i -> (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
    for ((k, w) <- Seq((3, 4), (8, 8), (5, 1))) {
      val got = run(texts, k, w)
      for ((id, text) <- texts) {
        val exp = brute(text, k, w)
        assert(got.getOrElse(id, Set.empty) == exp,
          s"doc $id (k=$k w=$w len=${text.length}): got ${got.getOrElse(id, Set.empty)}, want $exp")
      }
    }
  }

  test("detection guarantee: a planted common substring of length w+k-1 always shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    val k = 5; val w = 6
    for (trial <- 0 until 50) {
      val planted = (0 until k + w - 1).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      def noise(n: Int) = (0 until n).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      val a = noise(rnd.nextInt(40)) + planted + noise(rnd.nextInt(40))
      val b = noise(rnd.nextInt(40)) + planted + noise(rnd.nextInt(40))
      val fa = brute(a, k, w).map(_._2)
      val fb = brute(b, k, w).map(_._2)
      assert(fa.intersect(fb).nonEmpty,
        s"trial $trial: no shared fingerprint for planted '$planted' in '$a' / '$b'")
    }
  }

  test("texts shorter than k or than k+w-1 produce no fingerprints") {
    val got = run(Seq(1L -> "ab", 2L -> "abcdefgh", 3L -> ""), 8, 8)
    assert(got.isEmpty || got.values.forall(_.isEmpty))
    // exactly k+w-1 chars = one complete window = exactly one fingerprint
    val one = run(Seq(4L -> "abcdefghijklmno"), 8, 8)
    assert(one(4L).size == 1)
  }

  test("codegen'd graft_winnow kernel == declarative pick pipeline, element for element") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit}
    val rnd = new scala.util.Random(3)
    val texts = ((0L until 40L).map { i =>
      val len = rnd.nextInt(150)
      i -> (0 until len).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    } :+ (99L -> "")).toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 8), (3, 5), (4, 1))) {
      val both = texts.select(col("doc_id"),
        call_function("graft_winnow", col("text"), lit(k), lit(w)).as("native"),
        Winnow.picksDeclarative(col("text"), k, w).as("decl"))
      val bad = both.where(!(col("native") <=> col("decl"))).count()
      assert(bad == 0L, s"k=$k w=$w: $bad docs differ between kernel and spec")
    }
  }

  test("fingerprinting is shuffle-free; only pair-finding exchanges") {
    import spark.implicits._
    val fps = Winnow.fingerprints(
      Seq(1L -> "the quick brown fox").toDF("doc_id", "text"),
      "text", "doc_id")
    val p = fps.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"),
      s"winnowing must be a per-row pipeline, no shuffle:\n$p")
  }

  test("shared-fingerprint pairs find the planted near-duplicate; hot fingerprints capped") {
    import spark.implicits._
    val base = "the winnowing algorithm selects minimum hashes from sliding windows"
    val docs = Seq(
      1L -> base,
      2L -> (base + " with a small suffix edit"),
      3L -> "completely unrelated text about databases and join strategies")
    val fps = Winnow.fingerprints(docs.toDF("doc_id", "text"), "text", "doc_id")
    val pairs = Winnow.sharedFingerprintPairs(fps, "doc_id", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup not found: $pairs")
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L },
      s"unrelated doc must not pair: $pairs")
    // a fingerprint present in every doc is dropped by the postings cap
    val all = Winnow.sharedFingerprintPairs(fps, "doc_id",
      minShared = 1, maxPostings = 1)
    assert(all.where(org.apache.spark.sql.functions.col("shared") >= 1).count() == 0)
  }
}
