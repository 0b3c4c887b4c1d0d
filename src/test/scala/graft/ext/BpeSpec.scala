package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** BPE tokenization: known-answer merges, rank priority, and invariants
  * (concatenation identity, partitioning independence). The cross-engine
  * value check is the `ext_bpe_tokens` recursive-CTE oracle gate. */
class BpeSpec extends SparkSpec {

  private def rk(merges: Seq[(String, String)]) = {
    val m = merges.zipWithIndex.toMap
    (p: (String, String)) => m.get(p)
  }

  test("encodeWord: chained merges and rank priority") {
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "n"))
    val r = rk(merges)
    assert(Bpe.encodeWord("the", r) == Vector("the"))
    // t+h wins first (rank 0), leaving t,e,n,th; then e+n
    assert(Bpe.encodeWord("tenth", r) == Vector("t", "en", "th"))
    assert(Bpe.encodeWord("then", r) == Vector("the", "n"))
    assert(Bpe.encodeWord("x", r) == Vector("x"))
    assert(Bpe.encodeWord("", r) == Vector())
    // lower rank beats textual position: e+n (rank 2) at the front loses
    // to t+h (rank 0) later in the word — harmless here, but the ordering
    // matters when merges overlap
    val r2 = rk(Seq(("n", "t"), ("e", "n")))
    assert(Bpe.encodeWord("ent", r2) == Vector("e", "nt"))
  }

  test("encodeWord: leftmost occurrence of the best pair merges first") {
    // "aaa" with a+a: leftmost pair merges, leaving (aa)(a) — never a(aa)
    val r = rk(Seq(("a", "a")))
    assert(Bpe.encodeWord("aaa", r) == Vector("aa", "a"))
    assert(Bpe.encodeWord("aaaa", r) == Vector("aa", "aa"))
    // and the merged symbol can chain when the table says so
    val r2 = rk(Seq(("a", "a"), ("aa", "a")))
    assert(Bpe.encodeWord("aaa", r2) == Vector("aaa"))
  }

  test("token concatenation reproduces the word; counts are exact") {
    val rnd = new Random(41)
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "b"), ("c", "a"))
    val r = rk(merges)
    (0 until 200).foreach { _ =>
      val w = (0 until 1 + rnd.nextInt(12))
        .map(_ => "abc" (rnd.nextInt(3))).mkString
      val toks = Bpe.encodeWord(w, r)
      assert(toks.mkString == w, s"concat identity broken for $w: $toks")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("tokenize: dataframe surface, partitioning independence, md5 stability") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the then tenth"),
      (2L, "ab abc"),
      (3L, ""),
      (4L, "  spaced   out  ")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "n"), ("a", "b"), ("ab", "c"))
    val a = Bpe.tokenize(docs.repartition(1), "text", "doc_id", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = Bpe.tokenize(docs.repartition(7), "text", "doc_id", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.sameElements(b), "tokenization must not depend on partitioning")
    val byId = a.map(r => r._1 -> r).toMap
    // "the"→[the] (1), "then"→[the,n] (2), "tenth"→[t,en,th] (3)
    assert(byId(1L)._2 == 6L)
    // "ab"→[ab] (1), "abc"→[abc] (1)
    assert(byId(2L)._2 == 2L)
    assert(byId(3L)._2 == 0L)
    // whitespace pre-tokenization skips empty words
    assert(byId(4L)._2 > 0L)
  }

  test("trainMerges: hand-computed Sennrich corpus") {
    import spark.implicits._
    // low*5 lower*2 newest*6 widest*3 — the paper's worked example shape.
    // Pair counts round 1: (e,s)=9 (newest+widest) ties (s,t)=9; the
    // pinned tie-break (l asc) picks (e,s). Then (es,t)=9 alone. Round 3:
    // (l,o)=7 ties (o,w)=7 → (l,o). Round 4: (lo,w)=7 wins.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(Tuple1(_)).toDF("text")
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // the learned table drives tokenize to the expected segmentation
    val toks = Bpe.tokenize(Seq((1L, "newest lowest")).toDF("doc_id", "text"),
      "text", "doc_id", merges).collect()(0)
    // newest → n,e,w,est (4), lowest → low,est (2)
    assert(toks.getLong(1) == 6L)
  }

  test("trainMerges: minCount prunes rare words from the statistics") {
    import spark.implicits._
    // "zz" would win round 1 ((z,z)=4 > (a,b)=3) but sits on a word with
    // count 2 < minCount — pruned, so (a,b) learns first
    val corpus = (Seq.fill(3)("ab") ++ Seq.fill(2)("zzzz"))
      .map(Tuple1(_)).toDF("text")
    assert(Bpe.trainMerges(corpus, "text", 1, minCount = 3L) ==
      Seq(("a", "b")))
    assert(Bpe.trainMerges(corpus, "text", 1) == Seq(("z", "z")))
  }

  test("trainMerges: early stop when no pair remains; empty request") {
    import spark.implicits._
    val single = Seq("a b c", "a c").map(Tuple1(_)).toDF("text")
    // all words are single-char: zero pairs, zero merges no matter the ask
    assert(Bpe.trainMerges(single, "text", 5) == Seq())
    val tiny = Seq("ab ab").map(Tuple1(_)).toDF("text")
    // one merge exhausts the vocabulary ("ab" fully merged)
    assert(Bpe.trainMerges(tiny, "text", 10) == Seq(("a", "b")))
    assert(Bpe.trainMerges(tiny, "text", 0) == Seq())
  }

  test("trainMerges: whole-word merges chain through multi-char symbols") {
    import spark.implicits._
    val corpus = Seq.fill(4)("abc").map(Tuple1(_)).toDF("text")
    // (a,b) ties (b,c) at 4 → (a,b); then (ab,c)
    assert(Bpe.trainMerges(corpus, "text", 3) ==
      Seq(("a", "b"), ("ab", "c")))
  }
}
