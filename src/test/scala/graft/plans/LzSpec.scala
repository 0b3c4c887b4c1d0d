package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Greedy-LZ77 parse kernel: equals an independent reference on fuzzed
  * inputs, honors the coverage invariant, and behaves monotonically on
  * planted repetition. */
class LzSpec extends SparkSpec {

  /** Independent reference: same spec, written against a codepoint list
    * with straightforward scanning (no early exits, no arrays reuse). */
  private def ref(s: String, w: Int, minM: Int, maxM: Int): (Int, Int, Int) = {
    val cps = s.codePoints().toArray.toList
    val n = cps.length
    var (nl, nm, mc) = (0, 0, 0)
    var i = 0
    while (i < n) {
      val lim = math.min(maxM, n - i)
      val best = (math.max(0, i - w) until i).foldLeft(0) { (acc, j) =>
        val l = (0 until lim).takeWhile(x => cps(j + x) == cps(i + x)).size
        math.max(acc, l)
      }
      if (best >= minM) { nm += 1; mc += best; i += best }
      else { nl += 1; i += 1 }
    }
    (nl, nm, mc)
  }

  private def kernel(texts: Seq[String], w: Int, minM: Int, maxM: Int) = {
    val df = spark.createDataFrame(
      java.util.List.of(texts.map(Row(_)): _*),
      StructType(Seq(StructField("text", StringType))))
    df.select(call_function("graft_lz_stats", col("text"),
      lit(w), lit(minM), lit(maxM)).as("s"))
      .collect()
      .map(r => if (r.isNullAt(0)) null
        else {
          val s = r.getStruct(0)
          (s.getInt(0), s.getInt(1), s.getInt(2))
        })
  }

  test("fuzz: kernel == reference, invariant n_literals + match_chars == len") {
    val rnd = new scala.util.Random(7)
    // whole codepoints — indexing a raw string would split the emoji's
    // surrogate pair and fuzz with lone surrogates (which UTF-8 transport
    // replaces, by spec, before the kernel ever sees them)
    val alphabet = Seq("a", "b", "c", "d", " ", "é", "😀")
    val texts = (0 until 150).map { _ =>
      val n = rnd.nextInt(60)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "aaaaaaaaaaaaaaaaaaaaaaaa" :+ "abcabcabcabcabcabc"
    val got = kernel(texts, 16, 4, 12)
    texts.zip(got).foreach { case (t, g) =>
      val want = ref(t, 16, 4, 12)
      assert(g == want, s"text=${t.take(60)}")
      val nCps = t.codePointCount(0, t.length)
      assert(g._1 + g._3 == nCps, s"coverage invariant on ${t.take(60)}")
    }
  }

  test("repetition compresses, unique text does not; multibyte counts as chars") {
    val Seq(rep, uniq, emoji) = kernel(Seq(
      "the cat " * 10, // heavy period-8 repetition
      "q w e r t y u i o p a s d f g h j k l z x c v b n m",
      "😀😀😀😀😀😀😀😀😀😀😀😀"), 16, 4, 12).toSeq
    assert(rep._3 > (("the cat " * 10).length * 3) / 4,
      s"repeated text must parse mostly into matches: $rep")
    assert(uniq._2 == 0, s"unique text has no matches: $uniq")
    // 12 identical emoji = codepoints: first literals, then matches
    assert(emoji._1 + emoji._3 == 12, s"codepoint counting: $emoji")
    assert(emoji._2 > 0)
  }

  test("null text, SQL surface, constant validation") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(null.asInstanceOf[String])),
      StructType(Seq(StructField("text", StringType))))
    assert(kernel(Seq("abab"), 16, 4, 12).nonEmpty)
    assert(df.select(call_function("graft_lz_stats", col("text"),
      lit(16), lit(4), lit(12))).collect()(0).isNullAt(0))
    df.createOrReplaceTempView("lz_spec")
    assert(spark.sql(
      "SELECT graft_lz_stats('xyxyxyxyxyxy', 16, 4, 12).n_matches AS m")
      .first().getInt(0) > 0)
    intercept[Exception] {
      spark.sql("SELECT graft_lz_stats('a', 0, 4, 12)").collect()
    }
  }
}
