package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aho–Corasick blocklist kernel: must equal both a naive in-memory
  * overlapping-count reference and the declarative HOF spec form
  * element-for-element, in both boundary modes, on adversarial and fuzzed
  * inputs. */
class BlocklistSpec extends SparkSpec {

  private def textDf(texts: String*) = spark.createDataFrame(
    java.util.List.of(texts.map(Row(_)): _*),
    StructType(Seq(StructField("text", StringType))))

  /** Naive char-level reference: count all (overlapping) occurrences; in
    * boundary mode require non-alphanumeric ASCII (or edge) on both sides.
    * Chars, not bytes — agreement with the byte-level kernel on multibyte
    * text is part of what the fuzz proves. */
  private def naive(text: String, pats: Seq[String], boundary: Boolean): Seq[Int] = {
    def isWord(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
    pats.map { p =>
      (0 to text.length - p.length).count { i =>
        text.regionMatches(i, p, 0, p.length) &&
          (!boundary ||
            ((i == 0 || !isWord(text.charAt(i - 1))) &&
              (i + p.length == text.length || !isWord(text.charAt(i + p.length)))))
      }
    }
  }

  private def kernelCounts(texts: Seq[String], pats: Seq[String], boundary: Boolean) =
    textDf(texts: _*)
      .select(call_function("graft_ac_counts",
        col("text"), lit(pats.toArray), lit(boundary)).as("c"))
      .collect().map(_.getSeq[Int](0))

  test("nested + overlapping patterns, both boundary modes") {
    val pats = Seq("he", "she", "hers", "his", "ishe")
    val text = "ushers heshe shishe hers"
    // substring mode: all overlapping matches count
    assert(kernelCounts(Seq(text), pats, boundary = false).head ==
      naive(text, pats, boundary = false))
    // boundary mode: only word-bounded ones
    assert(kernelCounts(Seq(text), pats, boundary = true).head ==
      naive(text, pats, boundary = true))
    // sanity anchors, hand-counted: "he" occurs in usHErs, HEshe, hesHE,
    // sHishE? no — ushers(1) heshe(2) shishe(1) hers(1)
    assert(kernelCounts(Seq(text), Seq("he"), boundary = false).head == Seq(5))
    assert(kernelCounts(Seq(text), Seq("hers"), boundary = true).head == Seq(1))
  }

  test("boundary semantics at string edges and around non-ASCII") {
    val pats = Seq("ass", "tag")
    assert(kernelCounts(Seq("ass"), pats, true).head == Seq(1, 0))
    assert(kernelCounts(Seq("class tag!"), pats, true).head == Seq(0, 1))
    assert(kernelCounts(Seq("class tag!"), pats, false).head == Seq(1, 1))
    // multibyte neighbors are boundaries (not ASCII alphanumerics)
    assert(kernelCounts(Seq("étagè"), pats, true).head == Seq(0, 1))
    assert(kernelCounts(Seq("étagè"), pats, false).head == Seq(0, 1))
  }

  test("kernel == declarative HOF form on real documents") {
    val pats = Seq("able", "agg", "fast table", "scan", "the")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text")
    for (boundary <- Seq(true, false)) {
      val mism = docs.select(
        call_function("graft_ac_counts",
          col("text"), lit(pats.toArray), lit(boundary)).as("nat"),
        Blocklist.matchCountsDeclarative("text", pats, boundary).as("dec"))
        .where(not(col("nat") <=> col("dec")))
      assert(mism.count() == 0, s"boundary=$boundary")
    }
  }

  test("fuzz: kernel == naive reference on random small-alphabet strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abAB1 .é"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val texts = (0 until 200).map(_ => randStr(1 + rnd.nextInt(40)))
    val pats = ((0 until 12).map(_ => randStr(1 + rnd.nextInt(4))) :+ "ab" :+ "aba")
      .distinct
    for (boundary <- Seq(true, false)) {
      val got = kernelCounts(texts, pats, boundary)
      texts.zip(got).foreach { case (t, g) =>
        assert(g == naive(t, pats, boundary),
          s"text=${t.map(c => f"$c%s(${c.toInt}%d)").mkString} boundary=$boundary")
      }
    }
  }

  test("null text, empty text, SQL surface, empty pattern rejected") {
    val df = spark.createDataFrame(
      java.util.List.of(Row("aa"), Row(null), Row("")),
      StructType(Seq(StructField("text", StringType))))
    val got = df.select(call_function("graft_ac_counts",
      col("text"), lit(Array("a")), lit(false)).as("c")).collect()
    assert(got(0).getSeq[Int](0) == Seq(2))
    assert(got(1).isNullAt(0))
    assert(got(2).getSeq[Int](0) == Seq(0))

    df.createOrReplaceTempView("bl_spec")
    val viaSql = spark.sql(
      "SELECT graft_ac_counts(text, array('a','aa'), true) AS c FROM bl_spec")
      .collect()
    assert(viaSql(0).getSeq[Int](0) == Seq(0, 1))

    intercept[Exception] {
      df.select(call_function("graft_ac_counts",
        col("text"), lit(Array.empty[String]), lit(false))).collect()
    }
    intercept[Exception] {
      df.select(call_function("graft_ac_counts",
        col("text"), lit(Array("a", "")), lit(false))).collect()
    }
  }

  test("dropBlocked and profile semantics") {
    val df = textDf("clean words here", "one bad word", "bad bad bad", "badge")
    // boundary mode: "badge" is not a "bad" hit
    val kept = Blocklist.dropBlocked(df, "text", Seq("bad"), 0L, boundary = true)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("clean words here", "badge"))

    val prof = Blocklist.profile(df, "text", Seq("bad", "word"), boundary = true)
      .orderBy("pat_idx").collect()
    assert(prof.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("bad", 2L, 4L), ("word", 1L, 1L)))
  }
}
