package graft.plans

import graft.GraftSession
import graft.ext.{Dedup, TextHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `graft_jaccard` kernel must be byte-identical to the
  * declarative spec `size(array_intersect)/size(array_union)` — same
  * distinct-count arithmetic, same null-element handling, same
  * both-empty NaN — on real shingle arrays and on constructed edges. */
class JaccardNativeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get("local[4]", 4)

  test("native == declarative on corpus shingle pairs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextHash.shingles(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    // a bounded sample of cross pairs, including self-pairs (jaccard 1)
    val pairs = a.where(col("a_id") % 7 === 0)
      .join(b.where(col("b_id") % 11 === 0), col("a_id") <= col("b_id"))
    val both = pairs.select(
      call_function("graft_jaccard", col("a_sh"), col("b_sh")).as("nat"),
      Dedup.jaccardDeclarative(col("a_sh"), col("b_sh")).as("dec"))
    // NaN == NaN under Spark's <=> semantics
    val bad = both.where(!(col("nat") <=> col("dec")))
    assert(bad.isEmpty, s"${bad.count()} mismatching pairs")
  }

  test("edge shapes: empties, duplicates, null elements, null arrays") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")), // duplicates collapse
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq("x")),
      (Seq(null.asInstanceOf[String], "a"), Seq("a")), // null on one side
      (Seq(null.asInstanceOf[String], "a"),
        Seq(null.asInstanceOf[String], "b")), // null on both sides
      (null.asInstanceOf[Seq[String]], Seq("a")) // null array → null out
    ).toDF("a", "b")
    val both = rows.select(
      call_function("graft_jaccard", col("a"), col("b")).as("nat"),
      Dedup.jaccardDeclarative(col("a"), col("b")).as("dec"))
    val bad = both.where(!(col("nat") <=> col("dec")))
    assert(bad.isEmpty,
      s"${bad.count()} mismatching edge rows: ${both.collect().mkString}")
  }

  test("both-empty arrays: 0/0 throws under ANSI in BOTH forms") {
    val sp = spark
    import sp.implicits._
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    // the declarative division throws DIVIDE_BY_ZERO under Spark 4's
    // default ANSI mode; the kernel must be substitutable, so it throws
    // too (and returns NaN only under legacy non-ANSI sessions)
    intercept[Exception] {
      empty.select(Dedup.jaccardDeclarative(col("a"), col("b"))).collect()
    }
    intercept[Exception] {
      empty.select(call_function("graft_jaccard", col("a"), col("b")))
        .collect()
    }
  }
}
