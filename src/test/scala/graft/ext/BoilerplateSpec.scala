package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Segment-level boilerplate removal + incremental dedup + quota cap. */
class BoilerplateSpec extends SparkSpec {

  private def words(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("segments: fixed width with ragged tail; split evaluated once") {
    import spark.implicits._
    val df = Seq(words(25, "w")).toDF("text")
    val segs = df.select(Boilerplate.segments(col("text"), 10).as("s"))
      .head().getSeq[String](0)
    assert(segs.length == 3)
    assert(segs(0) == (0 until 10).map("w" + _).mkString(" "))
    assert(segs(2) == (20 until 25).map("w" + _).mkString(" "))
  }

  test("stripBoilerplate removes cross-doc segments, keeps unique content in order") {
    import spark.implicits._
    val banner = words(10, "b")
    val docs = Seq(
      (1L, banner + " " + words(20, "one")),
      (2L, banner + " " + words(20, "two")),
      (3L, banner + " " + words(20, "three")),
      (4L, words(20, "four"))).toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(docs, "text", "doc_id", w = 10, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out(0).getString(1) == words(20, "one"), "banner removed, order kept")
    assert(out(3).getString(1) == words(20, "four"), "untouched doc intact")
  }

  test("stripBoilerplate drops docs that are pure boilerplate") {
    import spark.implicits._
    val banner = words(10, "b")
    val docs = Seq(
      (1L, banner), (2L, banner), (3L, banner),
      (4L, words(10, "real"))).toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(docs, "text", "doc_id", w = 10, minDocs = 3)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L))
  }

  test("incrementalNew: corpus content filtered out, within-batch dups collapse") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"), // re-crawl of corpus content → dropped
      (11L, "gamma"), (12L, "gamma"), // new, duplicated within batch → one row
      (13L, "delta")).toDF("doc_id", "text")
    val out = Dedup.incrementalNew(corpus, batch, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((11L, 2L), (13L, 1L)))
  }

  test("incrementalNew plan: corpus side has no shuffle before the semi join") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha")).toDF("doc_id", "text")
    val batch = Seq((10L, "beta")).toDF("doc_id", "text")
    val plan = Dedup.incrementalNew(corpus, batch, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"semi probe must broadcast the batch fingerprints:\n$plan")
  }

  test("quotaCap: deterministic, ≤k per group, aggregate == window fallback") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (if (i % 2 == 0) "en" else "de", i))
      .toDF("lang", "doc_id")
    val capped = Sampling.quotaCap(df, "lang", "doc_id", k = 7, salt = "s1")
    val rows = capped.orderBy("lang", "rank").collect()
    assert(rows.length == 14)
    assert(rows.map(_.getString(0)).count(_ == "en") == 7)
    // same draw twice → identical set; different salt → different set
    val again = Sampling.quotaCap(df, "lang", "doc_id", k = 7, salt = "s1")
      .orderBy("lang", "rank").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val other = Sampling.quotaCap(df, "lang", "doc_id", k = 7, salt = "s2")
      .collect().map(_.getLong(1)).toSet
    assert(other != rows.map(_.getLong(1)).toSet)
    // window formulation must agree exactly with the bounded aggregate
    val h = TextHash.hmod(concat(col("doc_id").cast("string"), lit(":s1")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(h.asc, col("doc_id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 7).select("lang", "doc_id", "rank")
      .orderBy("lang", "rank").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ==
      viaWindow.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq)
  }
}
