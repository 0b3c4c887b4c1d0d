package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def js(a: DataFrame, b: DataFrame, buckets: Int = 512): Double =
    Drift.jsDivergence(a, b, "text", buckets).first().getDouble(2)

  test("identical distributions give exactly zero") {
    val a = docs((1L, "alpha beta gamma"), (2L, "delta beta"))
    // same token multiset, different doc layout
    val b = docs((9L, "beta delta alpha"), (8L, "gamma beta"))
    assert(js(a, b) == 0.0)
  }

  test("disjoint vocabularies approach ln 2; divergence is symmetric") {
    val a = docs((1L, "aa bb cc dd ee ff"), (2L, "gg hh ii"))
    val b = docs((3L, "qq ww rr tt yy uu"), (4L, "oo pp zz"))
    val d = js(a, b)
    assert(d > 0.69 && d <= 0.6932, s"disjoint => ~ln2, got $d")
    assert(js(a, b) == js(b, a), "JS is symmetric")
  }

  test("mild drift lands strictly between zero and ln 2 and grows with drift") {
    val ref = docs((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the dog sleeps all day"))
    val mild = docs((3L, "the quick brown fox jumps over the lazy dog spam"),
      (4L, "the dog sleeps all day"))
    val heavy = docs((5L, "spam spam spam viagra casino spam"),
      (6L, "casino spam bonus spam"))
    val dm = js(ref, mild); val dh = js(ref, heavy)
    assert(dm > 0.0 && dh < 0.6932)
    assert(dm < dh, s"more drift, more divergence: $dm < $dh")
  }

  test("counts come back and an n-fold corpus blowup changes nothing") {
    val a = docs((1L, "x y z"))
    val b = docs((2L, "x y q"))
    val row = Drift.jsDivergence(a, b, "text", 512).first()
    assert(row.getLong(0) == 3L && row.getLong(1) == 3L)
    // distribution-identical 10× replica of each side: same js
    val a10 = (0 until 10).map(i => docs((i.toLong, "x y z")))
      .reduce(_ unionAll _)
    val b10 = (0 until 10).map(i => docs((100L + i, "x y q")))
      .reduce(_ unionAll _)
    assert(js(a10, b10) == js(a, b))
  }

  test("per-slice drift isolates the slice that moved") {
    import spark.implicits._
    val ref = docs((1L, "common stream of perfectly normal tokens here"),
      (2L, "more perfectly normal tokens in the stream"))
    val batch = Seq(
      (10L, "clean", "common stream of perfectly normal tokens here"),
      (11L, "clean", "more perfectly normal tokens in the stream"),
      (12L, "dirty", "casino bonus viagra spam pharma casino"),
      (13L, "dirty", "spam pharma bonus casino"))
      .toDF("doc_id", "slice", "text")
    val got = Drift.jsDivergenceBySlice(ref, batch, "text", "slice", 512)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("clean") < 0.01, s"undrifted slice near zero: ${got("clean")}")
    assert(got("dirty") > 0.6, s"drifted slice near ln2: ${got("dirty")}")
    // each slice's number equals the global js of that slice alone
    val dirtyAlone = js(ref,
      batch.where(col("slice") === "dirty").select("doc_id", "text"))
    assert(got("dirty") == dirtyAlone,
      "slice computation must equal the one-slice global computation")
  }

  test("numeric histogram: interior bins, underflow/overflow, null drop") {
    import spark.implicits._
    val df = Seq(Some(-5.0), Some(0.0), Some(9.99), Some(10.0), Some(55.0),
      Some(100.0), Some(250.0), None).toDF("v")
    val got = Drift.numericHistogram(df, "v", lo = 0.0, hi = 100.0, bins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -5 -> underflow; 0, 9.99 -> bin 0; 10 -> bin 1; 55 -> bin 5;
    // 100, 250 -> overflow; null dropped
    assert(got == Map(-1L -> 1L, 0L -> 2L, 1L -> 1L, 5L -> 1L, 10L -> 2L),
      got)
  }

  test("numeric drift: zero on identical data, grows with a planted shift") {
    import spark.implicits._
    val base = (0 until 500).map(i => (i % 100).toDouble).toDF("v")
    val same = Drift.jsDivergenceNumeric(base, base, "v", 0.0, 100.0, 20)
      .first()
    assert(same.getDouble(2) == 0.0, "identical numeric data drifts zero")
    def shifted(by: Double) =
      base.select((col("v") + lit(by)).as("v"))
    val small = Drift.jsDivergenceNumeric(base, shifted(10.0), "v",
      0.0, 100.0, 20).first().getDouble(2)
    val big = Drift.jsDivergenceNumeric(base, shifted(60.0), "v",
      0.0, 100.0, 20).first().getDouble(2)
    assert(small > 0.0 && big > small && big < math.log(2.0) + 1e-9,
      s"small=$small big=$big")
  }

  test("embeddingDrift: identical snapshots cosine 1 / shift 0; rotation drifts") {
    import spark.implicits._
    def vecs(rows: (Long, String, Seq[Float])*): DataFrame =
      rows.toDF("vec_id", "label", "embedding")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<float>").as("embedding"))
    val a = vecs(
      (1L, "x", Seq(1f, 0f, 0f)), (2L, "x", Seq(1f, 0.2f, 0f)),
      (3L, "y", Seq(0f, 1f, 0f)))
    val same = Drift.embeddingDrift(a, a, "embedding", "label", nDims = 3)
      .orderBy("label").collect()
    assert(same.forall(r => r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0))
    // y's snapshot rotates to the x axis: cosine collapses, shift ~ sqrt(2)
    val b = vecs(
      (1L, "x", Seq(1f, 0f, 0f)), (2L, "x", Seq(1f, 0.2f, 0f)),
      (3L, "y", Seq(1f, 0f, 0f)))
    val y = Drift.embeddingDrift(a, b, "embedding", "label", nDims = 3)
      .where(col("label") === "y").collect().head
    assert(y.getDouble(3) == 0.0 && math.abs(y.getDouble(4) - math.sqrt(2)) < 1e-6,
      s"$y")
    assert(y.getLong(1) == 1 && y.getLong(2) == 1)
  }
}
