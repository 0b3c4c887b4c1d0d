package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch: overcount-only estimates, partition invariance, and
  * argument validation. Cross-engine estimate equality is pinned by the
  * `ext_cms_counts` oracle gate. */
class SketchesSpec extends SparkSpec {

  private def stream = {
    import spark.implicits._
    // zipfish: item k appears 31-k times → 465 rows over 30 distinct items
    (1 to 30).flatMap(k => Seq.fill(31 - k)(s"item-$k")).toDF("item")
  }

  test("estimates never undercount and are exact without collisions") {
    val d = 4; val w = 2048
    val exact = stream.groupBy("item").agg(count(lit(1)).as("exact_n"))
    val sketch = Sketches.cmsSketch(stream, col("item"), d, w)
    val est = Sketches.cmsEstimate(exact, col("item"), sketch, d, w)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length == 30)
    est.foreach { case (item, ex, cms) =>
      assert(cms >= ex, s"$item: CMS must never undercount ($cms < $ex)")
    }
    // 30 items into 4 × 2048 buckets: the min over rows is collision-free
    // here (deterministic hashes — this is a fixture fact, not luck)
    assert(est.forall { case (_, ex, cms) => cms == ex },
      s"expected exact estimates at this width: ${est.filter(e => e._2 != e._3).toSeq}")
  }

  test("cmsJoinSize: >= exact join size, exact when collision-free, flags self-join skew") {
    import spark.implicits._
    val d = 4; val w = 2048
    // A: item-k appears k times for k in 1..20; B: item-k appears 2 times
    // for k in 11..30 → exact |A ⋈ B| = Σ_{k=11..20} k*2 = 310
    val a = (1 to 20).flatMap(k => Seq.fill(k)(s"item-$k")).toDF("item")
    val b = (11 to 30).flatMap(k => Seq.fill(2)(s"item-$k")).toDF("item")
    val est = Sketches.cmsJoinSize(
      Sketches.cmsSketch(a, col("item"), d, w),
      Sketches.cmsSketch(b, col("item"), d, w), d, w)
      .first().getDecimal(0).longValueExact()
    assert(est == 310L,
      s"collision-free at this width -> exact inner product: $est")
    // self-join size = F2 = Σ k² over A = 2870 — vs |A| = 210: the skew
    // signal (est(A⋈A) >> |A| means heavy keys)
    val sa = Sketches.cmsSketch(a, col("item"), d, w)
    val f2 = Sketches.cmsJoinSize(sa, sa, d, w)
      .first().getDecimal(0).longValueExact()
    assert(f2 == (1 to 20).map(k => k.toLong * k).sum, f2)
  }

  test("sketch is partition-invariant (merge == single-node fold)") {
    val a = Sketches.cmsSketch(stream.repartition(7), col("item"), 3, 512)
      .collect()(0).getSeq[Long](0)
    val b = Sketches.cmsSketch(stream.coalesce(1), col("item"), 3, 512)
      .collect()(0).getSeq[Long](0)
    assert(a == b, "elementwise merge must equal the sequential fold")
    assert(a.sum == 465L * 3, "every row lands once per hash row")
  }

  test("d/w bounds are validated at analysis time") {
    val e = intercept[Exception] {
      Sketches.cmsSketch(stream, col("item"), d = 0, w = 16).collect()
    }
    assert(e.getMessage.contains("graft_cms"), e.getMessage)
    val e2 = intercept[Exception] {
      Sketches.cmsSketch(stream, col("item"), d = 2, w = (1 << 23)).collect()
    }
    assert(e2.getMessage.contains("graft_cms"), e2.getMessage)
  }

  // ------------------------------------------------------------------
  // KMV / bottom-k theta sketches
  // ------------------------------------------------------------------

  private def items(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => s"doc-$i").toDF("item")
  }

  test("kmv: exact tier below k — the sketch IS the distinct hash set") {
    val df = items(0, 20)
    val s = Sketches.kmvSketch(df, col("item"), k = 64)
      .collect()(0).getSeq[Long](0)
    assert(s.length == 20 && s == s.sorted && s.distinct.length == 20)
    val est = Sketches.kmvSketch(df, col("item"), 64)
      .select(Sketches.kmvDistinct(col("kmv"), 64)).collect()(0).getDouble(0)
    assert(est == 20.0, s"below k the distinct estimate is exact: $est")
    // duplicated rows change nothing (distinct semantics)
    val s2 = Sketches.kmvSketch(df.union(df).union(df), col("item"), 64)
      .collect()(0).getSeq[Long](0)
    assert(s2 == s)
  }

  test("kmv: partition-invariant (merge == single-node fold)") {
    val df = items(0, 5000)
    val a = Sketches.kmvSketch(df.repartition(13), col("item"), 256)
      .collect()(0).getSeq[Long](0)
    val b = Sketches.kmvSketch(df.coalesce(1), col("item"), 256)
      .collect()(0).getSeq[Long](0)
    assert(a == b, "bottom-k merge must equal the sequential fold")
    assert(a.length == 256)
  }

  test("kmv: distinct estimate lands within 4σ at 20k items, k=256") {
    val est = Sketches.kmvSketch(items(0, 20000), col("item"), 256)
      .select(Sketches.kmvDistinct(col("kmv"), 256)).collect()(0).getDouble(0)
    // σ ≈ n/√(k−2) ≈ 1255; deterministic fixture, tolerance documents the
    // estimator class rather than luck
    assert(math.abs(est - 20000.0) < 5020.0, s"estimate off: $est")
  }

  test("kmv: overlap composition — exact below k, calibrated above") {
    // A = [0, 300), B = [200, 500): |A∩B| = 100, |A∪B| = 500
    val a = Sketches.kmvSketch(items(0, 300), col("item"), 1024).select(col("kmv").as("a"))
    val b = Sketches.kmvSketch(items(200, 500), col("item"), 1024).select(col("kmv").as("b"))
    val exact = a.crossJoin(b)
      .select(Sketches.kmvOverlap(col("a"), col("b"), 1024).as("o"))
      .select(col("o.est_inter"), col("o.est_union"), col("o.jaccard"))
      .collect()(0)
    assert(exact.getDouble(0) == 100.0 && exact.getDouble(1) == 500.0,
      s"both slices under k → exact set arithmetic: $exact")
    assert(exact.getDouble(2) == 100.0 / 500.0)
    // saturated: A = [0, 30000), B = [20000, 50000): inter 10k, union 50k
    val sa = Sketches.kmvSketch(items(0, 30000), col("item"), 512).select(col("kmv").as("a"))
    val sb = Sketches.kmvSketch(items(20000, 50000), col("item"), 512).select(col("kmv").as("b"))
    val est = sa.crossJoin(sb)
      .select(Sketches.kmvOverlap(col("a"), col("b"), 512).as("o"))
      .select(col("o.est_inter"), col("o.est_union"), col("o.jaccard"))
      .collect()(0)
    assert(math.abs(est.getDouble(0) - 10000.0) < 3000.0, s"inter: $est")
    assert(math.abs(est.getDouble(1) - 50000.0) < 9000.0, s"union: $est")
    assert(math.abs(est.getDouble(2) - 0.2) < 0.05, s"jaccard: $est")
  }

  test("kmv: k bound validated; SQL surface registered") {
    val e = intercept[Exception] {
      Sketches.kmvSketch(stream, col("item"), k = 0).collect()
    }
    assert(e.getMessage.contains("graft_kmv"), e.getMessage)
    stream.createOrReplaceTempView("kmv_stream")
    val viaSql = spark.sql("SELECT graft_kmv(item, 8) FROM kmv_stream")
      .collect()(0).getSeq[Long](0)
    assert(viaSql.length == 8 && viaSql == viaSql.sorted)
  }
}
