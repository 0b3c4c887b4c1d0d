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
}
