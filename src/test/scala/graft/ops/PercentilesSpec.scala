package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PercentilesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def data = (1 to 1000).map(i => (s"g${i % 3}", i.toDouble))
    .toDF("g", "v")

  test("exact tier matches Spark's exact percentile") {
    val got = Percentiles.grouped(data, Seq("g"), "v",
      Seq("p50" -> 0.5, "p90" -> 0.9), exact = true)
      .orderBy("g").collect()
    val want = data.groupBy("g")
      .agg(count(lit(1)).as("n"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"))
      .orderBy("g").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("approx tier is close to exact on uniform data") {
    val approx = Percentiles.grouped(data, Seq("g"), "v",
      Seq("p50" -> 0.5), exact = false)
      .orderBy("g").collect().map(_.getDouble(2))
    val exact = Percentiles.grouped(data, Seq("g"), "v",
      Seq("p50" -> 0.5), exact = true)
      .orderBy("g").collect().map(_.getDouble(2))
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= e * 0.02, s"approx $a too far from exact $e")
    }
  }

  test("production tier plans the sketch, not the exact buffering aggregate") {
    val p = Percentiles.grouped(data, Seq("g"), "v",
      Seq("p50" -> 0.5), exact = false)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("approx_percentile") || p.contains("percentile_approx"),
      s"sketch tier must plan ApproximatePercentile:\n$p")
    assert(!p.matches("(?s).*\\bpercentile\\(.*"),
      s"sketch tier must not contain the exact value-buffering percentile:\n$p")
    // mergeable sketch ⇒ map-side partial aggregation must appear
    assert(p.contains("partial_approx_percentile"),
      s"sketch must partial-aggregate map-side:\n$p")
  }

  test("exact tier (gate/oracle use) still plans exact percentile") {
    val p = Percentiles.grouped(data, Seq("g"), "v",
      Seq("p50" -> 0.5), exact = true)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("percentile(") && !p.contains("approx_percentile"))
  }

  test("exactGlobal: discrete rank-pick semantics, duplicates, nulls, p=1") {
    // values 1..10 with 5 duplicated thrice (n=12); null excluded
    val df = ((1 to 10) ++ Seq(5, 5)).map(v => Some(v.toDouble))
      .appended(Option.empty[Double]).toDF("v")
    val r = Percentiles.exactGlobal(df, "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p100" -> 1.0)).collect().head
    assert(r.getLong(0) == 12)
    // sorted: 1 2 3 4 5 5 5 6 7 8 9 10; rank ceil(.25*12)=3 -> 3,
    // ceil(.5*12)=6 -> 5, rank 12 -> 10
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 5.0 &&
      r.getDouble(3) == 10.0)
    // agrees with Spark's exact buffering aggregate at the same ranks
    val want = df.agg(expr("percentile(v, 0.5)")).first().getDouble(0)
    assert(math.abs(want - 5.0) < 0.5001) // interpolating vs discrete: near
  }

  test("exactGrouped: per-group rank picks match per-group exactGlobal") {
    val df = data // g0/g1/g2 over 1..1000
    val got = Percentiles.exactGrouped(df, Seq("g"), "v",
      Seq("p50" -> 0.5, "p90" -> 0.9)).orderBy("g").collect()
    assert(got.length == 3)
    for (r <- got) {
      val g = r.getString(0)
      val want = Percentiles.exactGlobal(df.where(col("g") === g), "v",
        Seq("p50" -> 0.5, "p90" -> 0.9)).collect().head
      assert(r.getLong(1) == want.getLong(0) &&
        r.getDouble(2) == want.getDouble(1) &&
        r.getDouble(3) == want.getDouble(2), s"group $g: $r vs $want")
    }
  }
}
