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
}
