package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared two-pass running-sum primitive: must agree with the naive
  * unpartitioned window on every input shape it replaces. */
class PrefixSumSpec extends SparkSpec {

  test("running sums match a single-partition cumulative reference") {
    val df = spark.range(0, 10000, 1, 16).select(
      (col("id") * 37 % 1000).as("k"),
      (col("id") % 7).as("a"),
      (col("id") % 3).as("b"))
      .groupBy("k").agg(sum("a").as("a"), sum("b").as("b"))
    val got = PrefixSum.running(df, Seq(col("k")),
        Seq("a" -> "ca", "b" -> "cb"))
      .orderBy("k").collect()
    // reference: driver-side cumulative over the sorted rows
    val base = df.orderBy("k").collect()
    var (sa, sb) = (0L, 0L)
    base.zip(got).foreach { case (r, g) =>
      sa += r.getLong(1); sb += r.getLong(2)
      assert(g.getLong(0) == r.getLong(0))
      assert(g.getAs[Long]("ca") == sa, s"ca at k=${r.getLong(0)}")
      assert(g.getAs[Long]("cb") == sb, s"cb at k=${r.getLong(0)}")
    }
  }

  test("descending order and exclusive-by-subtraction") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val got = PrefixSum.running(df, Seq(col("k").desc), Seq("v" -> "cv"))
      .withColumn("ex", col("cv") - col("v"))
      .orderBy(col("k").desc).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("cv"), r.getAs[Long]("ex")))
    assert(got.toSeq == Seq((3L, 30L, 0L), (2L, 50L, 30L), (1L, 60L, 50L)))
  }

  test("empty input yields the columns, zero rows") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    val got = PrefixSum.running(df, Seq(col("k")), Seq("v" -> "cv"))
    assert(got.columns.toSeq == Seq("k", "v", "cv"))
    assert(got.count() == 0L)
  }

  test("plans without an unpartitioned window") {
    val df = spark.range(0, 1000, 1, 8).select(col("id").as("k"),
      lit(1L).as("v"))
    val out = PrefixSum.running(df, Seq(col("k")), Seq("v" -> "cv"))
    val bad = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "PrefixSum must never plan a global window")
  }
}
