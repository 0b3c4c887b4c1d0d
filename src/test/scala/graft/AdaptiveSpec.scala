package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Runtime-adaptivity gates: the 100 TB levers the session enables —
  * AQE skew-join splitting, dynamic partition pruning, and post-shuffle
  * coalescing — must actually ENGAGE on representative shapes, not just
  * sit in the config. Each test inspects the final adaptive plan after
  * execution. */
class AdaptiveSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    // 2M-row fact, ~95% of rows on one key; the thresholds are lowered to
    // test scale but the MECHANISM is exactly what saves a 100 TB hot key
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      val fact = spark.range(0, 2000000L, 1, 32)
        .select(when(col("id") % 20 === 0, col("id") % 1000)
          .otherwise(lit(777L)).as("k"), col("id").as("v"))
      val dim = spark.range(0, 1000L).select(col("id").as("k"), (col("id") * 2).as("w"))
      // keyless aggregate downstream: a groupBy on the join key would make
      // AQE DECLINE the split (it preserves required partitioning unless
      // forceOptimizeSkewedJoin) — also worth knowing at 100 TB
      val joined = fact.join(dim, "k").agg(sum("v").as("sv"))
      assert(joined.collect().head.getLong(0) == 1999999000000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"skewed join must be split at runtime:\n$plan")
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    spark.range(0, 100000L, 1, 8)
      .select(col("id").as("v"), (col("id") % 20).as("p"))
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(0, 20L)
      .select(col("id").as("p"), when(col("id") < 3, "keep").otherwise("drop").as("tag"))
      .where(col("tag") === "keep")
    val joined = fact.join(dim, "p").agg(count(lit(1)).as("n"))
    assert(joined.collect().head.getLong(0) == 15000L)
    val plan = joined.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition pruning filter:\n$plan")
  }

  test("AQE coalesces an over-partitioned shuffle (AQEShuffleRead in final plan)") {
    val tiny = spark.range(0, 1000L, 1, 8)
      .groupBy(col("id") % 10).agg(count(lit(1)))
    assert(tiny.collect().length == 10)
    val plan = tiny.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"32 shuffle partitions of tiny data must coalesce:\n$plan")
  }
}
