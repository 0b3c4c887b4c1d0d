package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

class MergeSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2026-02-02 00:00:00")

  private val schema = StructType(Seq(
    StructField("_id", LongType), StructField("k", LongType),
    StructField("v", StringType), StructField("_updated_at", TimestampType)))
  private val stageSchema = StructType(Seq(
    StructField("_id", LongType), StructField("k", LongType),
    StructField("v", StringType)))

  private def targetDf = spark.createDataFrame(
    java.util.List.of(
      Row(1L, 10L, "a", t0),
      Row(2L, 20L, "b", t0),
      Row(3L, 30L, "c", t0)),
    schema)

  private def stageDf = spark.createDataFrame(
    java.util.List.of(
      Row(101L, 20L, "b", null),        // matched, unchanged (v identical)
      Row(102L, 30L, "CHANGED", null),  // matched, changed
      Row(103L, 40L, "new", null),      // insert
      Row(104L, 40L, "new-dup", null)), // duplicate key in stage → deduped
    StructType(stageSchema.fields :+ StructField("_updated_at", TimestampType)))
    .select("_id", "k", "v")

  private def spec(strategy: Merge.MergeStrategy) = Merge.MergeSpec(
    uniqueKeys = Seq("k"), strategy = strategy)

  for (strategy <- Seq(Merge.MergeStrategy.BroadcastStage, Merge.MergeStrategy.FullOuter)) {
    test(s"merge semantics ($strategy): changed/unchanged/insert/preserve") {
      val out = Merge.merge(targetDf, stageDf, t1, spec(strategy))
        .orderBy("k").collect()

      assert(out.length == 4)
      // k=10: target-only, untouched
      assert(out(0) == Row(1L, 10L, "a", t0))
      // k=20: matched-unchanged → entire target row kept (old ts!)
      assert(out(1) == Row(2L, 20L, "b", t0))
      // k=30: matched-changed → stage value, NEW ts, PRESERVED target _id
      assert(out(2) == Row(3L, 30L, "CHANGED", t1))
      // k=40: insert → stage _id 103 (lowest _id wins dedup), new ts
      assert(out(3) == Row(103L, 40L, "new", t1))
    }

    test(s"merge is idempotent ($strategy): re-merging same stage changes nothing") {
      val once = Merge.merge(targetDf, stageDf, t1, spec(strategy))
      val twice = Merge.merge(once, stageDf,
        Timestamp.valueOf("2026-03-03 00:00:00"), spec(strategy))
      assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
    }
  }

  test("missing key column in stage is a hard error") {
    val e = intercept[IllegalArgumentException] {
      Merge.merge(targetDf, stageDf.drop("k"), t1, spec(Merge.MergeStrategy.FullOuter))
    }
    assert(e.getMessage.contains("not found in stage"))
  }

  test("no updatable columns is a hard error") {
    intercept[IllegalArgumentException] {
      Merge.merge(targetDf, stageDf.select("_id", "k"), t1,
        spec(Merge.MergeStrategy.FullOuter))
    }
  }

  test("dedupStage keeps the lowest-order row per key") {
    val out = Merge.dedupStage(stageDf, Seq("k"), Some("_id"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(101L, 102L, 103L))
  }

  test("stage with extra column not in target: extra col ignored for update") {
    val stagePlus = stageDf.withColumn("extra",
      org.apache.spark.sql.functions.lit("x"))
    val out = Merge.merge(targetDf, stagePlus, t1,
      spec(Merge.MergeStrategy.FullOuter)).orderBy("k").collect()
    assert(out.length == 4)
    assert(out(2) == Row(3L, 30L, "CHANGED", t1)) // still merges on shared cols
  }
}
