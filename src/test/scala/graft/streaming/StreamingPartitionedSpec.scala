package graft.streaming

import graft.SparkSpec
import graft.table.TableStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import java.nio.file.Files

/** Partitioned streaming ingest + standing retention: batches land as
  * hive-partitioned snapshots, scans prune by directory, the expiry
  * sweep is O(metadata), and checkpoint restarts re-ingest nothing. */
class StreamingPartitionedSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("day", StringType),
    StructField("v", LongType)))

  private def writeBatch(src: java.nio.file.Path, name: String,
      rows: Seq[(Long, String, Long)]): Unit = {
    Files.writeString(src.resolve(name), rows.map { case (k, d, v) =>
      s"""{"k":$k,"day":"$d","v":$v}"""
    }.mkString("\n")); ()
  }

  test("batches land partitioned; retention expires old days; restart is a no-op") {
    val work = Files.createTempDirectory("graft_spart_spec")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    def ingest(): Unit =
      StreamingIngest.partitionedIngestAvailableNow(spark, src.toString,
        schema, "json", store, "t", work.resolve("ckpt").toString, Seq("day"))

    writeBatch(src, "b0.json",
      (1L to 20L).map(k => (k, if (k % 2 == 0) "2026-01-01" else "2026-01-02", k)))
    ingest()
    writeBatch(src, "b1.json",
      (21L to 30L).map(k => (k, "2026-01-03", k)))
    ingest()
    assert(store.scan("t").count() == 30)
    // two batches → two hive-partitioned snapshots; day predicate prunes
    val plan = store.scan("t").where(col("day") === "2026-01-03")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day") ||
      plan.contains("PartitionFilters: [(day"), plan)
    assert(store.partitionValues("t", "day") ==
      Seq("2026-01-01", "2026-01-02", "2026-01-03"))

    // standing retention: ISO dates sort lexicographically
    assert(store.expirePartitionsBelow("t", "day", "2026-01-02"))
    assert(store.scan("t").where(col("day") === "2026-01-01").count() == 0)
    assert(store.scan("t").count() == 30 - 10)
    assert(store.partitionValues("t", "day") ==
      Seq("2026-01-02", "2026-01-03"))
    // idempotent: nothing below the cutoff remains
    assert(!store.expirePartitionsBelow("t", "day", "2026-01-02"))

    // checkpoint restart with no new files: nothing re-ingests, the
    // expired day does NOT resurrect
    ingest()
    assert(store.scan("t").count() == 20)
    assert(store.partitionValues("t", "day") ==
      Seq("2026-01-02", "2026-01-03"))
  }

  test("standing compaction folds the micro-batch chain, layout preserved") {
    val work = Files.createTempDirectory("graft_spart_compact")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    def ingest(): Unit =
      StreamingIngest.partitionedIngestAvailableNow(spark, src.toString,
        schema, "json", store, "t", work.resolve("ckpt").toString,
        Seq("day"), compactAfterSnapshots = Some(1))
    (0 until 3).foreach { i =>
      writeBatch(src, s"b$i.json",
        (1L to 10L).map(k => (i * 100 + k, s"2026-01-0${i + 1}", k)))
      ingest()
    }
    // the chain folded back each time it crossed the threshold
    assert(store.manifestEntries("t").sizeIs <= 2,
      s"chain must fold: ${store.manifestEntries("t")}")
    assert(store.scan("t").count() == 30)
    // and the fold PRESERVED the hive layout: retention still O(metadata)
    assert(store.partitionValues("t", "day").sizeIs == 3)
    assert(store.expirePartitionsBelow("t", "day", "2026-01-02"))
    assert(store.scan("t").count() == 20)
  }

  test("derive computes the partition column before the write") {
    val work = Files.createTempDirectory("graft_spart_derive")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    writeBatch(src, "b0.json", Seq((1L, "x", 1700000000L), (2L, "x", 1700090000L)))
    StreamingIngest.partitionedIngestAvailableNow(spark, src.toString,
      schema, "json", store, "t", work.resolve("ckpt").toString,
      Seq("date"),
      derive = _.withColumn("date",
        date_format(timestamp_seconds(col("v")), "yyyy-MM-dd")))
    assert(store.partitionValues("t", "date").sizeIs == 2)
    assert(store.scan("t").columns.contains("date"))
  }
}
