package graft.streaming

import graft.SparkSpec
import graft.table.TableStore
import java.nio.file.Files

/** Late-data quarantine ingest: rows behind the running high-watermark by
  * more than the allowed lateness land in `<table>__late` (auditable,
  * replayable) instead of being silently dropped; the watermark itself is
  * durable store state, so lateness survives restarts. */
class StreamingLateDataSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.StringType)))

  test("late rows quarantine with batch id and lateness; watermark persists across runs") {
    val work = Files.createTempDirectory("graft_slate")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"event_id":$id,"ts":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def ingest(): Unit = StreamingIngest.lateDataIngestAvailableNow(
      spark, src.toString, schema, store, "events", ckpt,
      "ts", maxLatenessMs = 30L * 60 * 1000,
      onBatch = (b, on, late) => seen.synchronized { seen += ((b, on, late)); () })

    // batch 0: cold start — everything on time regardless of order
    write("f0.json", 1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 10:05:00")
    ingest()
    assert(store.scan("events").count() == 2 && !store.exists("events__late"))

    // batch 1: wm = 10:05, cutoff 09:35 — the 09:00 row is 35 min late
    write("f1.json", 3L -> "2024-01-01 10:10:00", 4L -> "2024-01-01 09:00:00")
    ingest()
    assert(store.scan("events").count() == 3)
    val late = store.scan("events__late").collect()
    assert(late.length == 1 && late.head.getLong(0) == 4L)
    val lateRow = store.scan("events__late")
      .select("batch_id", "late_by_ms").first()
    assert(lateRow.getLong(1) == 35L * 60 * 1000, s"$lateRow")

    // a fresh RUN (watermark read back from the store): wm = 10:10,
    // cutoff 09:40 — 10:04 is within lateness, 09:39 is not
    write("f2.json", 5L -> "2024-01-01 10:04:00", 6L -> "2024-01-01 09:39:00")
    ingest()
    assert(store.scan("events").count() == 4)
    assert(store.scan("events__late").count() == 2)
    assert(store.scan("events__wm").first().getLong(0) ==
      java.sql.Timestamp.valueOf("2024-01-01 10:10:00").getTime)

    // the quarantine is replayable: re-feed it as a source file once the
    // lateness budget is raised — nothing was lost
    val replay = store.scan("events__late").select("event_id").collect()
      .map(_.getLong(0)).toSet
    assert(replay == Set(4L, 6L))
    assert(seen.map(t => (t._2, t._3)).toList == List((2, 0), (1, 1), (1, 1)),
      seen.toList.toString)
  }
}
