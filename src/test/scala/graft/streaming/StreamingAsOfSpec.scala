package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Streaming as-of attribution: exactly-once emission once the watermark
  * passes the purchase, cross-batch state, timeout-driven finalization of
  * idle users, and the mature-click collapse (bounded state). */
class StreamingAsOfSpec extends SparkSpec {

  private def ms(s: String): Long = java.sql.Timestamp.valueOf(s).getTime

  test("purchases finalize when the watermark passes; idle users via timeout") {
    val work = Files.createTempDirectory("graft_streamasof")
    val src = work.resolve("in"); Files.createDirectories(src)
    val ckpt = work.resolve("ckpt").toString
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[Long])]
    def run(): Seq[(Long, Long, Option[Long])] = {
      collected.clear()
      import spark.implicits._
      val stream = spark.readStream.schema(st).option("header", true)
        .csv(src.toString).as[InteractionEvent]
      val q = StreamingIngest.streamingAsOf(stream,
          watermark = "10 minutes", idleGapMs = 30L * 60 * 1000)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AttributedPurchase], _: Long) =>
          collected.synchronized {
            collected ++= b.collect().map(r => (r.user_id, r.purchase_ms, r.click_ms))
          }
          ()
        }
        .start()
      q.awaitTermination()
      collected.sortBy(r => (r._1, r._2)).toSeq
    }

    // user 1: click 00:00 → purchase 00:05 → click 00:10 (red herring: after
    // the purchase); user 2: purchase with no clicks at all
    Files.writeString(src.resolve("a.csv"),
      """user_id,kind,ts
        |1,click,2024-01-01 00:00:00
        |1,purchase,2024-01-01 00:05:00
        |1,click,2024-01-01 00:10:00
        |2,purchase,2024-01-01 00:05:00
        |""".stripMargin)
    assert(run() == Nil, "watermark still 0 — nothing may finalize")

    // user 1's click advances the watermark to 00:50 post-batch; the drain
    // then runs a timeout batch where user 2 (idle since 00:05, timeout
    // armed at 00:35) finalizes with no click
    Files.writeString(src.resolve("b.csv"), "user_id,kind,ts\n1,click,2024-01-01 01:00:00\n")
    assert(run() == Seq((2L, ms("2024-01-01 00:05:00"), None)))

    // watermark unchanged (00:50) and user 1's timeout re-armed to 01:30 —
    // nothing fires
    Files.writeString(src.resolve("c.csv"), "user_id,kind,ts\n3,click,2024-01-01 01:00:00\n")
    assert(run() == Nil)

    // watermark 02:50 > user 1's timeout (01:30): its purchase finalizes
    // against the latest click AT-OR-BEFORE it (00:00), not the later ones
    Files.writeString(src.resolve("d.csv"), "user_id,kind,ts\n3,click,2024-01-01 03:00:00\n")
    assert(run() == Seq((1L, ms("2024-01-01 00:05:00"), Some(ms("2024-01-01 00:00:00")))))

    // nothing emits twice
    Files.writeString(src.resolve("e.csv"), "user_id,kind,ts\n3,click,2024-01-01 03:10:00\n")
    assert(run() == Nil)
  }

  test("inclusive tie and cross-batch mature-click collapse") {
    val work = Files.createTempDirectory("graft_streamasof2")
    val src = work.resolve("in"); Files.createDirectories(src)
    val ckpt = work.resolve("ckpt").toString
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[Long])]
    def run(): Seq[(Long, Long, Option[Long])] = {
      collected.clear()
      import spark.implicits._
      val stream = spark.readStream.schema(st).option("header", true)
        .csv(src.toString).as[InteractionEvent]
      val q = StreamingIngest.streamingAsOf(stream,
          watermark = "1 minute", idleGapMs = 5L * 60 * 1000)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AttributedPurchase], _: Long) =>
          collected.synchronized {
            collected ++= b.collect().map(r => (r.user_id, r.purchase_ms, r.click_ms))
          }
          ()
        }
        .start()
      q.awaitTermination()
      collected.sortBy(r => (r._1, r._2)).toSeq
    }

    // click exactly AT the purchase timestamp must win (inclusive <=)
    Files.writeString(src.resolve("a.csv"),
      """user_id,kind,ts
        |7,click,2024-01-01 00:00:00
        |7,click,2024-01-01 00:02:00
        |7,purchase,2024-01-01 00:02:00
        |""".stripMargin)
    assert(run() == Nil)
    // click at 00:05: during this data batch wm = 00:01, so the 00:00 click
    // collapses to `mature` while the purchase stays pending — exercising
    // the cross-batch collapse path
    Files.writeString(src.resolve("b.csv"), "user_id,kind,ts\n7,click,2024-01-01 00:05:00\n")
    assert(run() == Nil)
    // next data batch runs at wm = 00:04 ≥ purchase: finalize with the
    // inclusive tie — the click AT 00:02 wins over the collapsed 00:00
    Files.writeString(src.resolve("c.csv"), "user_id,kind,ts\n7,click,2024-01-01 00:12:00\n")
    val afterC = run()
    assert(afterC == Seq((7L, ms("2024-01-01 00:02:00"), Some(ms("2024-01-01 00:02:00")))),
      afterC.toString)
  }
}
