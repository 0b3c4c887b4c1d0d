package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Streaming funnel: two-scalar state per user, cross-batch stage
  * continuation, strict-time advance, and final-state equivalence with
  * the batch funnel over the concatenated stream. */
class StreamingFunnelSpec extends SparkSpec {

  test("stages continue across batches; final state == batch funnel") {
    val work = Files.createTempDirectory("graft_streamfunnel")
    val src = work.resolve("in"); Files.createDirectories(src)
    val ckpt = work.resolve("ckpt").toString
    val steps = Seq("view", "click", "buy")
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    val latest = scala.collection.mutable.Map.empty[Long, (Long, Option[Long])]
    def run(): Unit = {
      import spark.implicits._
      val stream = spark.readStream.schema(st).option("header", true)
        .csv(src.toString).as[FunnelEvent]
      val q = StreamingIngest.streamingFunnel(stream, steps)
        .writeStream
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelProgress], _: Long) =>
          latest.synchronized {
            b.collect().foreach(p => latest(p.user_id) = (p.stage, p.t_last))
          }
          ()
        }
        .start()
      q.awaitTermination()
    }

    // batch 1: user 1 reaches stage 2 (disorder inside the batch is
    // sorted); user 2 stalls at 0 (click before any view); user 3 view
    Files.writeString(src.resolve("a.csv"),
      """user_id,ts,event_type
        |1,20,click
        |1,10,view
        |2,10,click
        |3,10,view
        |3,10,click
        |""".stripMargin)
    run()
    assert(latest(1L) == ((2L, Some(20L))), latest)
    assert(latest(2L) == ((0L, None)), latest)
    // simultaneous view+click must not advance past stage 1
    assert(latest(3L) == ((1L, Some(10L))), latest)

    // batch 2: user 1 completes; user 2's view arrives, later click
    // advances; user 3's strictly-later click advances
    Files.writeString(src.resolve("b.csv"),
      """user_id,ts,event_type
        |1,30,buy
        |2,20,view
        |2,30,click
        |3,40,click
        |""".stripMargin)
    run()
    assert(latest(1L) == ((3L, Some(30L))), latest)
    assert(latest(2L) == ((2L, Some(30L))), latest)
    assert(latest(3L) == ((2L, Some(40L))), latest)

    // equivalence: final streamed state == batch funnel over everything
    import spark.implicits._
    val all = Seq(
      (1L, 20L, "click"), (1L, 10L, "view"), (2L, 10L, "click"),
      (3L, 10L, "view"), (3L, 10L, "click"),
      (1L, 30L, "buy"), (2L, 20L, "view"), (2L, 30L, "click"),
      (3L, 40L, "click")).toDF("u", "t", "e")
    val batch = graft.ops.TimeSeries.funnel(all, "u", "t", "e", steps)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(latest.toMap == batch, s"stream $latest vs batch $batch")
  }
}
