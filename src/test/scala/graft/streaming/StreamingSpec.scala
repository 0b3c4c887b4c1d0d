package graft.streaming

import graft.SparkSpec
import graft.schema.{FieldConstraints, FrictionlessField, FrictionlessSchema, TypeMapping}
import graft.table.TableStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  private val schema = FrictionlessSchema(List(
    FrictionlessField("id", "integer", constraints = FieldConstraints(unique = true)),
    FrictionlessField("v", "string")))

  test("availableNow ingest: merge per micro-batch, checkpoint resume, idempotent") {
    val work = Files.createTempDirectory("graft_streamspec")
    val src = work.resolve("in"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("tables").toString)
    val st = TypeMapping.toStructType(schema)
    def run(): Unit = StreamingIngest.ingestAvailableNow(
      spark, src.toString, st, "csv", store, "t",
      work.resolve("ckpt").toString, uniqueKeys = Seq("id"))

    Files.writeString(src.resolve("a.csv"), "id,v\n1,x\n2,y\n")
    run()
    assert(store.scan("t").count() == 2)

    Files.writeString(src.resolve("b.csv"), "id,v\n2,CHANGED\n3,z\n")
    run()
    val rows = store.scan("t").orderBy("id")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "x"), (2L, "CHANGED"), (3L, "z")))

    val before = store.scan("t").orderBy("id").collect().toSeq
    run() // nothing new
    assert(store.scan("t").orderBy("id").collect().toSeq == before)
  }

  test("streaming dedup within watermark drops repeated keys, evicts old state") {
    val work = Files.createTempDirectory("graft_streamdedup")
    val src = work.resolve("in"); Files.createDirectories(src)
    Files.writeString(src.resolve("e.csv"),
      """ts,k,v
        |2024-01-01 00:00:00,a,1
        |2024-01-01 00:01:00,a,2
        |2024-01-01 00:02:00,b,3
        |2024-01-01 00:03:00,a,4
        |""".stripMargin)
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.IntegerType)))
    val stream = spark.readStream.schema(st).option("header", true).csv(src.toString)
    val deduped = StreamingIngest.dedupWithinWatermark(stream, "ts", "10 minutes", Seq("k"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("dedup_out").orderBy("k")
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a", 1), ("b", 3)), out.toSeq.toString)
  }

  test("flatMapGroupsWithState: running per-source counters persist across restarts") {
    val work = Files.createTempDirectory("graft_streamstate")
    val src = work.resolve("in"); Files.createDirectories(src)
    val ckpt = work.resolve("ckpt").toString
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tokens", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def run(): Unit = {
      import spark.implicits._
      val stream = spark.readStream.schema(st).option("header", true)
        .csv(src.toString).as[DocEvent]
      val q = StreamingIngest.runningSourceStats(stream)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[SourceRunning], _: Long) =>
          collected.synchronized {
            collected ++= batch.collect().map(r => (r.source, r.docs, r.tokens))
          }
          ()
        }
        .start()
      q.awaitTermination()
    }

    Files.writeString(src.resolve("a.csv"),
      """source,tokens,ts
        |web,4,2024-01-01 00:00:00
        |web,6,2024-01-01 00:01:00
        |books,3,2024-01-01 00:02:00
        |""".stripMargin)
    run()
    assert(collected.sortBy(_._1).toSeq == Seq(("books", 1L, 3L), ("web", 2L, 10L)))

    collected.clear()
    Files.writeString(src.resolve("b.csv"), "source,tokens,ts\nweb,5,2024-01-01 00:30:00\n")
    run() // state must resume from the checkpoint: counts are CUMULATIVE
    assert(collected.toSeq == Seq(("web", 3L, 15L)))

    // push the watermark far past books' idle timeout (2h gap), then feed
    // books again: its counters must have been EVICTED and restart from zero
    collected.clear()
    Files.writeString(src.resolve("c.csv"), "source,tokens,ts\nweb,1,2024-01-03 00:00:00\n")
    run()
    collected.clear()
    Files.writeString(src.resolve("d.csv"), "source,tokens,ts\nbooks,7,2024-01-03 00:10:00\n")
    run()
    assert(collected.toSeq == Seq(("books", 1L, 7L)),
      s"books state must restart after watermark-based eviction, got $collected")
  }

  test("windowed agg works in genuine streaming mode with watermark") {
    val work = Files.createTempDirectory("graft_streamwin")
    val src = work.resolve("in"); Files.createDirectories(src)
    Files.writeString(src.resolve("e.csv"),
      """ts,k,v
        |2024-01-01 00:05:00,a,1.0
        |2024-01-01 00:10:00,a,2.0
        |2024-01-01 01:05:00,a,4.0
        |2024-01-01 00:20:00,b,8.0
        |""".stripMargin)
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(st).option("header", true).csv(src.toString)
    val agg = StreamingIngest.tumblingAggStreaming(
      stream, "ts", "1 hour", "2 hours", Seq("k"),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
    val q = agg.writeStream
      .format("memory").queryName("win_out").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("win_out").orderBy("window_start", "k")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", "a", 2L, 3.0),
      ("2024-01-01 00:00:00.0", "b", 1L, 8.0),
      ("2024-01-01 01:00:00.0", "a", 1L, 4.0)))
  }

  test("heavy hitters: per-micro-batch count deltas merged by sum rank " +
    "identically to one batch pass") {
    val work = Files.createTempDirectory("graft_hhspec")
    val src = work.resolve("in"); Files.createDirectories(src)
    val state = work.resolve("state").toString
    // skewed traffic split across two files => two micro-batches, with
    // user 7's hour-0 events split ACROSS the batches (the merge must sum)
    def line(ts: String, u: Long) = s"$ts,$u"
    Files.writeString(src.resolve("a.csv"),
      ("ts,user_id" +: (Seq.fill(3)(line("2024-01-01 00:05:00", 7L)) ++
        Seq(line("2024-01-01 00:10:00", 1L), line("2024-01-01 00:15:00", 2L),
          line("2024-01-01 01:05:00", 7L)))).mkString("", "\n", "\n"))
    Files.writeString(src.resolve("b.csv"),
      ("ts,user_id" +: (Seq.fill(2)(line("2024-01-01 00:25:00", 7L)) ++
        Seq(line("2024-01-01 00:30:00", 3L), line("2024-01-01 00:35:00", 4L),
          line("2024-01-01 00:40:00", 5L), line("2024-01-01 00:45:00", 6L),
          line("2024-01-01 01:20:00", 8L)))).mkString("", "\n", "\n"))
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(st).option("header", true)
      .option("maxFilesPerTrigger", 1).csv(src.toString)
      .writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingIngest.windowKeyCounts(batch, "ts", "1 hour", "user_id")
          .select(col("window.start").as("ws"), col("user_id"), col("n"))
          .write.mode("append").parquet(state)
        ()
      }
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(state).count() >
      spark.read.parquet(state).select("ws", "user_id").distinct().count(),
      "split key must appear as multiple deltas — else the merge is untested")
    val incremental = StreamingIngest.rankHeavyHitters(
      spark.read.parquet(state)
        .groupBy("ws", "user_id").agg(sum(col("n")).as("n"))
        .select(struct(col("ws").as("start")).as("window"), col("user_id"), col("n")),
      "user_id", k = 5)
    val oneShot = StreamingIngest.heavyHitters(
      spark.read.schema(st).option("header", true).csv(src.toString),
      "ts", "1 hour", "user_id", k = 5)
    val a = incremental.orderBy("window_start", "rank").collect().map(_.toSeq)
    val b = oneShot.orderBy("window_start", "rank").collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    // hour 0: user 7 holds 5 of 11 events => rank 1, share 5e6 div 11 ppm
    val top = b.head
    assert(top(1) == 7L && top(2) == 1 && top(3) == 5L && top(5) == 454545L)
  }
}
