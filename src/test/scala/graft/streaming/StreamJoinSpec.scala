package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Watermarked stream-stream interval join: streaming output equals the
  * batch plan of the same function on in-order data; rows later than the
  * watermark are dropped (bounded state, the documented tradeoff). */
class StreamJoinSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType)))

  private def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime

  test("stream output == batch join; state bounded by watermark+range") {
    val work = Files.createTempDirectory("graft_ssjoin")
    val pDir = work.resolve("p"); Files.createDirectories(pDir)
    val cDir = work.resolve("c"); Files.createDirectories(cDir)
    val ckpt = work.resolve("ckpt").toString

    Files.writeString(pDir.resolve("p.csv"),
      """user_id,ts
        |1,2024-01-01 00:10:00
        |1,2024-01-01 00:30:00
        |2,2024-01-01 00:10:00
        |""".stripMargin)
    Files.writeString(cDir.resolve("c.csv"),
      """user_id,ts
        |1,2024-01-01 00:05:00
        |1,2024-01-01 00:09:00
        |1,2024-01-01 00:29:00
        |2,2024-01-01 00:10:00
        |3,2024-01-01 00:08:00
        |""".stripMargin)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = StreamingIngest.streamStreamWindowJoin(
        spark.readStream.schema(schema).option("header", true).csv(pDir.toString),
        spark.readStream.schema(schema).option("header", true).csv(cDir.toString),
        watermark = "10 minutes", windowSeconds = 600L)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= b.collect().map(r =>
            (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(3).getTime))
        }
        ()
      }
      .start()
    q.awaitTermination()

    val batch = StreamingIngest.streamStreamWindowJoin(
      spark.read.schema(schema).option("header", true).csv(pDir.toString),
      spark.read.schema(schema).option("header", true).csv(cDir.toString))
      .collect().map(r =>
        (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(3).getTime)).toSet

    // expected pairs: user1 purchase 00:10 ← clicks 00:05 (in-window? 00:10
    // - 10min = 00:00, yes) and 00:09; user1 purchase 00:30 ← click 00:29
    // (00:05/00:09 are outside its window); user2 00:10 ← click 00:10
    // (inclusive upper bound); user3 click matches nothing
    val expected = Set(
      (1L, ms("2024-01-01 00:10:00"), ms("2024-01-01 00:05:00")),
      (1L, ms("2024-01-01 00:10:00"), ms("2024-01-01 00:09:00")),
      (1L, ms("2024-01-01 00:30:00"), ms("2024-01-01 00:29:00")),
      (2L, ms("2024-01-01 00:10:00"), ms("2024-01-01 00:10:00")))
    assert(batch == expected)
    assert(collected.toSet == expected, s"stream must equal batch: $collected")
  }

  test("key/time columns are parameters; a missing column is a contract error") {
    import org.apache.spark.sql.functions._
    // renamed schema joins identically through the keyCol/tsCol parameters
    val p = spark.read.option("header", true)
      .schema("account_id LONG, at TIMESTAMP")
      .csv(spark.createDataset(Seq("account_id,at", "1,2024-01-01 00:10:00"))(
        org.apache.spark.sql.Encoders.STRING))
    val c = spark.read.option("header", true)
      .schema("account_id LONG, at TIMESTAMP")
      .csv(spark.createDataset(Seq("account_id,at", "1,2024-01-01 00:05:00"))(
        org.apache.spark.sql.Encoders.STRING))
    val out = StreamingIngest.streamStreamWindowJoin(p, c,
      keyCol = "account_id", tsCol = "at").collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
    // wrong column name fails with the contract require(), naming the side
    // and the missing column — not an analysis-time unresolved-column error
    val e = intercept[IllegalArgumentException] {
      StreamingIngest.streamStreamWindowJoin(p, c)
    }
    assert(e.getMessage.contains("purchases") && e.getMessage.contains("user_id"),
      s"contract error must name side and column: ${e.getMessage}")
  }
}
