package graft.streaming

import graft.SparkSpec
import graft.table.TableStore
import java.nio.file.Files

/** Exactly-once streaming appends: idempotency lives in the store's
  * commit protocol (batch tag rides the atomic manifest flip), so replays
  * — including a FULL re-run from a wiped checkpoint — land nothing
  * twice, without dedup keys or a state store. */
class StreamingExactlyOnceSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  test("wiped checkpoint replays every batch; the table stays duplicate-free") {
    val work = Files.createTempDirectory("graft_sexact")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt")

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.exactlyOnceIngestAvailableNow(
      spark, src.toString, schema, store, "docs", ckpt.toString)
    def ids: Seq[Long] =
      store.scan("docs").collect().map(_.getLong(0)).toSeq.sorted

    write("f0.json", 1L -> "a", 2L -> "b")
    write("f1.json", 3L -> "c")
    ingest()
    assert(ids == Seq(1L, 2L, 3L))

    // wipe the checkpoint: the stream re-reads BOTH files as batches 0/1
    // again — the store's tags make both replays no-ops
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p)) {
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    rmrf(ckpt)
    ingest()
    assert(ids == Seq(1L, 2L, 3L), "full replay must land zero duplicates")

    // new data under the SAME restarted checkpoint continues from fresh
    // batch ids that no live tag collides with
    write("f2.json", 4L -> "d")
    ingest()
    assert(ids == Seq(1L, 2L, 3L, 4L))
  }
}
