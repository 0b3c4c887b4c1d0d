package graft.streaming

import graft.SparkSpec
import graft.table.TableStore
import java.nio.file.Files

/** Streaming crawl ingest with cross-batch dedup: the corpus table is the
  * dedup state, so re-crawled content is dropped across micro-batches AND
  * across restarts (checkpointed offsets). */
class StreamingDedupSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  test("re-crawls drop across micro-batches, within batches, and across runs") {
    val work = Files.createTempDirectory("graft_sdedup")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.dedupIngestAvailableNow(
      spark, src.toString, schema, store, "docs", ckpt, "text", "doc_id")
    def tableIds: Set[Long] =
      store.scan("docs").collect().map(_.getLong(0)).toSet

    write("f1.json", 1L -> "alpha", 2L -> "beta")
    ingest()
    assert(tableIds == Set(1L, 2L))

    // batch 2: a re-crawl of "alpha", a new doc, and a within-batch dup of
    // the new doc (min id 4 survives)
    write("f2.json", 3L -> "alpha", 4L -> "gamma", 5L -> "gamma")
    ingest()
    assert(tableIds == Set(1L, 2L, 4L))

    // a later RUN (fresh ingest call, same checkpoint): only the genuinely
    // new doc lands; the re-crawl of "beta" is dropped by the corpus probe
    write("f3.json", 6L -> "beta", 7L -> "delta")
    ingest()
    assert(tableIds == Set(1L, 2L, 4L, 7L))

    // and a no-op run changes nothing (checkpoint skips processed files)
    ingest()
    assert(tableIds == Set(1L, 2L, 4L, 7L))
  }
}
