package graft.streaming

import graft.SparkSpec
import graft.table.TableStore
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Continuous right-to-erasure: a key stream lands as O(deleted)
  * deletion-vector commits, replays are semantically idempotent, and
  * data appended after a takedown batch survives it. */
class StreamingTakedownSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType)))

  test("takedown stream erases keys O(deleted); replays and re-adds behave") {
    val work = Files.createTempDirectory("graft_stkdn")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt")

    store.overwrite("docs", spark.range(1, 101)
      .selectExpr("id AS doc_id", "CAST(id AS STRING) AS text"))
    val filesBefore = store.scan("docs").inputFiles.toSet

    def write(name: String, ids: Long*): Unit = {
      Files.writeString(src.resolve(name),
        ids.map(id => s"""{"doc_id":$id}""").mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.takedownIngestAvailableNow(
      spark, src.toString, schema, store, "docs", ckpt.toString, Seq("doc_id"))
    def ids: Seq[Long] =
      store.scan("docs").select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

    write("t0.json", 5L, 6L, 7L)
    write("t1.json", 50L)
    ingest()
    assert(ids == ((1L to 100L).filterNot(Set(5L, 6L, 7L, 50L))),
      "both takedown batches must apply")
    assert(filesBefore.subsetOf(store.scan("docs").inputFiles.toSet),
      "takedowns must not rewrite any data file")

    // a doc re-added AFTER the takedowns survives them (replay order)
    store.append("docs", spark.range(6, 7)
      .selectExpr("id AS doc_id", "'fresh' AS text"))
    assert(ids.contains(6L), "re-added doc must outlive earlier vectors")

    // replay from a wiped checkpoint: the batch tags make the replayed
    // vectors true no-ops — in particular the re-added doc 6 must NOT be
    // erased by a replayed t0 (an untagged replay would land a fresh
    // vector AFTER the re-append and wrongly kill it)
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p)) {
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    rmrf(ckpt)
    ingest()
    assert(ids.contains(6L),
      "a replayed takedown must not erase a doc re-added since the original")
    assert(ids == (6L +: (1L to 100L).filterNot(Set(5L, 6L, 7L, 50L))).sorted,
      "replayed takedowns must be no-ops")

    // ...a LATER (new) takedown batch names doc 6 again and erases it
    write("t2.json", 6L)
    ingest()
    assert(!ids.contains(6L))

    // compact folds every vector into one snapshot, content unchanged
    val before = ids
    store.compact("docs", maxSnapshots = 0)
    assert(ids == before)
    assert(store.scan("docs").where(col("doc_id") === 50L).count() == 0)
  }
}
