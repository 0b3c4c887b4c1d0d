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

  test("CASCADED takedown stream: ids erased from the table AND the registered indexes") {
    import graft.ext.{NearDupIndex, Retention, Retrieval}
    val work = Files.createTempDirectory("graft_stkdnc")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt")

    val docs = spark.range(0, 90).selectExpr("id AS doc_id",
      "concat_ws(' ', transform(sequence(0, 13), " +
        "j -> concat('w', pmod(id * 13 + j * 5, 97)))) AS text")
    store.overwrite("docs", docs)
    NearDupIndex.buildNearDupIndex(store, "nd", docs, "text", "doc_id",
      numBuckets = 2)
    Retrieval.buildBm25Index(store, "bm", docs, "text", "doc_id",
      numBuckets = 2)
    // the sync contract as data: the takedown stream is called with NO
    // index list — it must reach both families through the registry
    Retention.registerIndex(store, "docs", Retention.NearDup("nd", 2))
    Retention.registerIndex(store, "docs",
      Retention.Bm25("bm", "text", numBuckets = 2))

    def write(name: String, ids: Long*): Unit = {
      Files.writeString(src.resolve(name),
        ids.map(id => s"""{"doc_id":$id}""").mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.takedownCascadeIngestAvailableNow(
      spark, src.toString, schema, store, "docs", ckpt.toString, "doc_id")
    val doomed = Seq(0L, 5L, 10L, 15L, 20L, 40L)
    write("t0.json", doomed.take(3): _*)
    write("t1.json", doomed.drop(3): _*)
    ingest()
    assert(store.scan("docs").count() == 90L - doomed.size)

    // both families must equal a fresh rebuild on the survivors
    val survivors = docs.where(!col("doc_id").isin(doomed: _*))
    val fresh = new TableStore(spark,
      work.resolve("fresh").toString)
    NearDupIndex.buildNearDupIndex(fresh, "nd", survivors, "text",
      "doc_id", numBuckets = 2)
    Retrieval.buildBm25Index(fresh, "bm", survivors, "text", "doc_id",
      numBuckets = 2)
    def fp(s: TableStore): Seq[String] = {
      val batch = docs.where(col("doc_id").isin(5L, 63L)) // doomed, kept
        .select((col("doc_id") + 1000L).as("doc_id"),
          concat(col("text"), lit(" edited")).as("text"))
      val nd = NearDupIndex.nearDupAgainstIndex(s, "nd", batch, "text",
        "doc_id", threshold = 0.5, materialize = false)
      val bm = Retrieval.bm25TopKIndexed(s, "bm",
        Seq((1L, "w5 w18 w31"), (2L, "w44 w57")), k = 5)
      (nd.collect().toSeq ++ bm.collect().toSeq).map(_.toString).sorted
    }
    assert(fp(store) == fp(fresh),
      "cascaded takedown stream must leave both families == fresh rebuild")
    // journal fully drained; replay from a wiped checkpoint no-ops
    assert(Retention.pendingCascades(store, "docs").isEmpty)
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p)) {
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    rmrf(ckpt)
    val entries = store.manifestEntries("docs")
    ingest()
    assert(store.manifestEntries("docs") == entries,
      "a replayed cascade batch captures nothing and commits nothing")
    assert(fp(store) == fp(fresh), "replay must not double-negate BM25")
  }
}
