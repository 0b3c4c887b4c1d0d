package graft.streaming

import graft.SparkSpec
import graft.ext.Retrieval
import graft.table.TableStore
import java.nio.file.Files

/** Streaming curate-and-index: re-crawled content is dropped, new content
  * lands in the corpus table AND the BM25 index in the same micro-batch,
  * and after every run the index answers exactly like a from-scratch build
  * over the corpus — the losslessness invariant under streaming growth. */
class StreamingIndexSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  test("stream-grown index == scan path on the corpus table, across batches and dups") {
    val work = Files.createTempDirectory("graft_sidx")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString
    val queries = Seq(0L -> "hash join", 1L -> "merge sort spill")

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.indexIngestAvailableNow(
      spark, src.toString, schema, store, "docs", "idx", ckpt,
      "text", "doc_id", numBuckets = 2)
    def indexed: Seq[(Long, Long, Long, java.math.BigDecimal)] =
      Retrieval.bm25TopKIndexed(store, "idx", queries, k = 10)
        .orderBy("query_id", "rank").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3)))
    def scanPath: Seq[(Long, Long, Long, java.math.BigDecimal)] =
      Retrieval.bm25TopK(store.scan("docs"), "text", "doc_id", queries, k = 10)
        .orderBy("query_id", "rank").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3)))

    write("f1.json", 1L -> "the hash join build side",
      2L -> "merge sort beats hash join here")
    ingest()
    assert(indexed == scanPath, "after batch 1")
    assert(indexed.nonEmpty)

    // batch 2: a re-crawl (dropped — must NOT double-count postings), a
    // new doc, and a doc matching the second query
    write("f2.json", 3L -> "the hash join build side",
      4L -> "spill to disk then merge sort", 5L -> "hash hash hash")
    ingest()
    assert(indexed == scanPath, "after batch 2 (re-crawl dropped)")
    assert(store.scan("docs").count() == 4)

    // no-op run: checkpoint skips processed files, index unchanged
    val before = indexed
    ingest()
    assert(indexed == before, "no-op run must not touch the index")
  }

  test("streaming NEAR-dup ingest: edited re-crawls drop, index grows batch by batch") {
    import graft.ext.NearDupIndex
    val work = Files.createTempDirectory("graft_sndx")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.nearDupIndexIngestAvailableNow(
      spark, src.toString, schema, store, "docs", "nd", ckpt,
      "text", "doc_id", numBuckets = 2, threshold = 0.5)
    def corpusIds: Set[Long] =
      store.scan("docs").select("doc_id").collect().map(_.getLong(0)).toSet

    val base = "the quick brown fox jumps over the lazy dog near the barn door"
    write("f1.json", 1L -> base,
      2L -> "completely different content about spark shuffles and joins here")
    ingest()
    assert(corpusIds == Set(1L, 2L))

    // batch 2: an EDITED re-crawl of doc 1 (near-dup, exact hash differs)
    // must drop; a fresh doc lands and joins the index
    write("f2.json", 3L -> (base + " again"),
      4L -> "fresh material on bucketed tables and zone maps for pruning io")
    ingest()
    assert(corpusIds == Set(1L, 2L, 4L), s"edited re-crawl must drop: $corpusIds")

    // batch 3: a near-dup of doc 4 — which entered via STREAMING append —
    // proves the index that screens batch N+1 grew from batch N
    write("f3.json", 5L ->
      "fresh material on bucketed tables and zone maps for pruning disk io")
    ingest()
    assert(corpusIds == Set(1L, 2L, 4L),
      s"near-dup of a stream-appended doc must drop: $corpusIds")

    // restart-safety: a no-op rerun changes nothing; the grown index
    // equals a from-scratch build over the corpus table
    ingest()
    assert(corpusIds == Set(1L, 2L, 4L))
    val rebuilt = new TableStore(spark, work.resolve("store2").toString)
    NearDupIndex.buildNearDupIndex(rebuilt, "nd", store.scan("docs"),
      "text", "doc_id", numBuckets = 2)
    import spark.implicits._
    val b = Seq(10L -> (base + " and more")).toDF("doc_id", "text")
    def screen(st: TableStore): Seq[(Long, Long)] =
      NearDupIndex.nearDupAgainstIndex(st, "nd", b, "text", "doc_id", 0.5)
        .select("batch_id", "corpus_id").orderBy("corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(screen(store) == screen(rebuilt) && screen(store).nonEmpty,
      "stream-grown index must screen like a from-scratch rebuild")
  }

  test("streaming vector ingest: semantic re-crawls drop, IVF index grows") {
    import graft.ext.VectorIndex
    val work = Files.createTempDirectory("graft_svec")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString
    val vecSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))

    def write(name: String, rows: (Long, Seq[Double])*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, v) =>
          s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
        }.mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.vectorIndexIngestAvailableNow(
      spark, src.toString, vecSchema, store, "vecs", "ivf", ckpt,
      "embedding", "vec_id", nCells = 2, numBuckets = 2, nProbe = 2,
      threshold = 0.95)
    def corpusIds: Set[Long] =
      store.scan("vecs").select("vec_id").collect().map(_.getLong(0)).toSet

    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val c = Seq(0.0, 1.0, 0.0, 0.0)
    write("f1.json", 1L -> a, 2L -> c)
    ingest()
    assert(corpusIds == Set(1L, 2L))

    // batch 2: a SCALED copy of vector 1 (cosine 1.0 -> semantic dup)
    // and a genuinely new direction
    write("f2.json", 3L -> a.map(_ * 7.5), 4L -> Seq(0.0, 0.0, 1.0, 0.0))
    ingest()
    assert(corpusIds == Set(1L, 2L, 4L), s"scaled re-crawl must drop: $corpusIds")

    // batch 3: a slight perturbation of the STREAM-APPENDED vector 4
    // (cosine ~0.995) — proves the index screening batch N+1 grew in N
    write("f3.json", 5L -> Seq(0.1, 0.0, 1.0, 0.0))
    ingest()
    assert(corpusIds == Set(1L, 2L, 4L),
      s"near-copy of a stream-appended vector must drop: $corpusIds")

    // no-op restart; grown index answers like a rebuild with its codebook
    ingest()
    assert(corpusIds == Set(1L, 2L, 4L))
    import spark.implicits._
    val probe = Seq((9L, Seq(0.0f, 0.0f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val grown = VectorIndex.ivfTopKIndexed(store, "ivf", probe,
      "embedding", "vec_id", k = 1, nProbe = 2)
      .select("c_id").collect().map(_.getLong(0)).toSeq
    assert(grown == Seq(4L), s"nearest must be the stream-appended vector: $grown")
  }
}
