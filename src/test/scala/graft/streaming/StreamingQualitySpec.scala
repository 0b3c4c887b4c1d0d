package graft.streaming

import graft.SparkSpec
import graft.ext.LanguageModel
import graft.table.TableStore
import java.nio.file.Files

/** Streaming LM quality gate: fluent docs land, gibberish is dropped,
  * across micro-batches and restarts — trained once, probed per batch. */
class StreamingQualitySpec extends SparkSpec {
  import spark.implicits._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  test("fluent docs pass the gate, gibberish and unscorable docs drop") {
    val work = Files.createTempDirectory("graft_squal")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString

    val ref = (0 until 50).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran to the cat"))
      .toDF("doc_id", "text")
    val tables = LanguageModel.trainStupidBackoff(ref, "text")
    // threshold between in-distribution (~0) and unknown-vocab scores
    val cut = LanguageModel.scoreLogPpl(
      Seq((0L, "the cat sat on the mat")).toDF("doc_id", "text"), ref,
      "text", "doc_id").first().getDouble(2) + 1.0

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.qualityGateIngestAvailableNow(
      spark, src.toString, schema, store, "clean", ckpt, "text", "doc_id",
      tables, cut)
    def ids: Set[Long] = store.scan("clean").collect().map(_.getLong(0)).toSet

    write("f1.json", 1L -> "the cat sat on the mat",
      2L -> "zq xv qq ww ee rr", 3L -> "one")
    ingest()
    assert(ids == Set(1L), s"only the fluent doc lands: $ids")

    // a later batch through the same checkpoint appends more keepers
    write("f2.json", 4L -> "the dog ran to the mat", 5L -> "xx yy zz ww")
    ingest()
    assert(ids == Set(1L, 4L))

    // no-op rerun: checkpoint skips processed files
    ingest()
    assert(ids == Set(1L, 4L))
  }

  test("streaming langid router labels every doc; short text routes to und") {
    val work = Files.createTempDirectory("graft_slid")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString

    // frozen router model trained offline on a separable labeled slice
    val labeled = (0 until 60).flatMap { i =>
      Seq(("en", s"the quick brown fox jumps over the lazy dog $i"),
        ("de", s"der schnelle braune fuchs springt über den hund $i"),
        ("es", s"el rápido zorro marrón salta sobre el perro $i"))
    }.toDF("lang", "text")
    val (m, p) = graft.ext.NaiveBayes.train(labeled, "text", "lang",
      buckets = 2000, alpha = 1.0,
      features = graft.ext.LangId.charGramBuckets(3))

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.langidRouterIngestAvailableNow(
      spark, src.toString, schema, store, "routed", ckpt, "text", "doc_id",
      m, p)
    def routed: Map[Long, String] = store.scan("routed").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap

    write("f1.json",
      1L -> "the quick brown fox runs",
      2L -> "der schnelle braune fuchs läuft",
      3L -> "ab") // too short for a trigram -> und
    ingest()
    assert(routed == Map(1L -> "en", 2L -> "de", 3L -> "und"), routed)

    // later batch through the same checkpoint; rerun is a no-op
    write("f2.json", 4L -> "el rápido zorro marrón corre")
    ingest()
    ingest()
    assert(routed == Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "es"),
      routed)
  }

  test("streaming classifier gate keeps positives across batches and restarts") {
    val work = Files.createTempDirectory("graft_sclf")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString
    val B = 256

    // offline training: separable vocabularies, frozen weights
    val labeled = (Seq.fill(6)("good fine great signal").map((_, 1L)) ++
      Seq.fill(6)("bad junk awful filler").map((_, 0L))).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }.toDF("doc_id", "text", "y")
    val w = graft.ext.LogReg.train(labeled, "text", "doc_id",
      org.apache.spark.sql.functions.col("y"), B, iterations = 4)

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.classifierGateIngestAvailableNow(
      spark, src.toString, schema, store, "clean", ckpt, "text", "doc_id",
      w, B)
    def ids: Set[Long] = store.scan("clean").collect().map(_.getLong(0)).toSet

    write("f1.json", 1L -> "good fine content", 2L -> "junk awful bad")
    ingest()
    assert(ids == Set(1L), s"classifier keeps the positive doc: $ids")

    write("f2.json", 3L -> "great signal here", 4L -> "filler junk")
    ingest()
    assert(ids == Set(1L, 3L))

    // no-op rerun: checkpoint skips processed files
    ingest()
    assert(ids == Set(1L, 3L))
  }

  test("streaming acceptance gate quarantines failing batches whole") {
    import graft.ops.Checks
    val work = Files.createTempDirectory("graft_schecks")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString
    val rejected = scala.collection.mutable.ArrayBuffer.empty[String]

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.checksGateIngestAvailableNow(
      spark, src.toString, schema, store, "accepted", ckpt,
      Seq(Checks.Unique(Seq("doc_id")), Checks.Complete("text")),
      onReject = (_, failed) =>
        rejected.synchronized { rejected ++= failed.map(_.getString(1)) })
    def ids: Set[Long] =
      if (store.exists("accepted"))
        store.scan("accepted").collect().map(_.getLong(0)).toSet
      else Set.empty

    // batch with a duplicate key: rejected whole, nothing lands
    write("f1.json", 1L -> "a", 2L -> "b", 2L -> "dup")
    ingest()
    assert(ids == Set.empty && rejected.toSeq == Seq("unique"), rejected)

    // clean batch lands; rerun is a checkpointed no-op
    write("f2.json", 3L -> "c", 4L -> "d")
    ingest()
    assert(ids == Set(3L, 4L))
    ingest()
    assert(ids == Set(3L, 4L) && rejected.size == 1)
  }

  test("streaming drift monitor quarantines a drifted batch, passes clean ones") {
    val work = Files.createTempDirectory("graft_sdrift")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Double]

    // reference corpus collapses to its histogram ONCE
    val ref = (0 until 100).map(i =>
      (i.toLong, "the data table holds common corpus tokens"))
      .toDF("doc_id", "text")
    val refHist = graft.ext.Drift.tokenHistogram(ref, "text", 256)

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.driftMonitorIngestAvailableNow(
      spark, src.toString, schema, store, "clean", ckpt, "text",
      refHist, buckets = 256, maxJs = 0.3,
      onDrift = (_, _, js) => seen.synchronized { seen += js })
    def ids: Set[Long] =
      if (store.exists("clean"))
        store.scan("clean").collect().map(_.getLong(0)).toSet
      else Set.empty

    write("f1.json",
      1L -> "the data table holds common corpus tokens",
      2L -> "the data table holds common tokens")
    ingest()
    assert(ids == Set(1L, 2L), s"in-distribution batch lands: $ids")
    assert(seen.size == 1 && seen(0) < 0.3, seen)

    write("f2.json", 3L -> "zzz qqq www eee completely alien vocabulary")
    ingest()
    assert(ids == Set(1L, 2L), "drifted batch must quarantine")
    assert(seen.size == 2 && seen(1) > 0.3, seen)

    // a TOKEN-FREE batch has no distribution to compare: it must be
    // quarantined (reported as NaN), never crash the stream on the null
    // js the divergence yields for an empty side
    write("f3.json", 4L -> "")
    ingest()
    assert(ids == Set(1L, 2L), "empty batch must quarantine, not land")
    assert(seen.size == 3 && seen(2).isNaN, seen)

    // and the stream keeps working afterwards
    write("f4.json", 5L -> "the data table holds common corpus tokens")
    ingest()
    assert(ids == Set(1L, 2L, 5L), s"stream must survive the empty batch: $ids")
  }

  test("streaming blocklist screen drops flagged docs across batches and restarts") {
    val work = Files.createTempDirectory("graft_sbl")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString

    def write(name: String, rows: (Long, String)*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
      ()
    }
    def ingest(): Unit = StreamingIngest.blocklistGateIngestAvailableNow(
      spark, src.toString, schema, store, "clean", ckpt, "text",
      patterns = Seq("bad", "worse phrase"), maxHits = 0L)
    def ids: Set[Long] = store.scan("clean").collect().map(_.getLong(0)).toSet

    write("f1.json", 1L -> "clean text here", 2L -> "some bad content",
      3L -> "a worse phrase lurks", 4L -> "badge is fine") // word-bounded
    ingest()
    assert(ids == Set(1L, 4L), s"flagged docs must drop: $ids")

    write("f2.json", 5L -> "still clean", 6L -> "bad again")
    ingest()
    assert(ids == Set(1L, 4L, 5L))

    // no-op rerun: checkpoint skips processed files
    ingest()
    assert(ids == Set(1L, 4L, 5L))
  }
}
