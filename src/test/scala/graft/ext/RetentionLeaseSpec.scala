package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one-retention-operator-per-table contract is structural: every
  * cascade/drain/acknowledge holds a per-table lease, a second operator
  * aborts cleanly (never a concurrent drain double-negating an in-flight
  * BM25 target), a dead operator's lease expires after the staleness
  * window. */
class RetentionLeaseSpec extends SparkSpec {

  private def corpus(): DataFrame = {
    import spark.implicits._
    (0 until 60).map { i =>
      val date = f"2026-01-${i / 30 + 1}%02d"
      val words = (0 until 14).map(j => s"w${(i * 13 + j * 5) % 97}")
      (i.toLong, date, words.mkString(" "))
    }.toDF("doc_id", "date", "text")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  test("concurrent cascades: one proceeds, the other aborts; BM25 equals a fresh rebuild") {
    val full = corpus()
    val survivors = full.where(col("date") >= "2026-01-02")
    val dir = java.nio.file.Files.createTempDirectory("graft_retlease")
      .toString
    val store = new graft.table.TableStore(spark, dir)
    store.overwritePartitioned("docs", full, Seq("date"))
    Retrieval.buildBm25Index(store, "bm", full, "text", "doc_id",
      numBuckets = 2)
    val targets = Seq(Retention.Bm25("bm", "text", numBuckets = 2))
    // hold operator A open mid-cascade (journal written, drop not yet
    // committed) while operator B tries the same table
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    Retention.failpoint = l =>
      if (l == "journaled") {
        entered.countDown()
        assert(release.await(60, java.util.concurrent.TimeUnit.SECONDS))
      }
    val a = new java.util.concurrent.atomic.AtomicReference[Any]()
    val tA = new Thread(() =>
      a.set(
        try Retention.expirePartitionsBelowCascade(store, "docs", "date",
          cutoff = "2026-01-02", idCol = "doc_id", indexes = targets)
        catch { case e: Throwable => e }))
    tA.start()
    try {
      assert(entered.await(60, java.util.concurrent.TimeUnit.SECONDS))
      // B aborts cleanly at the lease, BEFORE any journal/drop/delete work
      val e = intercept[IllegalStateException] {
        Retention.expirePartitionsBelowCascade(store, "docs", "date",
          cutoff = "2026-01-02", idCol = "doc_id", indexes = targets)
      }
      assert(e.getMessage.contains("retention lease"))
      // same for a concurrent drain — the interleaving that could replay
      // an in-flight, untagged negation
      intercept[IllegalStateException] {
        Retention.drainPendingCascades(store, "docs")
      }
    } finally {
      release.countDown()
      tA.join(120000)
      Retention.failpoint = _ => ()
    }
    assert(a.get() == true, s"operator A must complete: ${a.get()}")
    // the single surviving cascade leaves the index == a fresh rebuild
    val fresh = new graft.table.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_retlease_f").toString)
    Retrieval.buildBm25Index(fresh, "bm", survivors, "text", "doc_id",
      numBuckets = 2)
    val q = Seq((1L, "w5 w18 w31"), (2L, "w44 w57"))
    assert(rows(Retrieval.bm25TopKIndexed(store, "bm", q, k = 5)) ==
      rows(Retrieval.bm25TopKIndexed(fresh, "bm", q, k = 5)))
    // and the lease is released — the next operator proceeds immediately
    Retention.drainPendingCascades(store, "docs")
  }

  test("a dead operator's lease blocks until the staleness window, then takes over") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retstale")
      .toString
    val store = new graft.table.TableStore(spark, dir)
    store.overwritePartitioned("docs", corpus(), Seq("date"))
    // a crashed process leaves its lease file behind
    assert(store.tryAcquireLease("docs", "retention", "dead-operator",
      ttlMs = 600000))
    intercept[IllegalStateException] {
      Retention.drainPendingCascades(store, "docs")
    }
    val saved = Retention.leaseTtlMs
    Retention.leaseTtlMs = 1L
    try {
      Thread.sleep(10)
      Retention.drainPendingCascades(store, "docs") // takeover, no throw
    } finally Retention.leaseTtlMs = saved
    // the stale lease was consumed and the takeover's own lease released
    assert(store.leaseInfo("docs", "retention").isEmpty)
    Retention.drainPendingCascades(store, "docs")
  }

  test("lease primitive: takeover wins once; a superseded holder cannot release the new lease") {
    val dir = java.nio.file.Files.createTempDirectory("graft_leaseprim")
      .toString
    val store = new graft.table.TableStore(spark, dir)
    import spark.implicits._
    store.overwrite("t", Seq((1L, "x")).toDF("k", "v"))
    assert(store.tryAcquireLease("t", "op", "a", ttlMs = 600000))
    // fresh lease: no contender gets in regardless of policy
    assert(!store.tryAcquireLease("t", "op", "b", ttlMs = 600000))
    Thread.sleep(10)
    // under b's own staleness policy (ttl 5 ms) a's lease is now stale:
    // b takes over
    assert(store.tryAcquireLease("t", "op", "b", ttlMs = 5))
    assert(store.leaseInfo("t", "op").exists(_._1 == "b"))
    // a fresh holder c cannot claim, and a's release must not free b's
    assert(!store.tryAcquireLease("t", "op", "c", ttlMs = 600000))
    store.releaseLease("t", "op", "a")
    assert(store.leaseInfo("t", "op").exists(_._1 == "b"),
      "a superseded holder must never free the new holder's lease")
    store.releaseLease("t", "op", "b")
    assert(store.leaseInfo("t", "op").isEmpty)
    assert(store.tryAcquireLease("t", "op", "c", ttlMs = 600000))
    store.releaseLease("t", "op", "c")
  }
}
