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

  test("a dead operator's lease blocks until ITS OWN declared ttl, then takes over") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retstale")
      .toString
    val store = new graft.table.TableStore(spark, dir)
    store.overwritePartitioned("docs", corpus(), Seq("date"))
    // a crashed process leaves its long-ttl lease file behind
    assert(store.tryAcquireLease("docs", "retention", "dead-operator",
      ttlMs = 600000))
    intercept[IllegalStateException] {
      Retention.drainPendingCascades(store, "docs")
    }
    // a SHORT-ttl claimant still cannot take over: staleness is the
    // holder's declared deadline, never the claimant's policy
    val saved = Retention.leaseTtlMs
    Retention.leaseTtlMs = 1L
    try {
      Thread.sleep(10)
      intercept[IllegalStateException] {
        Retention.drainPendingCascades(store, "docs")
      }
    } finally Retention.leaseTtlMs = saved
    store.releaseLease("docs", "retention", "dead-operator")
    // a holder that declared a short ttl and died expires past it
    assert(store.tryAcquireLease("docs", "retention", "dead-2",
      ttlMs = 40))
    Thread.sleep(80)
    Retention.drainPendingCascades(store, "docs") // takeover, no throw
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
    // a declares a SHORT ttl and goes silent (no heartbeat): past its
    // own deadline any claimant may take over
    assert(store.tryAcquireLease("t", "op", "a", ttlMs = 40))
    // fresh lease: no contender gets in while a's deadline holds
    assert(!store.tryAcquireLease("t", "op", "b", ttlMs = 600000))
    Thread.sleep(80)
    assert(store.tryAcquireLease("t", "op", "b", ttlMs = 600000))
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

  test("the lease is self-describing: a short-ttl claimant cannot take over a live long-ttl holder") {
    val dir = java.nio.file.Files.createTempDirectory("graft_leasettl")
      .toString
    val store = new graft.table.TableStore(spark, dir)
    import spark.implicits._
    store.overwrite("t", Seq((1L, "x")).toDF("k", "v"))
    assert(store.tryAcquireLease("t", "op", "long-holder", ttlMs = 600000))
    Thread.sleep(30)
    // before the holder-ttl fix this takeover succeeded: the claimant's
    // 5 ms policy judged a LIVE holder stale and re-opened the
    // concurrent-operator window mid-hold
    assert(!store.tryAcquireLease("t", "op", "impatient", ttlMs = 5))
    assert(store.leaseInfo("t", "op").exists(_._1 == "long-holder"))
    val st = store.leaseStatus("t", "op").get
    assert(st._3 == 600000L, "the declared ttl rides in the payload")
    store.releaseLease("t", "op", "long-holder")
  }

  test("heartbeat keeps a hold fresh past its ttl; a takeover makes the next beat report loss") {
    val dir = java.nio.file.Files.createTempDirectory("graft_leasehb")
      .toString
    val store = new graft.table.TableStore(spark, dir)
    import spark.implicits._
    store.overwrite("t", Seq((1L, "x")).toDF("k", "v"))
    assert(store.tryAcquireLease("t", "op", "worker", ttlMs = 150))
    // beat past the original deadline: the hold stays fresh
    (1 to 4).foreach { _ =>
      Thread.sleep(80)
      assert(store.heartbeatLease("t", "op", "worker"))
      assert(!store.tryAcquireLease("t", "op", "rival", ttlMs = 600000),
        "a freshly-beaten lease must not be stealable")
    }
    // the effective instant advanced with the beats
    val st = store.leaseStatus("t", "op").get
    assert(st._4 > st._2, "effectiveMs must reflect the last heartbeat")
    // silence past the ttl: a rival takes over, and the holder's next
    // beat reports the loss instead of resurrecting the old hold
    Thread.sleep(300)
    assert(store.tryAcquireLease("t", "op", "rival", ttlMs = 600000))
    assert(!store.heartbeatLease("t", "op", "worker"),
      "a superseded holder's beat must report takeover")
    assert(store.leaseInfo("t", "op").exists(_._1 == "rival"))
    store.releaseLease("t", "op", "rival")
  }

  test("withLease heartbeats: an operation longer than the ttl completes without takeover") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rethb")
      .toString
    val store = new graft.table.TableStore(spark, dir)
    val full = corpus()
    store.overwritePartitioned("docs", full, Seq("date"))
    // an index so the cascade takes the journaled path (the failpoint
    // below sits after the journal write)
    NearDupIndex.buildNearDupIndex(store, "nd", full, "text", "doc_id",
      numBuckets = 2, registerFor = Some("docs"))
    val saved = Retention.leaseTtlMs
    Retention.leaseTtlMs = 3000L // heartbeat period = ttl/3 = 1000 ms
    // hold the cascade open ~1.5 ttls at the journaled failpoint: without
    // the heartbeat, a concurrent claimant would legally take over.
    // Margins are sized for a LOADED box (the full suite runs 95 other
    // suites): a takeover needs the beat thread starved ~2 s past its
    // 1 s cadence, not a mere scheduler hiccup — a 400 ms ttl variant
    // flaked exactly that way under full-suite load
    Retention.failpoint = l => if (l == "journaled") {
      (1 to 6).foreach { _ =>
        Thread.sleep(700)
        // a rival probing mid-hold keeps failing — the beats keep the
        // 3 s lease fresh across a ~4.2 s hold
        assert(!store.tryAcquireLease("docs", "retention", "rival",
          ttlMs = 600000))
      }
    }
    try {
      val swept = Retention.expirePartitionsBelowCascade(store, "docs",
        "date", cutoff = "2026-01-02", idCol = "doc_id", indexes = Nil)
      assert(swept, "the long-held cascade must complete normally")
    } finally {
      Retention.failpoint = _ => ()
      Retention.leaseTtlMs = saved
    }
    assert(store.leaseInfo("docs", "retention").isEmpty,
      "the lease releases cleanly after the long hold")
  }
}
