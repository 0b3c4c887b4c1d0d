package graft.tools

import graft.GraftSession
import graft.table.TableStore
import org.apache.spark.sql.functions._

/** Cross-PROCESS commit validation: ConcurrentCommitSpec races writers in
  * one JVM, where the per-table commit lock serializes claims — the claim
  * primitive's cross-process atomicity (POSIX link(2) on file://, see
  * [[graft.table.TableStore]]'s filesystem contract) is only exercised by
  * genuinely separate processes. `scripts/two_writer_smoke.sh` launches
  * two of these JVMs appending to ONE table concurrently, then a third
  * verifies every snapshot landed and GC never reaped an in-flight
  * snapshot (the gcGraceMs default is the cross-process guard — this is
  * the one place it is exercised for real).
  *
  * Modes:
  *   write  <root> <table> <writerId> <nCommits>   append nCommits batches
  *   verify <root> <table> <expectRows> <expectWriters>  assert + fingerprint
  *   writep <root> <table> <writerId> <nCommits>   PARTITIONED appends
  *                                                 (day = batch % 5)
  *   drop   <root> <table> <vals,csv>              dropPartitions on day
  *   verifyp <root> <table> <expectRows> <expectWriters> <keptDays,csv>
  *           assert rows + that only the kept day partitions survive
  *   lease  <root> <table> <holderId> <nPeers>     barrier-synchronized
  *           race for the retention lease: all peers attempt the SAME
  *           acquire at the same instant (file barrier), print won=…;
  *           the shell asserts exactly one winner — the cross-process
  *           form of the one-retention-operator contract (in-JVM races
  *           are covered by RetentionLeaseSpec; only separate processes
  *           exercise the link(2)/O_EXCL claim for real)
  *   cascade_kill <root> <table> <ttlMs>   build a corpus + registered
  *           BM25 index, then HALT the JVM (exit 137, a SIGKILL
  *           stand-in) mid-cascade at the committed-mark window — the
  *           deletion vector has committed, the index negation has not,
  *           and the dead process's lease (declared ttl = ttlMs) is left
  *           behind
  *   takeover_drain <root> <table> <ttlMs>   the second operator after a
  *           cascade_kill: its first drain must FAIL (the dead holder's
  *           lease is still inside its declared ttl), then past the
  *           holder's deadline the staleness takeover must win, the
  *           journal must drain, and the swept index must equal a fresh
  *           rebuild over the survivors — lease takeover + journal drain
  *           tied together across REAL process death (in-JVM crash specs
  *           cover the windows; only this leg covers the lease file +
  *           journal surviving an actual dead JVM)
  */
object TwoWriterSmoke {

  /** Deterministic corpus both chaos-leg PROCESSES derive identically
    * (no shared file needed — the formula is the contract). */
  private def chaosCorpus(
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until 120).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 13 + j * 5) % 97}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val spark = GraftSession.get("local[4]", 8)
    val store = new TableStore(spark, args(1)) // default gcGraceMs: the guard under test
    mode match {
      case "write" =>
        val (table, writerId, n) = (args(2), args(3), args(4).toInt)
        (1 to n).foreach { i =>
          store.append(table, spark.range(100L * i, 100L * i + 10)
            .select(col("id").as("k"), lit(writerId).as("writer"),
              lit(i).as("batch")))
          // yield between commits so the two processes interleave claims
          Thread.sleep(20)
        }
        println(s"WRITER_DONE $writerId $n")
      case "verify" =>
        val (table, expectRows, expectWriters) =
          (args(2), args(3).toLong, args(4).toInt)
        val df = store.scan(table)
        val n = df.count()
        val writers = df.select("writer").distinct().count()
        val batches = df.groupBy("writer").agg(countDistinct("batch").as("b"))
          .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
        assert(n == expectRows,
          s"expected $expectRows rows, found $n — a commit was lost")
        assert(writers == expectWriters.toLong,
          s"expected $expectWriters writers, found $writers")
        // content fingerprint: order-independent, catches duplicated batches
        val fp = df.agg(sum(hash(col("k"), col("writer"), col("batch"))
          .cast("bigint"))).first().getLong(0)
        println(s"VERIFY_OK rows=$n writers=$writers " +
          s"batches=${batches.mkString(",")} fp=$fp")
      case "writep" =>
        // hive-partitioned appends through the same CAS commit: each
        // batch spans two day partitions so later drops split snapshots
        val (table, writerId, n) = (args(2), args(3), args(4).toInt)
        (1 to n).foreach { i =>
          store.appendPartitioned(table, spark.range(100L * i, 100L * i + 10)
            .select(col("id").as("k"), lit(writerId).as("writer"),
              lit(i).as("batch"),
              concat(lit("d"), (col("id") % 2 + i % 4).cast("string"))
                .as("day")),
            Seq("day"))
          Thread.sleep(20)
        }
        println(s"WRITER_DONE $writerId $n")
      case "drop" =>
        // a THIRD process sweeps partitions committed by the other two —
        // the manifest it rewrites (and the include/exclusion subset
        // entries it derives) were produced entirely by foreign JVMs
        val (table, vals) = (args(2), args(3).split(',').toSeq)
        val dropped = store.dropPartitions(table, "day", vals)
        println(s"DROP_DONE committed=$dropped")
      case "verifyp" =>
        val (table, expectRows, expectWriters, kept) =
          (args(2), args(3).toLong, args(4).toInt,
            args(5).split(',').toSet)
        val df = store.scan(table)
        val n = df.count()
        val writers = df.select("writer").distinct().count()
        val days = df.select("day").distinct().collect()
          .map(_.getString(0)).toSet
        assert(n == expectRows,
          s"expected $expectRows rows, found $n — a commit or drop was lost")
        assert(writers == expectWriters.toLong,
          s"expected $expectWriters writers, found $writers")
        assert(days == kept, s"expected partitions $kept, found $days")
        assert(store.partitionValues(table, "day").toSet == kept,
          "partitionValues must agree with the scanned survivors")
        println(s"VERIFYP_OK rows=$n writers=$writers days=${days.toSeq.sorted.mkString(",")}")
      case "lease" =>
        val (table, holderId, nPeers) = (args(2), args(3), args(4).toInt)
        // file barrier: both JVMs reach the attempt before either tries,
        // so the winner's release (below) can never hand the loser a
        // second, non-racing chance to "win". A barrier timeout FAILS
        // the leg loudly: proceeding would let a stalled loser acquire
        // after the winner's release and report a spurious second win —
        // the shell would then blame the lease for a broken barrier.
        val barrier = new java.io.File(args(1), s"lease_barrier_$table")
        barrier.mkdirs()
        def await(prefix: String): Unit = {
          // each barrier gets its OWN deadline — sharing one lets a slow
          // first phase eat the second's budget
          val deadline = System.currentTimeMillis() + 60000
          while (barrier.listFiles().count(_.getName.startsWith(prefix))
              < nPeers) {
            if (System.currentTimeMillis() >= deadline)
              sys.error(s"lease leg: barrier '$prefix' timed out waiting " +
                s"for $nPeers peers — the BARRIER broke, not the lease")
            Thread.sleep(5)
          }
        }
        new java.io.File(barrier, s"ready-$holderId").createNewFile()
        await("ready-")
        val won = store.tryAcquireLease(table, "retention", holderId,
          ttlMs = 60000)
        println(s"LEASE_RESULT $holderId won=$won")
        new java.io.File(barrier, s"attempted-$holderId").createNewFile()
        await("attempted-")
        if (won) store.releaseLease(table, "retention", holderId)
      case "cascade_kill" =>
        val (table, ttl) = (args(2), args(3).toLong)
        val docs = chaosCorpus(spark)
        store.overwrite(table, docs)
        graft.ext.Retrieval.buildBm25Index(store, s"${table}_bm", docs,
          "text", "doc_id", numBuckets = 2, registerFor = Some(table))
        graft.ext.Retention.leaseTtlMs = ttl
        graft.ext.Retention.failpoint = l =>
          if (l == "committed-mark") {
            // the DV has committed, the BM25 negation has not, the lease
            // file (declared ttl) survives this process
            println("CASCADE_KILLED at committed-mark")
            System.out.flush()
            Runtime.getRuntime.halt(137)
          }
        graft.ext.Retention.deleteByKeysCascade(store, table, "doc_id",
          docs.where(col("doc_id") % 5 === 0).select("doc_id"),
          indexes = Nil)
        sys.error("unreachable: the committed-mark failpoint must halt")
      case "takeover_drain" =>
        val (table, ttl) = (args(2), args(3).toLong)
        val blocked =
          try {
            graft.ext.Retention.drainPendingCascades(store, table); false
          } catch { case _: IllegalStateException => true }
        if (!blocked) sys.error("first drain must FAIL while the dead " +
          "holder's lease is inside its declared ttl")
        println("DRAIN_BLOCKED while the dead holder's lease is fresh")
        // past the holder's own deadline the staleness takeover wins
        var drained = false
        val deadline = System.currentTimeMillis() + ttl + 120000
        while (!drained) {
          if (System.currentTimeMillis() >= deadline)
            sys.error(s"takeover never succeeded within ttl+120s")
          Thread.sleep(500)
          try {
            graft.ext.Retention.drainPendingCascades(store, table)
            drained = true
          } catch { case _: IllegalStateException => () }
        }
        // the drained index must equal a fresh rebuild over survivors
        val docs = chaosCorpus(spark)
        val survivors = docs.where(col("doc_id") % 5 =!= 0)
        val fresh = new TableStore(spark,
          new java.io.File(args(1), "fresh_rebuild").toString)
        graft.ext.Retrieval.buildBm25Index(fresh, s"${table}_bm",
          survivors, "text", "doc_id", numBuckets = 2)
        val q = Seq((1L, "w5 w18 w31"), (2L, "w44 w57"))
        def probe(s: TableStore) =
          graft.ext.Retrieval.bm25TopKIndexed(s, s"${table}_bm", q, k = 5)
            .collect().toSeq.map(_.toString).sorted
        val (got, want) = (probe(store), probe(fresh))
        assert(got == want,
          s"drained index != fresh rebuild:\n$got\nvs\n$want")
        assert(store.scan(table).count() == survivors.count(),
          "the killed cascade's DV must hold on the table side")
        val pending = graft.ext.Retention.pendingCascades(store, table)
        assert(pending.isEmpty, "the journal must be fully drained")
        println("TAKEOVER_DRAIN_OK rows=" + store.scan(table).count())
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
