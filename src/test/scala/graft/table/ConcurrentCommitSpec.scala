package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Optimistic concurrency of the manifest commit: the version-file claim
  * is the commit point, losers re-derive and retry, and every crash
  * window (claim landed / CURRENT stale, mid-retry tmp litter, in-flight
  * snapshot of a slower writer) leaves a consistent, fully readable
  * table with no appended snapshot lost. */
class ConcurrentCommitSpec extends SparkSpec {

  private def newStoreAt: (TableStore, String) = {
    val dir = Files.createTempDirectory("graft_cas").toString
    (new TableStore(spark, dir), dir)
  }

  test("two racing appenders: every snapshot survives in the final manifest") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 1).toDF("v"))
    val perWriter = 6
    def appender(offset: Int): Thread = new Thread(() => {
      for (i <- 0 until perWriter)
        store.append("t", spark.range(offset + i, offset + i + 1).toDF("v"))
    })
    val a = appender(1000)
    val b = appender(2000)
    a.start(); b.start(); a.join(); b.join()
    val vals = store.scan("t").collect().map(_.getLong(0)).sorted.toSeq
    val want = (0L +: ((0 until perWriter).map(_ + 1000L) ++
      (0 until perWriter).map(_ + 2000L))).sorted
    assert(vals == want, s"lost appends: got $vals")
    assert(store.readManifest("t").size == 1 + 2 * perWriter,
      "one snapshot per committed append")
  }

  test("partitioned appends racing a partition drop: neither commit is lost") {
    // the drop's CAS derive re-lists snapshot directories from whatever
    // manifest it reads at commit time; an append landing mid-derive
    // forces a retry on the fresh manifest — the end state must equal
    // SOME serial order: every appended batch present, the dropped day
    // absent from batches the drop saw, and never a half-dropped batch
    val (store, _) = newStoreAt
    def batch(i: Int) = spark.range(10L * i, 10L * i + 10)
      .select(col("id").as("k"), lit(i).as("batch"),
        concat(lit("d"), (col("id") % 2).cast("string")).as("day"))
    store.appendPartitioned("t", batch(0), Seq("day"))
    val appender = new Thread(() => (1 to 8).foreach { i =>
      store.appendPartitioned("t", batch(i), Seq("day")); Thread.sleep(5)
    })
    @volatile var drops = 0
    val dropper = new Thread(() => (1 to 4).foreach { _ =>
      if (store.dropPartitions("t", "day", Seq("d0"))) drops += 1
      Thread.sleep(15)
    })
    appender.start(); dropper.start(); appender.join(); dropper.join()
    assert(drops >= 1, "at least one sweep must commit")
    val df = store.scan("t")
    // every batch's d1 half survives every sweep (d1 never dropped)
    assert(df.where(col("day") === "d1").select("batch").distinct().count() == 9,
      "a batch's surviving partition went missing — a commit was lost")
    // d0 rows, if any, belong ONLY to batches appended after the last
    // committed sweep — and each present batch holds its full 5-row half
    val d0 = df.where(col("day") === "d0")
      .groupBy("batch").count().collect()
    assert(d0.forall(_.getLong(1) == 5L),
      s"half-dropped batch: ${d0.mkString(",")}")
    // a final quiesced sweep leaves exactly the d1 halves
    store.dropPartitions("t", "day", Seq("d0"))
    assert(store.scan("t").count() == 9 * 5)
    assert(store.partitionValues("t", "day") == Seq("d1"))
  }

  test("losing the claim re-derives the union: the racer's snapshot is kept") {
    val (store, dir) = newStoreAt
    store.overwrite("t", spark.range(0, 5).toDF("v"))
    // a racer's snapshot, already on disk
    val racerSnap = store.writeSnapshot("t", spark.range(100, 105).toDF("v"))
    // our append's snapshot
    val ourSnap = store.writeSnapshot("t", spark.range(200, 205).toDF("v"))
    var calls = 0
    store.commitManifestCas("t", cur => {
      calls += 1
      if (calls == 1) {
        // simulate an external process committing BETWEEN our manifest
        // read and our claim: seal the next version slot directly
        val tDir = new Path(dir, "t")
        val vmax = store.versions("t").last
        val f = tDir.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val out = f.create(new Path(tDir, f"v-${vmax + 1}%06d"), false)
        try out.write((cur :+ racerSnap :+ "#graft-commit")
          .mkString("\n").getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      cur :+ ourSnap
    })
    assert(calls == 2, s"the losing claim must re-run compute (calls=$calls)")
    val vals = store.scan("t").collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == ((0L to 4L) ++ (100L to 104L) ++ (200L to 204L)),
      "both the racer's and our snapshot must be in the committed state")
  }

  test("crash after claim, before CURRENT flip: readers serve the sealed head") {
    val (store, dir) = newStoreAt
    store.overwrite("t", spark.range(0, 3).toDF("v"))
    val snap = store.writeSnapshot("t", spark.range(50, 53).toDF("v"))
    // hand-craft the sealed claim the crashed writer would have left
    // (content derived BEFORE the create: readManifest treats a visible
    // but unwritten claim as in-flight and would spin on it)
    val tDir = new Path(dir, "t")
    val f = tDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vmax = store.versions("t").last
    val content = (store.readManifest("t") :+ snap :+ "#graft-commit")
      .mkString("\n").getBytes(StandardCharsets.UTF_8)
    val out = f.create(new Path(tDir, f"v-${vmax + 1}%06d"), false)
    try out.write(content)
    finally out.close()
    // CURRENT still carries the old tag, but the sealed head wins
    assert(store.scan("t").count() == 6,
      "sealed version files are the committed truth over a stale CURRENT")
    // the next real commit repairs the CURRENT cache
    store.append("t", spark.range(90, 91).toDF("v"))
    assert(store.scan("t").count() == 7)
    val cur = new String(f.open(new Path(tDir, "CURRENT")).readAllBytes(),
      StandardCharsets.UTF_8)
    assert(cur.startsWith(s"#v:${vmax + 2}"), s"CURRENT tag stale: $cur")
  }

  test("crash mid-retry: stale claim tmp litter never corrupts reads or commits") {
    val (store, dir) = newStoreAt
    store.overwrite("t", spark.range(0, 4).toDF("v"))
    val tDir = new Path(dir, "t")
    val f = tDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val litter = new Path(tDir, "vtmp-deadbeef")
    val out = f.create(litter, true)
    try out.write("snap-never-committed\n#graft-commit"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    assert(store.scan("t").count() == 4, "litter must be invisible to readers")
    store.append("t", spark.range(10, 12).toDF("v"))
    assert(store.scan("t").count() == 6, "litter must not block commits")
    assert(store.versions("t").nonEmpty)
  }

  test("GC spares a slower writer's in-flight snapshot until its commit lands") {
    val (store, dir) = newStoreAt
    store.overwrite("t", spark.range(0, 3).toDF("v"))
    // writer A stages its snapshot but has not committed yet
    val inFlight = store.writeSnapshot("t", spark.range(700, 703).toDF("v"))
    // writer B commits an overwrite, whose GC sweeps unreferenced dirs
    store.overwrite("t", spark.range(10, 13).toDF("v"))
    val snapDir = java.nio.file.Paths.get(dir, "t", inFlight)
    assert(java.nio.file.Files.exists(snapDir),
      "GC must spare the in-flight snapshot of a concurrent writer")
    // A's commit still lands on top of B's state
    store.commitManifestCas("t", cur => cur :+ inFlight)
    val vals = store.scan("t").collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == ((10L to 12L) ++ (700L to 702L)))
  }

  test("appendTagged: racing replays collapse to one commit; the loser's orphan GCs") {
    val (store, dir) = newStoreAt
    store.overwrite("t", spark.range(0, 2).toDF("v"))
    assert(store.appendTagged("t", spark.range(5, 7).toDF("v"), "batch7"))
    assert(!store.appendTagged("t", spark.range(5, 7).toDF("v"), "batch7"),
      "the replay must abort inside the commit")
    assert(store.scan("t").count() == 4)
    // the aborted replay's snapshot dir is unmarked and reaped next commit
    store.append("t", spark.range(9, 10).toDF("v"))
    import scala.jdk.CollectionConverters._
    val tagged = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "t"))
      .iterator().asScala.map(_.getFileName.toString)
      .count(n => n.contains("-tag-batch7-"))
    assert(tagged == 1, "exactly the committed tagged snapshot remains")
  }

  test("rewrite commits are conditional: a takedown landing mid-rewrite is never resurrected") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 100).toDF("v"))
    var calls = 0
    // the derive closure simulates a takedown racing an O(table) rewrite
    // (e.g. a maintenance compact): the first attempt's basis predates the
    // DV commit, so the conditional claim must fail and re-derive
    store.rewriteConditional("t", "test-rewrite") { basis =>
      calls += 1
      if (calls == 1)
        store.deleteByKeysDV("t", Seq("v"), spark.range(0, 10).toDF("v"))
      Some(store.scan("t").where(org.apache.spark.sql.functions.col("v") < 50))
    }
    assert(calls == 2, s"stale-basis rewrite must re-derive (calls=$calls)")
    val vals = store.scan("t").collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == (10L until 50L),
      s"the racing takedown's deletions must survive the rewrite: $vals")
  }

  test("racing branch appenders both land (head flips serialize on the table lock)") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 2).toDF("v"))
    store.createBranch("t", "work")
    val perWriter = 4
    def appender(offset: Int): Thread = new Thread(() => {
      for (i <- 0 until perWriter)
        store.appendBranch("t", "work",
          spark.range(offset + i, offset + i + 1).toDF("v"))
    })
    val a = appender(100); val b = appender(200)
    a.start(); b.start(); a.join(); b.join()
    val vals = store.scanBranch("t", "work").collect()
      .map(_.getLong(0)).sorted.toSeq
    val want = (Seq(0L, 1L) ++ (0 until perWriter).map(_ + 100L) ++
      (0 until perWriter).map(_ + 200L)).sorted
    assert(vals == want, s"lost branch appends: got $vals")
    assert(store.scan("t").count() == 2, "main untouched")
  }

  test("no-hardlink mounts (O_CREAT|O_EXCL fallback): claims stay exclusive, losers re-derive") {
    // a file:// mount without link(2) support (CIFS, FAT, some NFS
    // exports) degrades the claim to exclusive create — the path no spec
    // or smoke otherwise runs. Pin: the fallback engages, an existing
    // destination is NEVER clobbered (the putIfAbsent contract), the
    // loser re-derives onto the next slot, and racing appenders still
    // all land.
    val linkCalls = new java.util.concurrent.atomic.AtomicInteger
    val prev = TableStore.linkOp
    TableStore.linkOp = (_, _) => {
      linkCalls.incrementAndGet()
      throw new UnsupportedOperationException("simulated no-link mount")
    }
    try {
      val dir = Files.createTempDirectory("graft_noln").toString
      val store = new TableStore(spark, dir, retainVersions = 8)
      store.overwrite("t", spark.range(0, 3).toDF("v"))
      assert(linkCalls.get() > 0, "the fallback must actually engage")
      // a foreign claimant burned the next slot with a partial write:
      // exclusive create must refuse it and the committer re-derives
      val burned = java.nio.file.Paths.get(dir, "t", "v-000002")
      Files.write(burned, "snap-bogus".getBytes(StandardCharsets.UTF_8))
      store.append("t", spark.range(100, 103).toDF("v"))
      assert(new String(Files.readAllBytes(burned), StandardCharsets.UTF_8)
        == "snap-bogus", "an existing destination must never be clobbered")
      assert(store.versions("t").max == 3L, "loser re-derives to slot 3")
      assert(store.scan("t").count() == 6)
      // racing appenders through the fallback: every snapshot lands
      def appender(offset: Int): Thread = new Thread(() => {
        for (i <- 0 until 4)
          store.append("t", spark.range(offset + i, offset + i + 1).toDF("v"))
      })
      val a = appender(1000); val b = appender(2000)
      a.start(); b.start(); a.join(); b.join()
      assert(store.scan("t").count() == 6 + 8)
      // unsealed burned slots are never served as heads: the live scan
      // reflects the real commits, time travel skips the garbage
      assert(store.scan("t").where(col("v") === 100).count() == 1)
    } finally TableStore.linkOp = prev
  }

  test("a legacy-format table (untagged CURRENT, unsealed versions) still reads CURRENT") {
    val (store, dir) = newStoreAt
    store.overwrite("t", spark.range(0, 3).toDF("v"))
    val tDir = new Path(dir, "t")
    val f = tDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snaps = store.readManifest("t")
    // strip the protocol markers: untag CURRENT, unseal the version file
    val out = f.create(new Path(tDir, "CURRENT"), true)
    try out.write(snaps.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val v = store.versions("t").last
    val vOut = f.create(new Path(tDir, f"v-$v%06d"), true)
    try vOut.write(snaps.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally vOut.close()
    assert(store.scan("t").count() == 3, "legacy layout must keep reading")
    store.append("t", spark.range(7, 9).toDF("v")) // upgrade on next commit
    assert(store.scan("t").count() == 5)
  }
}
