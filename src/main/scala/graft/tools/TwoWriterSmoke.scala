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
  */
object TwoWriterSmoke {
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
        // second, non-racing chance to "win"
        val barrier = new java.io.File(args(1), s"lease_barrier_$table")
        barrier.mkdirs()
        new java.io.File(barrier, s"ready-$holderId").createNewFile()
        val deadline = System.currentTimeMillis() + 60000
        while (barrier.listFiles().count(_.getName.startsWith("ready-"))
            < nPeers && System.currentTimeMillis() < deadline)
          Thread.sleep(5)
        val won = store.tryAcquireLease(table, "retention", holderId,
          ttlMs = 60000)
        println(s"LEASE_RESULT $holderId won=$won")
        // a second barrier, not a sleep: the winner releases only after
        // every peer has ATTEMPTED — a loser JVM stalled by a GC pause
        // can never acquire a lease the winner already released and turn
        // one race into two sequential wins
        new java.io.File(barrier, s"attempted-$holderId").createNewFile()
        while (barrier.listFiles().count(_.getName.startsWith("attempted-"))
            < nPeers && System.currentTimeMillis() < deadline)
          Thread.sleep(5)
        if (won) store.releaseLease(table, "retention", holderId)
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
