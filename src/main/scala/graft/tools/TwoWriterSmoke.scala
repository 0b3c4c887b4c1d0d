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
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
