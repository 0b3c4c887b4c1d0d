package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-level Bloom filters: equality probes drop files min/max can't
  * (high-cardinality unordered keys), never change the answer, and stay
  * safe under stale sidecars. */
class BloomScanSpec extends SparkSpec {

  private def tmpStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_bloom").toString)

  test("equality probe skips files and returns exactly the filtered rows") {
    import spark.implicits._
    val store = tmpStore()
    // keys land in ONE file each under a clustered layout, but their
    // HASHES are unordered — min/max pruning over a hash column would be
    // useless; Bloom positions are exactly right
    val df = (0L until 2000L).map(i => (i, s"host-${i % 400}.example"))
      .toDF("k", "host")
    store.overwriteClustered("t", df, Seq("k"), numFiles = Some(10))
    store.analyzeBloomFilters("t", Seq("host"), bits = 1 << 14)
    val pruned = store.scanBloomPruned("t", "host", "host-7.example")
    val want = store.scan("t").where(col("host") === "host-7.example")
    assert(pruned.orderBy("k").collect().toSeq ==
      want.orderBy("k").collect().toSeq)
    // host-7 rows are k ∈ {7, 407, 807, 1207, 1607} — 5 of 10 files;
    // the other 5 must be provably free of the value (no FP at 16k bits
    // over 400 values)
    assert(pruned.inputFiles.length < store.scan("t").inputFiles.length,
      "bloom probe must skip files that cannot hold the value")
    // absent value: every file skipped, result empty with intact schema
    val none = store.scanBloomPruned("t", "host", "host-9999.example")
    assert(none.count() == 0L && none.columns.toSeq == Seq("k", "host"))
  }

  test("stale sidecar: files appended after analyze are read unpruned") {
    import spark.implicits._
    val store = tmpStore()
    store.overwrite("t", (0L until 100L).map(i => (i, s"h$i")).toDF("k", "h"))
    store.analyzeBloomFilters("t", Seq("h"))
    store.append("t", Seq((500L, "brand-new-host")).toDF("k", "h"))
    val got = store.scanBloomPruned("t", "h", "brand-new-host").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(500L),
      "correctness must not depend on the sidecar being fresh")
  }

  test("numeric columns probe through the same engine hash") {
    import spark.implicits._
    val store = tmpStore()
    val df = (0L until 1000L).map(i => (i, i * 37 % 1009)).toDF("k", "v")
    store.overwriteClustered("t", df, Seq("k"), numFiles = Some(8))
    store.analyzeBloomFilters("t", Seq("v"))
    val want = store.scan("t").where(col("v") === 555L).collect().toSeq
    assert(store.scanBloomPruned("t", "v", 555L).collect().toSeq == want)
    assert(store.scanBloomPruned("t", "v", 2000L).count() == 0L)
  }

  test("unanalyzed column, missing sidecar, and null probe") {
    import spark.implicits._
    val store = tmpStore()
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "h"))
    // no sidecar at all → plain filtered scan
    assert(store.scanBloomPruned("t", "h", "a").count() == 1L)
    store.analyzeBloomFilters("t", Seq("h"))
    intercept[IllegalArgumentException] {
      store.scanBloomPruned("t", "k", 1L).count()
    }
    intercept[IllegalArgumentException] {
      store.scanBloomPruned("t", "h", null)
    }
  }

  test("nulls never enter the filter; all-null files have no sidecar row") {
    import spark.implicits._
    val store = tmpStore()
    store.overwrite("t",
      Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("k", "h"))
    store.append("t", Seq((3L, Option.empty[String])).toDF("k", "h"))
    store.analyzeBloomFilters("t", Seq("h"))
    // the appended all-null snapshot contributes no sidecar rows but its
    // file is still read (conservative keep); the __analyzed__ sentinel
    // (column-set record, not a file) is excluded from the count
    assert(store.scan(store.bloomTable("t"))
      .where(col("file") =!= "__analyzed__")
      .select("file").distinct().count() == 1L)
    assert(store.scanBloomPruned("t", "h", "x").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }
}
