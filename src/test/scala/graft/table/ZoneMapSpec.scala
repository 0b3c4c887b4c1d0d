package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-level zone maps: pruning actually drops files from the plan,
  * never changes the answer, survives stale maps (post-analyze appends),
  * and skips all-null / missing-column files safely. */
class ZoneMapSpec extends SparkSpec {

  private def tmpStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_zm").toString)

  test("pruned scan reads fewer files and returns exactly the filtered rows") {
    import spark.implicits._
    val store = tmpStore()
    val df = (0L until 1000L).map(i => (i, i % 7)).toDF("k", "v")
    store.overwriteClustered("t", df, Seq("k"), numFiles = Some(10))
    store.analyzeZoneMaps("t", Seq("k"))
    val pruned = store.scanPruned("t", "k", 100L, 199L)
    val want = store.scan("t").where(col("k").between(100L, 199L))
    assert(pruned.orderBy("k").collect().toSeq ==
      want.orderBy("k").collect().toSeq)
    assert(pruned.inputFiles.length < store.scan("t").inputFiles.length,
      "a tight key range over a clustered table must skip files")
    // full-range predicate keeps everything
    assert(store.scanPruned("t", "k", 0L, 999L).count() == 1000L)
    // empty range: no file can match
    assert(store.scanPruned("t", "k", 5000L, 6000L).count() == 0L)
  }

  test("stale map: files appended after analyze are read unpruned") {
    import spark.implicits._
    val store = tmpStore()
    store.overwriteClustered("t",
      (0L until 100L).map(i => (i, "old")).toDF("k", "tag"),
      Seq("k"), numFiles = Some(4))
    store.analyzeZoneMaps("t", Seq("k"))
    // rows OUTSIDE every analyzed file's range, appended after analyze
    store.append("t", Seq((500L, "new"), (501L, "new")).toDF("k", "tag"))
    val got = store.scanPruned("t", "k", 400L, 600L)
      .select("k", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((500L, "new"), (501L, "new")),
      "correctness must not depend on the zone map being fresh")
  }

  test("all-null and missing-column files skip safely; no map = plain scan") {
    import spark.implicits._
    val store = tmpStore()
    store.overwrite("t", Seq((1L, Some(10L)), (2L, Some(20L))).toDF("k", "v"))
    store.append("t", Seq((3L, None: Option[Long])).toDF("k", "v")) // all-null v
    store.analyzeZoneMaps("t", Seq("v"))
    val got = store.scanPruned("t", "v", 0L, 100L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // null v can never satisfy the range
    // un-analyzed table: falls back to a filtered scan
    val store2 = tmpStore()
    store2.overwrite("u", Seq((1L, 5L)).toDF("k", "v"))
    assert(store2.scanPruned("u", "v", 0L, 10L).count() == 1L)
    // analyzed for a different column: explicit error, not silent wrong plan
    val e = intercept[IllegalArgumentException] {
      store.scanPruned("t", "k", 0L, 10L)
    }
    assert(e.getMessage.contains("not analyzed"))
  }
}
