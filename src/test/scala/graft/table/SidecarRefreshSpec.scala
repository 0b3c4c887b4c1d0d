package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental zone-map / Bloom sidecar refresh: content-equivalent to a
  * full re-analyze while scanning ONLY the files appended since the last
  * refresh — the O(new files) cadence an append-heavy 100 TB table needs. */
class SidecarRefreshSpec extends SparkSpec {

  private def newStoreAt: (TableStore, String) = {
    val dir = Files.createTempDirectory("graft_sidecar").toString
    (new TableStore(spark, dir), dir)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .toIndexedSeq.sorted

  test("zone-map refresh == full analyze; only new files are scanned") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 1000)
      .selectExpr("id AS k", "id * 2 AS v"))
    store.analyzeZoneMaps("t", Seq("k"))
    val firstFiles = store.scan("t").inputFiles.toSet

    store.append("t", spark.range(5000, 6000)
      .selectExpr("id AS k", "id * 2 AS v"))
    store.refreshZoneMaps("t", Seq("k"))
    val incremental = rows(store.scan(store.zoneMapTable("t")))

    // the reference: a from-scratch analyze over the same table state
    store.analyzeZoneMaps("t", Seq("k"))
    val full = rows(store.scan(store.zoneMapTable("t")))
    assert(incremental == full,
      "incremental refresh must equal the full analyze row-for-row")

    // pruning works through the refreshed sidecar and stays exact
    store.refreshZoneMaps("t", Seq("k")) // no new files -> survivors only
    val got = store.scanPruned("t", "k", 5100, 5200)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (5100L to 5200L))
    // ... and the pruned read skips the first snapshot's files entirely
    val read = store.scanPruned("t", "k", 5100, 5200).inputFiles.toSet
    assert(firstFiles.intersect(read).isEmpty,
      "zone map must prune the pre-append files for a post-append range")
  }

  test("zone-map refresh drops sidecar rows of files the table no longer has") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 100).selectExpr("id AS k"))
    store.analyzeZoneMaps("t", Seq("k"))
    store.overwrite("t", spark.range(500, 600).selectExpr("id AS k")) // old files GC
    store.refreshZoneMaps("t", Seq("k"))
    val zm = store.scan(store.zoneMapTable("t"))
    val mins = zm.select("k__min").collect().map(_.getLong(0))
    assert(mins.forall(_ >= 500L), "dead files' stats must drop out")
    assert(rows(zm) == {
      store.analyzeZoneMaps("t", Seq("k"))
      rows(store.scan(store.zoneMapTable("t")))
    })
  }

  test("zone-map refresh after a partition drop of hive-ESCAPED values") {
    // dropped-partition liveness is derived from the manifest's own leaf
    // enumeration, not from substring-matching rendered path strings —
    // values whose hive dir names carry %XX escapes (here '=' and ' ')
    // are exactly where a path-rendering dependency would silently keep
    // dropped files live in the sidecar
    val (store, _) = newStoreAt
    val df = spark.range(0, 90).selectExpr("id AS k",
      "CASE WHEN id % 3 = 0 THEN 'a=b' WHEN id % 3 = 1 THEN 'c d' " +
        "ELSE 'plain' END AS src")
    store.overwritePartitioned("t", df, Seq("src"))
    store.analyzeZoneMaps("t", Seq("k"))
    assert(store.dropPartitions("t", "src", Seq("a=b")))
    store.refreshZoneMaps("t", Seq("k"))
    val zm = store.scan(store.zoneMapTable("t"))
    // sidecar rows for the dropped partition's files are gone: every
    // surviving stats row covers only k % 3 != 0 rows
    val liveKs = store.scan("t").select("k").collect().map(_.getLong(0)).toSet
    val zmCount = zm.agg(sum(col("n_rows"))).first().getLong(0)
    assert(zmCount == liveKs.size.toLong,
      s"sidecar must cover exactly the live files' rows, got $zmCount")
    assert(rows(zm) == {
      store.analyzeZoneMaps("t", Seq("k"))
      rows(store.scan(store.zoneMapTable("t")))
    }, "refresh after an escaped-value drop must equal the full analyze")
  }

  test("zone-map refresh with a changed column set falls back to the full analyze") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 100)
      .selectExpr("id AS k", "id * 3 AS v"))
    store.analyzeZoneMaps("t", Seq("k"))
    store.refreshZoneMaps("t", Seq("k", "v")) // superset: v missing in sidecar
    assert(store.scan(store.zoneMapTable("t")).columns.contains("v__min"))
    // SUBSET after appends: survivors carry v stats the delta lacks — a
    // naive incremental union would not even resolve; must re-analyze
    store.append("t", spark.range(500, 600)
      .selectExpr("id AS k", "id * 3 AS v"))
    store.refreshZoneMaps("t", Seq("k"))
    val zm = store.scan(store.zoneMapTable("t"))
    assert(!zm.columns.contains("v__min") && zm.columns.contains("k__min"))
    assert(zm.select(max(col("k__max"))).first().getLong(0) == 599L,
      "the re-analyze must cover the appended files")
  }

  test("bloom analyzed-column set survives an all-files-dead refresh") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 500)
      .selectExpr("CAST(id AS STRING) AS h", "id AS v"))
    store.analyzeBloomFilters("t", Seq("h"), bits = 4096, hashes = 3)
    // every recorded file dies with nothing fresh to index: a takedown
    // empties the table before the next append lands
    store.overwrite("t", spark.range(0, 1).where(lit(false))
      .selectExpr("CAST(id AS STRING) AS h", "id AS v"))
    store.refreshBloomFilters("t") // maintenance cadence, no columns
    // the sidecar has zero DATA rows but still records the analyzed set
    assert(store.scan(store.bloomTable("t"))
      .where(col("file") =!= "__analyzed__").isEmpty)
    assert(store.scan(store.bloomTable("t"))
      .select("column").distinct().collect().map(_.getString(0)).toSeq
      == Seq("h"))
    // …so the NEXT maintenance refresh regains pruning instead of
    // no-opping forever (the old failure: empty sidecar → no recorded
    // columns → refresh(name) never indexes anything again)
    store.append("t", spark.range(9000, 9500)
      .selectExpr("CAST(id AS STRING) AS h", "id AS v"))
    store.refreshBloomFilters("t")
    val got = store.scanBloomPruned("t", "h", "9123").collect()
    assert(got.length == 1 && got.head.getLong(1) == 9123L)
    assert(store.scan(store.bloomTable("t"))
      .where(col("file") =!= "__analyzed__").count() > 0,
      "fresh files must be re-indexed after the empty window")
    // params survived the emptiness too (probe hashes like the build)
    val params = store.scan(store.bloomTable("t"))
      .select("bits", "hashes").distinct().collect()
    assert(params.length == 1 && params.head.getInt(0) == 4096)
  }

  test("bloom refresh == full analyze, params inherited, pruning exact") {
    val (store, _) = newStoreAt
    store.overwrite("t", spark.range(0, 500)
      .selectExpr("CAST(id AS STRING) AS h", "id AS v"))
    store.analyzeBloomFilters("t", Seq("h"), bits = 4096, hashes = 3)
    store.append("t", spark.range(9000, 9500)
      .selectExpr("CAST(id AS STRING) AS h", "id AS v"))
    store.refreshBloomFilters("t", Seq("h"))
    val incremental = rows(store.scan(store.bloomTable("t"))
      .select(col("file"), col("column"),
        array_sort(col("positions")).as("positions"), col("bits"), col("hashes")))
    store.analyzeBloomFilters("t", Seq("h"), bits = 4096, hashes = 3)
    val full = rows(store.scan(store.bloomTable("t"))
      .select(col("file"), col("column"),
        array_sort(col("positions")).as("positions"), col("bits"), col("hashes")))
    assert(incremental == full,
      "incremental Bloom refresh must equal the full analyze")
    val got = store.scanBloomPruned("t", "h", "9123").collect()
    assert(got.length == 1 && got.head.getLong(1) == 9123L)
  }
}
