package graft.table

import graft.SparkSpec
import graft.ops.Merge
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** The 100 TB steady-state claim, proven in the plan: a full-outer MERGE
  * between a bucketed target and an identically bucketed staging batch
  * runs with ZERO hash-partitioning exchanges — neither side reshuffles. */
class BucketedMergeSpec extends SparkSpec {

  test("full-outer merge over co-bucketed tables has no exchange") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_bktm").toString)
    val target = spark.range(0, 5000, 1, 8).toDF("k")
      .withColumn("_id", col("k") + 1)
      .withColumn("v", (col("k") % 17).cast("double"))
      .withColumn("_updated_at", lit("2026-01-01 00:00:00").cast("timestamp"))
    val stage = spark.range(0, 500, 1, 4)
      .select((col("id") * 7).as("k"))
      .withColumn("_id", col("k") + 100000L)
      .withColumn("v", lit(-1.0))
    store.overwriteBucketed("tgt", target, Seq("k"), numBuckets = 8)
    store.overwriteBucketed("stg", stage, Seq("k"), numBuckets = 8)
    val merged = Merge.merge(
      store.scanBucketed("tgt"), store.scanBucketed("stg"),
      Timestamp.valueOf("2026-02-02 00:00:00"),
      Merge.MergeSpec(uniqueKeys = Seq("k"),
        preserveColumns = Seq("_id"), updatedAtColumn = Some("_updated_at"),
        strategy = Merge.MergeStrategy.FullOuter))
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin FullOuter") || plan.contains("FullOuter"),
      s"expected the full-outer join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed merge must not reshuffle either side:\n$plan")
    // and the semantics still hold
    assert(merged.count() == 5000)
    assert(merged.where(col("v") === -1.0).count() == 500)
  }

  test("a new process re-registers a bucketed table from its BUCKETSPEC sidecar") {
    // the session catalog is in-memory and per-JVM: dropping the entry is
    // the faithful in-JVM proxy for a NEW process opening the store (the
    // two-JVM chaos leg covers the real thing — a takeover operator
    // replaying a dead cascade's BM25 negation in a fresh JVM)
    val root = Files.createTempDirectory("graft_bkts").toString
    val store = new TableStore(spark, root)
    val df = spark.range(0, 1000, 1, 4).toDF("k")
      .withColumn("v", (col("k") % 13).cast("double"))
    store.overwriteBucketed("t", df, Seq("k"), numBuckets = 4)
    // the store's catalog-name scheme, replicated (root-hashed prefix)
    val catalogName = "graft_bkt_" + Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        new org.apache.hadoop.fs.Path(root).toString)) + "_t"
    assert(spark.catalog.tableExists(catalogName))
    spark.sql(s"DROP TABLE `$catalogName`") // external: files survive
    // scan re-registers WITH the bucket spec (not just the files)
    val scanned = store.scanBucketed("t")
    assert(scanned.count() == 1000)
    // the restored registration still eliminates the exchange on a
    // co-bucketed self-join — proof the BUCKETING metadata came back,
    // not just the data
    val joined = scanned.as("a").join(store.scanBucketed("t").as("b"), "k")
    assert(!joined.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "re-registered bucketing must keep the exchange-free join")
    // and appends into the restored buckets work (the chaos-leg failure)
    spark.sql(s"DROP TABLE `$catalogName`")
    store.appendBucketed("t",
      spark.range(1000, 1100, 1, 2).toDF("k")
        .withColumn("v", lit(0.0)), Seq("k"), numBuckets = 4)
    assert(store.scanBucketed("t").count() == 1100)
  }

  test("a foreign re-bucket invalidates this session's stale registration") {
    // another PROCESS re-buckets a table (new files + new BUCKETSPEC);
    // this session's catalog still holds the old spec — trusting it
    // would plan exchange-free joins assuming the old bucket count over
    // the new files, silently. The sidecar is authoritative: the next
    // access must re-register. Proxy for the foreign process: build the
    // re-bucketed table in a second store (distinct catalog entry) and
    // copy its files + sidecar over this store's.
    val rootA = Files.createTempDirectory("graft_bktf_a").toString
    val rootB = Files.createTempDirectory("graft_bktf_b").toString
    val a = new TableStore(spark, rootA)
    val b = new TableStore(spark, rootB)
    val dfOld = spark.range(0, 400, 1, 4).toDF("k")
      .withColumn("v", lit(1.0))
    val dfNew = spark.range(0, 900, 1, 4).toDF("k")
      .withColumn("v", lit(2.0))
    a.overwriteBucketed("t", dfOld, Seq("k"), numBuckets = 4)
    assert(a.scanBucketed("t").count() == 400)
    b.overwriteBucketed("t", dfNew, Seq("k"), numBuckets = 8)
    // "foreign process": replace a's files + sidecar with b's
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val to = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(to)
        else java.nio.file.Files.copy(p, to,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val aDir = java.nio.file.Paths.get(rootA, "t", "bucketed")
    org.apache.commons.io.FileUtils.deleteDirectory(aDir.toFile)
    copyTree(java.nio.file.Paths.get(rootB, "t", "bucketed"), aDir)
    // Hadoop's local fs pairs each file with a .crc sidecar — replace
    // both, or the read fails its checksum against the stale crc
    Seq("BUCKETSPEC", ".BUCKETSPEC.crc").foreach { f =>
      val src = java.nio.file.Paths.get(rootB, "t", f)
      if (java.nio.file.Files.exists(src))
        java.nio.file.Files.copy(src,
          java.nio.file.Paths.get(rootA, "t", f),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // the stale 4-bucket registration must be replaced from the sidecar
    assert(a.scanBucketed("t").count() == 900)
    a.appendBucketed("t", spark.range(900, 950, 1, 2).toDF("k")
      .withColumn("v", lit(3.0)), Seq("k"), numBuckets = 8)
    assert(a.scanBucketed("t").count() == 950)
  }

  test("same table name in two stores gets distinct catalog entries") {
    val a = new TableStore(spark, Files.createTempDirectory("graft_bkta").toString)
    val b = new TableStore(spark, Files.createTempDirectory("graft_bktb").toString)
    val dfA = spark.range(0, 10).toDF("k").withColumn("src", lit("a"))
    val dfB = spark.range(0, 20).toDF("k").withColumn("src", lit("b"))
    a.overwriteBucketed("t", dfA, Seq("k"), numBuckets = 2)
    b.overwriteBucketed("t", dfB, Seq("k"), numBuckets = 2)
    // store A's entry must survive store B's overwrite of the same name
    assert(a.scanBucketed("t").count() == 10)
    assert(b.scanBucketed("t").count() == 20)
    assert(a.scanBucketed("t").select("src").distinct().collect().head.getString(0) == "a")
  }
}
