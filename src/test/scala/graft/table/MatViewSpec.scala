package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MatViewSpec extends SparkSpec {

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft_mv_spec").toString)

  private def rows(lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    (lo until hi).map(i =>
      (i, s"k${i % 5}", i * 3 % 101, BigDecimal(i) * BigDecimal("1.50")))
      .toDF("id", "k", "v", "amt")
  }

  private val measures = Seq(
    MatView.Count("n"), MatView.Sum("amt", "sum_amt"),
    MatView.Min("v", "min_v"), MatView.Max("v", "max_v"))

  private def recompute(store: TableStore): DataFrame =
    store.scan("base").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("amt").as("sum_amt"),
        min("v").as("min_v"), max("v").as("max_v"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.sorted.toSeq
    def canon(df: DataFrame) = df
      .select(cols.map(c => col(c).cast("string").as(c)): _*)
      .orderBy(cols.map(col): _*).collect().toSeq
    assert(canon(a) == canon(b))
  }

  test("incremental refresh over appends equals from-scratch recompute") {
    val store = freshStore()
    val mv = new MatView(store)
    store.overwrite("base", rows(0, 200))
    mv.define("agg", "base", Seq("k"), measures)
    assertSame(mv.read("agg"), recompute(store))
    store.append("base", rows(200, 350))
    assert(mv.refresh("agg"))
    store.append("base", rows(350, 500))
    assert(mv.refresh("agg"))
    assertSame(mv.read("agg"), recompute(store))
    // folded state tracks the full base manifest now
    assert(mv.definition("agg").folded.toSet ==
      store.readManifest("base").toSet)
  }

  test("refresh is a no-op when the base did not move") {
    val store = freshStore()
    val mv = new MatView(store)
    store.overwrite("base", rows(0, 50))
    mv.define("agg", "base", Seq("k"), measures)
    assert(!mv.refresh("agg"))
  }

  test("base overwrite triggers the full-recompute fallback (min/max shrink)") {
    val store = freshStore()
    val mv = new MatView(store)
    store.overwrite("base", rows(0, 400))
    mv.define("agg", "base", Seq("k"), measures)
    // rewrite the base to a SUBSET: folded min/max would be stale if the
    // refresh tried to delta-fold — the superset check must force a
    // recompute instead
    store.overwrite("base", rows(0, 100))
    assert(mv.refresh("agg"))
    assertSame(mv.read("agg"), recompute(store))
  }

  test("a deletion-vector delete triggers the full-recompute fallback") {
    val store = freshStore()
    val mv = new MatView(store)
    store.overwrite("base", rows(0, 300))
    mv.define("agg", "base", Seq("k"), measures)
    // a DV delete APPENDS a dv- manifest entry, so the folded-subset
    // check alone would wrongly fold the key-list parquet as data rows;
    // the refresh must recompute from the DV-applied scan instead
    store.deleteByKeysDV("base", Seq("id"),
      spark.range(0, 150).selectExpr("id"))
    assert(mv.refresh("agg"))
    assertSame(mv.read("agg"), recompute(store))
    // appends AFTER the vector fold incrementally again
    store.append("base", rows(300, 400))
    assert(mv.refresh("agg"))
    assertSame(mv.read("agg"), recompute(store))
    // a re-add of deleted ids also folds (new snapshot, unaffected by
    // the earlier vector)
    store.append("base", rows(0, 50))
    assert(mv.refresh("agg"))
    assertSame(mv.read("agg"), recompute(store))
  }

  test("define requires the base table to exist") {
    val store = freshStore()
    intercept[IllegalArgumentException] {
      new MatView(store).define("agg", "missing", Seq("k"), measures)
    }
  }

  test("reopened view refreshes from persisted definition") {
    val root = Files.createTempDirectory("graft_mv_reopen2").toString
    val store = new TableStore(spark, root)
    store.overwrite("base", rows(0, 100))
    new MatView(store).define("agg", "base", Seq("k"), measures)
    store.append("base", rows(100, 160))
    // a fresh MatView over a fresh TableStore — only disk state in common
    val mv2 = new MatView(new TableStore(spark, root))
    assert(mv2.refresh("agg"))
    assertSame(mv2.read("agg"), recompute(store))
    val d = mv2.definition("agg")
    assert(d.base == "base" && d.keys == Seq("k") && d.measures == measures)
  }

  test("duplicate output columns and plain tables are rejected") {
    val store = freshStore()
    val mv = new MatView(store)
    store.overwrite("base", rows(0, 10))
    intercept[IllegalArgumentException] {
      mv.define("agg", "base", Seq("k"),
        Seq(MatView.Count("k"), MatView.Sum("amt", "s")))
    }
    intercept[IllegalArgumentException] { mv.definition("base") }
  }
}
