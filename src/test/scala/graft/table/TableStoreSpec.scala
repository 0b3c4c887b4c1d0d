package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TableStoreSpec extends SparkSpec {

  private def newStore = new TableStore(spark,
    Files.createTempDirectory("graft_store").toString)

  test("overwrite then scan roundtrip; exists/list/drop") {
    val store = newStore
    assert(!store.exists("t"))
    store.overwrite("t", spark.range(5).toDF("v"))
    assert(store.exists("t"))
    assert(store.scan("t").count() == 5)
    assert(store.list() == Seq("t"))
    store.drop("t")
    assert(!store.exists("t"))
    intercept[IllegalArgumentException](store.scan("t"))
  }

  test("overwrite replaces state atomically (old snapshot GC'd)") {
    val store = newStore
    store.overwrite("t", spark.range(5).toDF("v"))
    store.overwrite("t", spark.range(100, 103).toDF("v"))
    val vals = store.scan("t").collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == Seq(100L, 101L, 102L))
  }

  test("append unions; schema evolution adds columns null-filled") {
    val store = newStore
    store.append("t", spark.range(3).toDF("v"))
    store.append("t", spark.range(3, 5).toDF("v")
      .withColumn("extra", lit("x")))
    val df = store.scan("t")
    assert(df.columns.toSet == Set("v", "extra"))
    assert(df.count() == 5)
    assert(df.where(col("extra").isNull).count() == 3)
  }

  test("append with type change on existing column is a hard error") {
    val store = newStore
    store.append("t", spark.range(3).toDF("v"))
    val e = intercept[IllegalArgumentException] {
      store.append("t", spark.range(2).toDF("v")
        .select(col("v").cast("string").as("v")))
    }
    assert(e.getMessage.contains("Type change not allowed"))
  }

  test("createLike clones schema with zero rows (WHERE 1=0)") {
    val store = newStore
    store.createLike("t", spark.range(9).toDF("v"))
    assert(store.scan("t").count() == 0)
    assert(store.scan("t").columns.toSeq == Seq("v"))
    // createLike on existing table is a no-op
    store.overwrite("t", spark.range(2).toDF("v"))
    store.createLike("t", spark.range(9).toDF("other"))
    assert(store.scan("t").columns.toSeq == Seq("v"))
  }

  test("nextRowNumberStart: missing table/column → 1; else MAX+1") {
    val store = newStore
    assert(store.nextRowNumberStart("nope") == 1L)
    store.overwrite("t", spark.range(7).toDF("v"))
    assert(store.nextRowNumberStart("t") == 1L) // no _id column
    store.overwrite("t", spark.range(7).toDF("_id"))
    assert(store.nextRowNumberStart("t") == 7L) // max 6 + 1
  }
}
