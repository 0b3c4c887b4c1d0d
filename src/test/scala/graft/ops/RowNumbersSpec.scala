package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RowNumbersSpec extends SparkSpec {

  test("gap-free, starts at offset, order-preserving within partitions") {
    val df = spark.range(0, 10007, 1, numPartitions = 13).toDF("v")
    val out = RowNumbers.withRowNumbers(df, "_id", start = 5)
    val ids = out.select("_id").collect().map(_.getLong(0)).sorted
    assert(ids.head == 5 && ids.last == 5 + 10007 - 1)
    assert(ids.distinct.length == 10007) // gap-free & unique
    // column is first
    assert(out.columns.head == "_id")
  }

  test("ordered variant assigns ids in sort order") {
    val df = spark.range(0, 1000, 1, 7).toDF("v")
      .withColumn("k", col("v") * -1)
    val out = RowNumbers.withRowNumbersOrdered(df, Seq(col("k")), "_id", 1)
    val rows = out.select("_id", "k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.sortBy(_._1).map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    assert(rows.map(_._1).min == 1 && rows.map(_._1).max == 1000)
  }

  test("empty input gets the column, zero rows") {
    val df = spark.range(0).toDF("v")
    val out = RowNumbers.withRowNumbers(df.where(lit(false)), "_id")
    assert(out.columns.toSeq == Seq("_id", "v"))
    assert(out.count() == 0)
  }

  test("multi-file ingest: strict file order via input_file_name sort (the documented recipe)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rn_files")
    // write files in non-alphabetical creation order to prove sorting matters
    java.nio.file.Files.writeString(dir.resolve("c_part3.csv"), "v\n31\n32\n")
    java.nio.file.Files.writeString(dir.resolve("a_part1.csv"), "v\n11\n12\n")
    java.nio.file.Files.writeString(dir.resolve("b_part2.csv"), "v\n21\n22\n")
    val df = spark.read.option("header", true).csv(dir.toString)
      .withColumn("f", input_file_name())
    val out = RowNumbers.withRowNumbersOrdered(df, Seq(col("f")), "_id", 1)
      .orderBy("_id").select("v").collect().map(_.getString(0))
    assert(out.toSeq == Seq("11", "12", "21", "22", "31", "32"))
  }

  test("property: gap-free for many partition counts") {
    for (parts <- Seq(1, 2, 5, 32)) {
      val df = spark.range(0, 999, 1, parts).toDF("v")
      val ids = RowNumbers.withRowNumbers(df, "_id", 100)
        .select("_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (100L until 1099L), s"parts=$parts")
    }
  }
}
