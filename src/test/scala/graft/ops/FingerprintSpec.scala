package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FingerprintSpec extends SparkSpec {

  private def df(rows: (Long, Option[String], String)*) = spark.createDataFrame(
    java.util.List.of(rows.map(r => Row(r._1, r._2.orNull, r._3)): _*),
    StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("g", StringType))))

  test("checksum is order- and partitioning-independent; counts exact") {
    val base = df((1L, Some("a"), "x"), (2L, Some("b"), "x"), (3L, None, "y"),
      (4L, Some("d"), "y"), (5L, Some("e"), "y"))
    val a = Fingerprint.fingerprint(base, Seq("g"), Seq("id", "v"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Fingerprint.fingerprint(
        base.orderBy(desc("id")).repartition(7), Seq("g"), Seq("id", "v"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b, s"$a vs $b")
    assert(a.map(t => (t._1, t._2)) == Seq(("x", 2L), ("y", 3L)))
  }

  test("content changes move the checksum; null vs empty string differ") {
    def sum1(rows: (Long, Option[String], String)*): Long =
      Fingerprint.fingerprint(df(rows: _*), Nil, Seq("id", "v"))
        .first().getLong(1)
    val withNull = sum1((1L, None, "x"))
    val withEmpty = sum1((1L, Some(""), "x"))
    val withA = sum1((1L, Some("a"), "x"))
    assert(withNull != withEmpty, "null must not collide with empty string")
    assert(Set(withNull, withEmpty, withA).size == 3)
    // column-boundary injectivity: ("a","bc") vs ("ab","c") concatenate
    // identically without the separator - the chr(31) join must split them
    val two = spark.createDataFrame(
      java.util.List.of(Row("a", "bc"), Row("ab", "c")),
      StructType(Seq(StructField("c1", StringType),
        StructField("c2", StringType))))
    val hs = two.select(Fingerprint.rowHash(Seq(col("c1"), col("c2")))
      .as("h")).collect().map(_.getDecimal(0)).toSet
    assert(hs.size == 2, "boundary shift must change the row hash")
    // whole-table grouping: one row
    assert(Fingerprint.fingerprint(df((1L, Some("a"), "x"),
      (2L, Some("b"), "y")), Nil, Seq("id", "v")).count() == 1L)
  }
}
