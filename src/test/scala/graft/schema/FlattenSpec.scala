package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Struct flattening: depth-first deterministic naming, null-struct
  * propagation, arrays/maps untouched, collision fail-fast. */
class FlattenSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("a", StructType(Seq(
      StructField("x", StringType),
      StructField("b", StructType(Seq(
        StructField("y", LongType)))),
      StructField("tags", ArrayType(StringType))))),
    StructField("z", DoubleType)))

  private def df = spark.createDataFrame(
    java.util.List.of(
      Row(1L, Row("s1", Row(10L), Seq("t1", "t2")), 0.5),
      Row(2L, Row("s2", null, null), 1.5),
      Row(3L, null, 2.5)),
    schema)

  test("depth-first flattening with deterministic names; arrays untouched") {
    val out = Flatten.flattenStructs(df)
    assert(out.columns.toSeq ==
      Seq("id", "a_x", "a_b_y", "a_tags", "z"),
      "schema-order depth-first naming")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "s1" && rows(0).getLong(2) == 10L)
    assert(rows(0).getSeq[String](3) == Seq("t1", "t2"))
    // null inner struct → null leaf; null outer struct → all children null
    assert(rows(1).isNullAt(2) && !rows(1).isNullAt(1))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2) && rows(2).isNullAt(3))
    // non-struct columns pass through
    assert(rows(2).getDouble(4) == 2.5)
  }

  test("row count never changes; custom separator") {
    assert(Flatten.flattenStructs(df).count() == 3)
    assert(Flatten.flattenStructs(df, sep = "__").columns.contains("a__b__y"))
  }

  test("flattened-name collision fails fast with the colliding name") {
    val bad = spark.createDataFrame(
      java.util.List.of(Row(Row(1L), 2L)),
      StructType(Seq(
        StructField("a", StructType(Seq(StructField("b", LongType)))),
        StructField("a_b", LongType))))
    val e = intercept[IllegalArgumentException] {
      Flatten.flattenStructs(bad)
    }
    assert(e.getMessage.contains("a_b"))
  }

  test("dotted and backtick-hostile field names flatten correctly") {
    val tricky = spark.createDataFrame(
      java.util.List.of(Row(Row(7L))),
      StructType(Seq(
        StructField("a.b", StructType(Seq(StructField("c d", LongType)))))))
    val out = Flatten.flattenStructs(tricky)
    assert(out.columns.toSeq == Seq("a.b_c d"))
    assert(out.collect()(0).getLong(0) == 7L)
  }
}
