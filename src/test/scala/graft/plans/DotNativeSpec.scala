package graft.plans

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native dot kernel must be bit-identical to the declarative HOF spec
  * — same contract as MinHashNativeSpec for the minhash kernel. */
class DotNativeSpec extends SparkSpec {

  test("native == declarative over all pairs of real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 80).select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b"))
    val mism = a.crossJoin(b).select(
      call_function("graft_dot_scaled", col("a"), col("b")).as("nat"),
      Similarity.dotScaledDeclarative(col("a"), col("b")).as("dec"))
      .where(not(col("nat") <=> col("dec")))
    assert(mism.count() == 0, "native kernel must match the declarative spec bit-for-bit")
  }

  test("scalar rounding matches Spark round(d, 0) incl. .5 boundaries") {
    val vals = Seq(0.0, 0.5, -0.5, 1.5, 2.5, -2.5, 0.49999999999999994,
      -0.49999999999999994, 1e15 - 0.5, -(1e15 - 0.5), 123456789.4999999,
      2.5000000000000004, -2.5000000000000004, 0.15 * 7 * 1e15 / 1e15)
    val df = spark.createDataFrame(
      java.util.List.of(vals.map(Row(_)): _*),
      StructType(Seq(StructField("d", DoubleType))))
    val sparkRounded = df.select(round(col("d"), 0).cast("long")).collect().map(_.getLong(0))
    vals.zip(sparkRounded).foreach { case (d, expected) =>
      assert(DotNative.roundHalfUpToLong(d) == expected, s"mismatch for $d")
    }
  }

  test("null propagation mirrors zip_with: unequal lengths / null elements → null") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val rows = java.util.List.of(
      Row(Seq(1.0f, 2.0f), Seq(3.0f)), // unequal length
      Row(Seq(1.0f, null), Seq(3.0f, 4.0f)), // null element
      Row(null, Seq(1.0f)), // null array
      Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))) // clean
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(
      call_function("graft_dot_scaled", col("a"), col("b")).as("nat"),
      Similarity.dotScaledDeclarative(col("a"), col("b")).as("dec")).collect()
    out.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1))))
    assert(out(3).getLong(0) == DotNative.roundHalfUpToLong(3e15) + DotNative.roundHalfUpToLong(8e15))
  }

  test("similarity queries route through the native expression") {
    val p = graft.SparkEntry.queries("ext_dedup_embedding_lsh")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_dot_scaled"), "pair verification must use the codegen'd kernel")
  }
}
