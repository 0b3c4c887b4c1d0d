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

  test("argmax-cell kernel == the interpreted nearest-cell fold, incl. tie and degenerate cells") {
    import org.apache.spark.sql.functions.typedLit
    // cells incl. a duplicate vector (tie → first/lowest id wins via
    // strict >) and ids out of dense order. (A zero-norm cell is NOT in
    // the comparison set: the ANSI fold throws DIVIDE_BY_ZERO on it while
    // the kernel skips it — the kernel is strictly more robust, asserted
    // separately below; real codebooks are corpus vectors and never
    // degenerate.)
    val cells: Seq[(Long, Seq[Float], Double)] = Seq(
      (3L, Seq(1f, 0f), 1.0), (5L, Seq(1f, 0f), 1.0),
      (7L, Seq(0f, 1f), 1.0))
    val cellsLit = typedLit(cells)
    val rnd = new scala.util.Random(13)
    import spark.implicits._
    val vecs = (0L until 200L).map(i =>
      (i, Seq(rnd.nextFloat() * 2 - 1, rnd.nextFloat() * 2 - 1))).toList
    val df = vecs.toDF("id", "v")
    val fold = Similarity.nearestCellFoldForSpec(col("v"), cellsLit)
    val mism = df.select(
        call_function("graft_argmax_cell", col("v"), cellsLit).as("nat"),
        fold.as("dec"))
      .where(not(col("nat") <=> col("dec"))).count()
    assert(mism == 0, "kernel must reproduce the fold's selection exactly")
    // empty codebook → -1 (the fold's init), and a zero-norm cell's NaN
    // score is skipped rather than erroring or winning
    val empty = typedLit(Seq.empty[(Long, Seq[Float], Double)])
    val e = df.limit(1).select(
      call_function("graft_argmax_cell", col("v"), empty).as("nat")).head()
    assert(e.getLong(0) == -1L)
    val degen = typedLit(Seq[(Long, Seq[Float], Double)](
      (9L, Seq(0f, 0f), 0.0), (3L, Seq(1f, 0f), 1.0)))
    val d = df.limit(5).select(
      call_function("graft_argmax_cell", col("v"), degen).as("nat"))
      .collect().map(_.getLong(0)).toSet
    assert(d == Set(3L), s"zero-norm cell must never be selected: $d")
  }
}
