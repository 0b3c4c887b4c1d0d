package graft.plans

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must equal the window formulation exactly
  * (same (score desc, id asc) total order), keep buffers bounded at k, and
  * survive partial-aggregation merges across partitions. */
class TopKAggregateSpec extends SparkSpec {

  test("aggregate == window over many partitions with ties") {
    // 40 groups × 1000 candidates spread over 16 partitions, with ties on
    // score (score = id % 7) so the id tiebreak is exercised heavily
    val df = spark.range(0, 40000, 1, 16)
      .select((col("id") % 40).as("q_id"), col("id").as("c_id"),
        (col("id") % 7).cast("double").as("cosine"))
    val viaAgg = Similarity.rankTopK(df, 5)
      .orderBy("q_id", "rank").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("q_id", "c_id", "rank", "cosine")
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaAgg.size == 200)
    viaAgg.zip(viaWindow).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
      assert(a.getInt(2) == b.getInt(2) && a.getDouble(3) == b.getDouble(3))
    }
  }

  test("buffer stays bounded and ordered under adversarial insert order") {
    val buf = new TopKBuffer(3)
    Seq((1.0, 9L), (5.0, 2L), (5.0, 1L), (0.5, 7L), (9.0, 3L), (5.0, 0L))
      .foreach { case (s, i) => buf.insert(s, i) }
    assert(buf.rows.toSeq == Seq((9.0, 3L), (5.0, 0L), (5.0, 1L)))
  }

  test("serde roundtrip preserves contents; merge equals combined insert") {
    val a = new TopKBuffer(4)
    val b = new TopKBuffer(4)
    (0 until 100).foreach { i =>
      val (s, id) = ((i * 37 % 11).toDouble, i.toLong)
      if (i % 2 == 0) a.insert(s, id) else b.insert(s, id)
    }
    val ab = TopKBuffer.fromBytes(a.toBytes)
    ab.mergeFrom(TopKBuffer.fromBytes(b.toBytes))
    val all = new TopKBuffer(4)
    (0 until 100).foreach(i => all.insert((i * 37 % 11).toDouble, i.toLong))
    assert(ab.rows.toSeq == all.rows.toSeq)
  }

  test("NaN scores rank first (Spark sort order) and -0.0 ties 0.0 on id") {
    // NaN sorts above all doubles in Spark's ORDER BY ... DESC; -0.0 is
    // normalized, so the 0.0/-0.0 pair must tie-break on id, not sign.
    val rows = Seq(
      (0L, 1L, Double.NaN), (0L, 2L, 3.0), (0L, 3L, 0.0),
      (0L, 4L, -0.0), (0L, 5L, Double.NegativeInfinity))
    val df = spark.createDataFrame(rows).toDF("q_id", "c_id", "cosine")
    val viaAgg = Similarity.rankTopK(df, 4).orderBy("rank")
      .select("c_id").collect().map(_.getLong(0)).toSeq
    assert(viaAgg == Seq(1L, 2L, 3L, 4L), s"got $viaAgg")
    // buffer-level: merge order can't change the NaN/zero handling
    val buf = new TopKBuffer(4)
    rows.foreach { case (_, i, s) => buf.insert(s, i) }
    assert(buf.rows.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("null scores are excluded on both the aggregate and window paths") {
    val df = spark.createDataFrame(Seq(
        (0L, 1L, Some(2.0)), (0L, 2L, None), (0L, 3L, Some(1.0))))
      .toDF("q_id", "c_id", "cosine")
    val viaAgg = Similarity.rankTopK(df, 3)
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(viaAgg == Set(1L, 3L))
  }

  test("non-integral or non-positive k fails analysis cleanly") {
    val df = spark.range(3).select(col("id").cast("double").as("s"), col("id").as("i"))
    df.createOrReplaceTempView("topk_check_in")
    val badK = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_topk(s, i, 'x') FROM topk_check_in").collect()
    }
    assert(badK.getMessage.contains("graft_topk"))
    val fracK = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_topk(s, i, 2.7) FROM topk_check_in").collect()
    }
    assert(fracK.getMessage.contains("graft_topk"))
    val zeroK = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_topk(s, i, 0) FROM topk_check_in").collect()
    }
    assert(zeroK.getMessage.contains("graft_topk"))
  }

  test("knn queries use the bounded aggregate, not a window shuffle") {
    val plan = graft.SparkEntry.queries("ext_knn_cosine")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_topk"), "ranking must go through the bounded aggregate")
    assert(!plan.contains("RunningWindowFunction") && !plan.toLowerCase.contains("window"),
      "no full-candidate window shuffle")
    assert(plan.contains("partial_graft_topk") || plan.contains("graft_topk"),
      "partial aggregation expected")
  }
}
