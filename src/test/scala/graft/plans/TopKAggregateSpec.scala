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
