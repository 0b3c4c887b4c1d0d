package graft.plans

import graft.SparkSpec
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** The custom physical as-of join must agree row-for-row with the
  * union+window formulation (its executable spec), including null keys,
  * null times, ties, and self-source inputs — and must plan as
  * AsOfJoinExec with per-side shuffles and NO window operator. */
class AsOfExecSpec extends SparkSpec {

  private def randomish = {
    import spark.implicits._
    // deterministic pseudo-random events over 50 users incl. nulls & ties
    val raw = spark.range(0, 5000).select(
      col("id").as("event_id"),
      when(col("id") % 97 === 0, lit(null))
        .otherwise(col("id") * 37 % 50).as("user_id"),
      when(col("id") % 89 === 0, lit(null))
        .otherwise(col("id") * 7919 % 1000).as("us"), // many ties
      (col("id") % 3).as("kind"))
    (raw.where(col("kind") === 0).select("event_id", "user_id", "us"),
      raw.where(col("kind") > 0).select("user_id", "us"))
  }

  test("exec output == union+window output, incl. nulls and ties") {
    val (purchases, clicks) = randomish
    val viaWindow = AsOfJoin.asOfTime(purchases, clicks, "user_id", "us", "m")
    val viaExec = AsOfJoin.asOfTimeMerged(purchases, clicks, "user_id", "us", "m")
    assert(viaExec.columns.toSeq == viaWindow.columns.toSeq)
    val w = viaWindow.collect().map(_.toSeq).toSet
    val e = viaExec.collect().map(_.toSeq).toSet
    assert(e == w, s"diff: ${(e -- w).take(5)} / ${(w -- e).take(5)}")
    assert(e.nonEmpty)
  }

  test("plans as AsOfJoinExec: per-side exchanges, no Window, order preserved") {
    val (purchases, clicks) = randomish
    val df = AsOfJoin.asOfTimeMerged(purchases, clicks, "user_id", "us", "m")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(plan.contains("AsOfJoin "), s"missing custom exec:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to the window form:\n$plan")
    // keyed operators downstream reuse the exec's partitioning: a groupBy
    // on the key adds no further exchange
    val agg = AsOfJoin.asOfTimeMerged(purchases, clicks, "user_id", "us", "m")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(aggPlan).length
    assert(exchanges == 2,
      s"expected only the join's two side exchanges, got $exchanges:\n$aggPlan")
  }

  test("generic (non-long) key path agrees with the window form too") {
    // string keys route around the primitive fast path into the
    // interpreted-ordering merge — same contract
    val (p0, c0) = randomish
    val purchases = p0.select(col("event_id"),
      concat(lit("u"), col("user_id")).as("user_id"), col("us"))
    val clicks = c0.select(concat(lit("u"), col("user_id")).as("user_id"), col("us"))
    val w = AsOfJoin.asOfTime(purchases, clicks, "user_id", "us", "m")
      .collect().map(_.toSeq).toSet
    val e = AsOfJoin.asOfTimeMerged(purchases, clicks, "user_id", "us", "m")
      .collect().map(_.toSeq).toSet
    assert(e == w, s"diff: ${(e -- w).take(5)} / ${(w -- e).take(5)}")
    assert(e.nonEmpty)
  }

  test("matches the correlated-subquery semantics on a tiny explicit case") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L), (4L, 30L, 99L))
      .toDF("event_id", "user_id", "us")
    val right = Seq((10L, 100L), (10L, 200L), (20L, 60L)).toDF("user_id", "us")
    val got = AsOfJoin.asOfTimeMerged(left, right, "user_id", "us", "m")
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == Seq(
      1L -> Some(100L), 2L -> Some(200L), 3L -> None, 4L -> None))
  }
}
