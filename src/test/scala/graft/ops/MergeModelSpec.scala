package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Model-based merge testing: seeded random target/stage scenarios are run
  * through BOTH Merge strategies and compared against a plain in-memory
  * Scala reference model implementing the MERGE contract
  * (warehouse.py:200-297 semantics) directly. */
class MergeModelSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2026-02-02 00:00:00")

  private val schema = StructType(Seq(
    StructField("_id", LongType), StructField("k", LongType),
    StructField("a", StringType), StructField("b", DoubleType),
    StructField("_updated_at", TimestampType)))
  private val stageSchema = StructType(Seq(
    StructField("_id", LongType), StructField("k", LongType),
    StructField("a", StringType), StructField("b", DoubleType)))

  private case class T(id: Long, k: Long, a: String, b: java.lang.Double, ts: Timestamp)
  private case class S(id: Long, k: Long, a: String, b: java.lang.Double)

  /** The reference model: dedup stage by lowest _id per key, then per key
    * apply matched-changed / matched-unchanged / insert / keep. */
  private def model(target: Seq[T], stage: Seq[S]): Set[T] = {
    val deduped = stage.groupBy(_.k).map { case (_, rows) => rows.minBy(_.id) }
    val byKey = deduped.map(s => s.k -> s).toMap
    val targetKeys = target.map(_.k).toSet
    val kept = target.map { t =>
      byKey.get(t.k) match {
        case Some(s) =>
          val changed = t.a != s.a || t.b != s.b
          if (changed) T(t.id, t.k, s.a, s.b, t1) else t
        case None => t
      }
    }
    val inserts = deduped.filterNot(s => targetKeys.contains(s.k))
      .map(s => T(s.id, s.k, s.a, s.b, t1))
    kept.toSet ++ inserts
  }

  test("randomized scenarios match the reference model under both strategies") {
    val rnd = new scala.util.Random(4242)
    for (scenario <- 1 to 12) {
      val nT = 30 + rnd.nextInt(40)
      val nS = 10 + rnd.nextInt(40)
      val target = (1 to nT).map { i =>
        T(i.toLong, rnd.nextInt(50).toLong, s"v${rnd.nextInt(5)}",
          if (rnd.nextInt(8) == 0) null else rnd.nextInt(100).toDouble, t0)
      }.groupBy(_.k).map(_._2.head).toSeq // unique keys in target
      val stage = (1 to nS).map { i =>
        S(1000L + i, rnd.nextInt(70).toLong, s"v${rnd.nextInt(5)}",
          if (rnd.nextInt(8) == 0) null else rnd.nextInt(100).toDouble)
      }

      val targetDf = spark.createDataFrame(
        java.util.List.of(target.map(t => Row(t.id, t.k, t.a, t.b, t.ts)): _*), schema)
      val stageDf = spark.createDataFrame(
        java.util.List.of(stage.map(s => Row(s.id, s.k, s.a, s.b)): _*), stageSchema)

      val expected = model(target, stage)
      for (strategy <- Seq(Merge.MergeStrategy.BroadcastStage, Merge.MergeStrategy.FullOuter)) {
        val got = Merge.merge(targetDf, stageDf, t1,
          Merge.MergeSpec(uniqueKeys = Seq("k"), strategy = strategy))
          .collect()
          .map(r => T(r.getLong(0), r.getLong(1), r.getString(2),
            if (r.isNullAt(3)) null else r.getDouble(3), r.getTimestamp(4)))
          .toSet
        assert(got == expected,
          s"scenario $scenario / $strategy: \nmissing=${expected -- got}\nextra=${got -- expected}")
      }
    }
  }
}
