package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {

  test("rendezvous: deterministic, uniform-ish, single shard degenerate") {
    val ids = spark.range(0, 10000L).toDF("id")
    val assigned = ids
      .select(col("id"), Sharding.rendezvousShard(col("id"), 8).as("shard"))
    val counts = assigned.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 8L).toSet, s"all shards used: $counts")
    // 10k over 8 shards: expect ~1250 each; 4σ ≈ 135
    assert(counts.values.forall(n => n > 1000 && n < 1500),
      s"roughly uniform: $counts")
    // deterministic across evaluations
    val again = ids
      .select(col("id"), Sharding.rendezvousShard(col("id"), 8).as("shard"))
    assert(assigned.exceptAll(again).isEmpty)
    // one shard → everything on 0
    assert(ids.select(Sharding.rendezvousShard(col("id"), 1).as("s"))
      .where(col("s") =!= 0L).count() == 0L)
  }

  test("reshard 8→9 moves ~1/9, and ONLY onto the new shard") {
    val ids = spark.range(0, 9000L).toDF("id")
    val rep = Sharding.reshardReport(ids, "id", nShards = 8, delta = 1)
    val moved = rep.where(col("moved"))
    val frac = moved.count().toDouble / 9000.0
    assert(frac > 0.07 && frac < 0.15, s"expected ~1/9 moved, got $frac")
    // rendezvous monotonicity: a doc moves ONLY because the new shard's
    // score beats all old ones — so every moved doc lands on shard 8
    assert(moved.where(col("shard_after") =!= 8L).count() == 0L,
      "rendezvous never moves a doc between surviving shards")
    // unmoved docs keep their assignment by construction
    assert(rep.where(!col("moved") &&
      col("shard_before") =!= col("shard_after")).count() == 0L)
  }
}
