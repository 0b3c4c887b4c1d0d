package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard assignment — Thaler &
  * Ravishankar 1996, the stable-resharding algorithm consistent hashing
  * approximates. Each document scores every shard with a 60-bit keyed hash
  * and lands on the argmax; changing the shard count from S to S+1 moves
  * EXACTLY the documents whose new shard's score wins — expected fraction
  * 1/(S+1) — where modulo sharding (`id % S`) reshuffles nearly
  * everything. At 100 TB that difference is the whole cost of a reshard:
  * a shard-map change re-copies 1/(S+1) of the corpus instead of S/(S+1).
  *
  * The hash is the engine-portable 60-bit md5 prefix (`TextHash.hmod60`
  * idiom) over `id ":" shard`, so a DuckDB oracle replays assignments
  * bit-for-bit. Per-row cost is O(S) hashes inside one codegen'd
  * projection — no shuffle, no state; ties (2⁻⁶⁰) break on the lower
  * shard id, a total order both engines share.
  */
object Sharding {

  /** The winning shard in [0, nShards) for `id` as a Column. */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards >= 1, s"rendezvousShard: nShards $nShards < 1")
    val scored = transform(
      sequence(lit(0), lit(nShards - 1)),
      s => struct(
        conv(substring(md5(concat(id.cast("string"), lit(":"),
          s.cast("string"))), 1, 15), 16, 10).cast("long").as("h"),
        (-s).cast("long").as("negshard")))
    // array_max on (h, -shard): highest hash wins, lower shard on tie
    (-array_max(scored).getField("negshard")).cast("bigint")
  }

  /** Assign every row a shard, plus the assignment under `nShards + delta`
    * and a `moved` flag — the reshard-impact report: `moved` mass is the
    * bytes a shard-count change would actually re-copy. */
  def reshardReport(
      df: DataFrame, idCol: String, nShards: Int, delta: Int = 1
  ): DataFrame = {
    require(nShards + delta >= 1, "reshardReport: target shard count < 1")
    df.select(col(idCol),
      rendezvousShard(col(idCol), nShards).as("shard_before"),
      rendezvousShard(col(idCol), nShards + delta).as("shard_after"))
      .withColumn("moved",
        (col("shard_before") =!= col("shard_after")).cast("boolean"))
  }
}
