package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — match dirty records (typos, OCR noise,
  * crawl-mangled titles) against a clean reference set by bounded edit
  * distance, the classic entity-resolution shape (Fellegi–Sunter blocking +
  * pairwise comparison). The reference pipeline's change-detection predicate
  * compares rows for EXACT equality; this is its approximate generalization
  * for keys that drifted in transit.
  *
  * Blocking is the scale contract: candidate pairs are generated ONLY
  * within equal values of a caller-supplied block key (first token, prefix,
  * soundex, an LSH bucket — anything cheap and deterministic), so the join
  * is Σ_b |left_b|·|right_b| instead of |left|·|right|. Edit distance runs
  * through Spark's codegen'd `levenshtein(l, r, maxDist)` threshold form,
  * which abandons a pair as soon as the running distance exceeds the bound
  * (O(maxDist·min(len)) per pair, not O(len²)) — the right inner loop when
  * the overwhelming majority of in-block pairs are non-matches.
  *
  * 100 TB shape:
  *   - no all-pairs anywhere: the block join is an equi-join Catalyst
  *     shuffles on the block key; a hot block (skewed key) is spread across
  *     `saltBuckets`×partitions by the same replicate-one-side salting as
  *     [[graft.ext.Similarity.blockedNearDupPairs]];
  *   - a fail-fast guard refuses to PLAN a degenerate blocking: if any
  *     block's |left_b|·|right_b| exceeds `maxBlockPairs` the operator
  *     raises with the offending block key instead of silently grinding a
  *     quadratic join (the semDedup skew-guard discipline) — the guard costs
  *     one pair of block-count aggregates (block-cardinality-sized);
  *   - [[bestMatch]] reduces per-pair output to one row per left record via
  *     a `min(struct(...))` aggregate — full map-side combine, never a
  *     window sort over the pair stream.
  */
object FuzzyJoin {

  /** All within-block pairs with edit distance ≤ `maxDist`:
    * (block, l_id, r_id, dist). `left`/`right` must carry (idCol, textCol,
    * blockCol); ids need not be disjoint (self-linkage callers filter
    * `l_id < r_id` themselves). */
  def blockedPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      maxDist: Int,
      maxBlockPairs: Long = 100000000L,
      saltBuckets: Int = 16
  ): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(saltBuckets > 0, "saltBuckets must be positive")
    val width = left.sparkSession.sessionState.conf.numShufflePartitions
    val l = left.select(col(blockCol).as("block"), col(idCol).as("l_id"),
      col(textCol).as("l_txt"))
    val r = right.select(col(blockCol).as("block"), col(idCol).as("r_id"),
      col(textCol).as("r_txt"))

    // fail-fast skew guard: per-block pair counts are block-cardinality-
    // sized aggregates; refuse to plan a quadratic block instead of
    // discovering it mid-join (the semDedup maxClusterSize discipline)
    val sizes = l.groupBy("block").agg(count(lit(1)).as("__ln"))
      .join(r.groupBy("block").agg(count(lit(1)).as("__rn")), Seq("block"))
      .withColumn("__pairs", col("__ln") * col("__rn"))
    val guarded = broadcast(sizes.select(
      when(col("__pairs") <= maxBlockPairs, col("block"))
        .otherwise(raise_error(concat(
          lit(s"graft.FuzzyJoin: block exceeds $maxBlockPairs candidate " +
            "pairs — refine the blocking key: block "),
          col("block").cast("string")))).as("block")))

    // replicate the left side across salt buckets, hash the right side into
    // one — a hot block spreads over saltBuckets×partitions
    val ls = l.join(guarded, Seq("block"), "left_semi")
      .withColumn("salt", explode(lit((0 until saltBuckets).toArray)))
      .repartition(width, col("block"), col("salt"))
    val rs = r.withColumn("salt", pmod(hash(col("r_id")), lit(saltBuckets)))
    ls.join(rs, Seq("block", "salt"))
      .withColumn("dist", levenshtein(col("l_txt"), col("r_txt"), maxDist))
      .where(col("dist") >= 0) // threshold form returns -1 past the bound
      .select(col("block"), col("l_id"), col("r_id"), col("dist"))
  }

  /** One best match per left record: lowest distance, lowest `r_id` on
    * ties (a total order both engines share). Left records with no
    * within-`maxDist` candidate are absent — callers wanting audit rows
    * join back against the left set. Output (l_id, r_id, dist). */
  def bestMatch(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      maxDist: Int,
      maxBlockPairs: Long = 100000000L,
      saltBuckets: Int = 16
  ): DataFrame =
    blockedPairs(left, right, idCol, textCol, blockCol, maxDist,
      maxBlockPairs, saltBuckets)
      .groupBy("l_id")
      .agg(min(struct(col("dist"), col("r_id"))).as("best"))
      .select(col("l_id"), col("best.r_id").as("r_id"),
        col("best.dist").as("dist"))
}
