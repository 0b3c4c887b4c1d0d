package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus statistics at 100 TB.
  *
  * The exact heavy-hitter query (`groupBy(ngram).count().orderBy(desc)`)
  * hash-shuffles every distinct n-gram — the item universe, which grows
  * with the corpus. The count-min path is universe-independent: ONE
  * narrow pass folds the stream into a fixed d×w sketch (the `graft_cms`
  * TypedImperativeAggregate — partial-aggregated like any sum, so the
  * shuffle carries mappers × d·w longs), and any candidate set is then
  * scored against the one-row sketch by pure expression lookups. Exact
  * counting stays the oracle tier; the sketch is the production tier —
  * the same two-tier pattern as `ops.Profile` and `q_percentiles`. */
object Sketches {

  /** Build the d×w count-min sketch of `itemCol` (one-row DataFrame with
    * a flat row-major `cms` array). Requires a GraftSession. */
  def cmsSketch(df: DataFrame, itemCol: Column, d: Int, w: Int): DataFrame =
    df.agg(call_function("graft_cms", itemCol, lit(d), lit(w)).as("cms"))

  /** Bucket of `item` in hash row `i` — the declarative mirror of the
    * aggregate's update path (same md5 universal-hash family). */
  def cmsBucket(item: Column, i: Int, w: Int): Column = {
    val (a, b) = TextHash.hashParams(i)
    ((lit(a) * TextHash.hmod(item) + lit(b)) % TextHash.P) % w
  }

  /** DuckDB SQL mirror of [[cmsBucket]]. */
  def cmsBucketSql(itemE: String, i: Int, w: Int): String = {
    val (a, b) = TextHash.hashParams(i)
    s"((($a * ${TextHash.hmodSql(itemE)} + $b) % ${TextHash.P}) % $w)"
  }

  // --------------------------------------------------------------------
  // KMV / bottom-k theta sketches (distinct counting + cross-slice set
  // overlap). The distinct-question analogue of the CMS frequency path:
  // `graft_kmv(item, k)` keeps the k smallest distinct md5 hashes per
  // slice — a mergeable k-long synopsis — and intersection/union/Jaccard
  // between ANY two slices become pure expression arithmetic over two
  // one-row sketches. No distinct-key shuffle of the item universe,
  // ever. Exact when a slice has fewer than k distinct items (the
  // sketch IS the hash set); (k−1)/θ-style estimation beyond
  // (σ ≈ n/√(k−2)). All hashes come from the shared md5 family, so the
  // DuckDB oracle rebuilds identical sketches via ORDER BY h LIMIT k.
  // --------------------------------------------------------------------

  /** Build the bottom-k sketch of `itemCol` (one-row DataFrame with the
    * sorted-ascending `kmv` hash array). Requires a GraftSession. */
  def kmvSketch(df: DataFrame, itemCol: Column, k: Int): DataFrame =
    df.agg(call_function("graft_kmv", itemCol, lit(k)).as("kmv"))

  /** Sampling threshold θ of a sketch: the largest retained hash when the
    * sketch is full, else P (the slice's full hash set is present). */
  def kmvTheta(s: Column, k: Int): Column =
    when(size(s) < k, lit(TextHash.P)).otherwise(element_at(s, size(s)))

  /** Distinct-count estimate of one sketch: exact below k, else the
    * classic KMV estimator (k−1)·P / h₍k₎. */
  def kmvDistinct(s: Column, k: Int): Column =
    when(size(s) < k, size(s).cast("double"))
      .otherwise((lit((k - 1).toDouble) * lit(TextHash.P.toDouble)) /
        element_at(s, lit(k)).cast("double"))

  /** Cross-slice overlap from two sketches: struct(est_inter, est_union,
    * jaccard). Composition rule: θ = min(θa, θb); hashes below θ form a
    * uniform P/θ-rate sample of EACH slice's distinct items, so the
    * sampled intersection/union scale by P/θ. Jaccard is the sampled
    * ratio (null when both slices are empty). Exact when both slices
    * stayed under k. */
  def kmvOverlap(a: Column, b: Column, k: Int): Column = {
    val theta = least(kmvTheta(a, k), kmvTheta(b, k))
    val sa = filter(a, h => h < theta)
    val sb = filter(b, h => h < theta)
    val c = size(array_intersect(sa, sb))
    val u = size(array_union(sa, sb))
    val scale = lit(TextHash.P.toDouble) / theta.cast("double")
    struct(
      (c.cast("double") * scale).as("est_inter"),
      (u.cast("double") * scale).as("est_union"),
      (c.cast("double") / u.cast("double")).as("jaccard"))
  }

  /** Estimated count for each row of `candidates`: `min_i cms[i·w +
    * bucket_i(item)]`. The sketch (one row) broadcasts; the candidate
    * side stays narrow — no join on the item universe anywhere. */
  def cmsEstimate(
      candidates: DataFrame,
      itemCol: Column,
      sketch: DataFrame,
      d: Int,
      w: Int,
      outCol: String = "cms_n"
  ): DataFrame = {
    val rows = (0 until d).map(i =>
      element_at(col("cms"),
        (lit(i * w) + cmsBucket(itemCol, i, w) + 1).cast("int")))
    candidates.crossJoin(broadcast(sketch))
      .withColumn(outCol, if (rows.size == 1) rows.head else least(rows: _*))
      .drop("cms")
  }

  /** Equi-join cardinality estimate from two count-min sketches of the
    * join keys: `min_i ⟨row_i(A), row_i(B)⟩` (the AMS inner-product
    * estimator through CMS rows — Cormode & Muthukrishnan 2005 §4.2;
    * Alon, Matias & Szegedy 1996 for the F₂ core). NEVER underestimates:
    * every hash collision only adds cross-mass, so
    * est ≥ |A ⋈ B| = Σ_k cntA(k)·cntB(k) exactly as CMS point queries
    * never undercount.
    *
    * This is plan-time join sizing at 100 TB: each side folds to a d×w
    * sketch in ONE narrow pass (no key shuffle — the exact answer needs
    * the join's own exchange), and the estimate is expression arithmetic
    * over two one-row frames. Pick broadcast vs shuffle vs skew-salting
    * BEFORE paying for the join; the estimator is also exactly the
    * self-join size bound (second frequency moment) that flags skewed
    * keys: est(A ⋈ A) >> |A| means heavy hitters.
    *
    * Products accumulate in decimal(38,0): at 10¹¹-row sides a bucket
    * product alone overflows int64. Output: one row, `outCol` decimal. */
  def cmsJoinSize(
      sketchA: DataFrame,
      sketchB: DataFrame,
      d: Int,
      w: Int,
      outCol: String = "join_size_est"
  ): DataFrame = {
    require(d >= 1 && w >= 1, s"cmsJoinSize: d=$d w=$w")
    val d38 = "decimal(38,0)"
    val ips = (0 until d).map { i =>
      aggregate(
        zip_with(
          slice(col("__a"), i * w + 1, w),
          slice(col("__b"), i * w + 1, w),
          (x, y) => x.cast(d38) * y.cast(d38)),
        lit(0L).cast(d38),
        (acc, v) => (acc + v).cast(d38))
    }
    sketchA.select(col("cms").as("__a"))
      .crossJoin(broadcast(sketchB.select(col("cms").as("__b"))))
      .select((if (ips.size == 1) ips.head else least(ips: _*)).as(outCol))
  }
}
