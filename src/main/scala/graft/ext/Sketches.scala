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
}
