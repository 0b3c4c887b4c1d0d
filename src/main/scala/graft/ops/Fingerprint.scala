package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table checksums — the cheap equality check for
  * replicated / re-derived / time-traveled tables. A 100 TB table copied
  * to another cluster (or rebuilt from a pipeline re-run) is validated by
  * comparing ONE row per group: the row count and a commutative sum of
  * per-row hashes. Because both aggregates are order- and partitioning-
  * independent, any engine computes identical values over identical
  * logical content — no global sort, no row-level diff shuffle (that
  * escalation path is `TableStore.diffVersions`). The same idea ships in
  * pt-table-checksum (Percona) and BigQuery's FARM_FINGERPRINT recipes;
  * here the row hash is the engine-portable 60-bit md5 prefix so a DuckDB
  * oracle replays it bit-for-bit.
  *
  * Canonical row serialization: each column cast to string, nulls → a
  * chr(30) sentinel, joined on chr(31) (ASCII unit separator). Callers
  * choose columns whose string casts are engine-stable (integers,
  * strings, dates — NOT floats, whose formatting differs across
  * engines; hash float BITS via a cast to bigint upstream if needed).
  *
  * Scale shape: one narrow projection + one partial-agg exchange keyed by
  * the group columns (or a single all-agg row) — count and sum combine
  * map-side; the checksum is the decimal(38,0)-exact hash sum reduced
  * mod 2^60 so it rides a bigint on any engine. */
object Fingerprint {

  /** 2^60 — the checksum modulus (hash values are 60-bit, sums reduce
    * back into bigint range). */
  val Modulus = "1152921504606846976"

  /** Per-row 60-bit portable hash of the canonical serialization. */
  def rowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "Fingerprint.rowHash: no columns")
    val canon = concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit("\u001e"))): _*)
    conv(substring(md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")
  }

  /** One fingerprint row per group: (groupCols..., n_rows, checksum).
    * Empty `groupCols` collapses to a single whole-table row. */
  def fingerprint(
      df: DataFrame,
      groupCols: Seq[String],
      hashCols: Seq[String]
  ): DataFrame = {
    val aggd = df
      .select((groupCols.map(col) :+
        rowHash(hashCols.map(col)).as("__rh")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col("__rh")).as("__s"))
    aggd.select((groupCols.map(col) :+ col("n_rows") :+
      expr(s"CAST(__s % $Modulus AS BIGINT)").as("checksum")): _*)
  }
}
