package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — the local fingerprinting algorithm of
  * Schleimer, Wilkerson & Aiken (SIGMOD 2003, the MOSS algorithm). Hash
  * every char k-gram, slide a window of w consecutive hashes, keep the
  * window minimum (rightmost on ties), dedup the picks. GUARANTEE: any
  * substring match of length ≥ w + k − 1 shares at least one fingerprint,
  * and no match shorter than k is ever detected — the locality property
  * that MinHash (whole-doc similarity) and [[Dedup.duplicatedSpans]]
  * (exact positioned grams, heavier) don't give at this price.
  *
  * Scale shape: ENTIRELY per-row — gram hashing, window minima, and pick
  * dedup are higher-order functions over in-row arrays; the operator adds
  * ZERO shuffles (PlanSpec-asserted). Density is 2/(w+1) picks per gram in
  * expectation, so the output is a bounded fraction of the corpus and the
  * downstream pair-finding groupBy is the only exchange anywhere.
  *
  * The gram array is let-bound via the single-element-array transform (the
  * [[TextStats.fingerprint]] pattern): Catalyst has no let expression, and
  * referencing the gram pipeline inside the per-window lambda would re-hash
  * every gram once per window — O(n·w) md5 calls per document instead of
  * O(n).
  */
object Winnow {

  /** 60-bit md5 hash of each char k-gram, 1-indexed positions; empty when
    * the text is shorter than k. */
  private def gramHashes(s: Column, k: Int): Column =
    when(length(s) >= k,
      transform(sequence(lit(1), length(s) - (k - 1)),
        i => TextHash.hmod60(s.substr(i, lit(k)))))
      .otherwise(array().cast("array<bigint>"))

  /** Fingerprints as (idCol, pos, fp): `pos` the 1-indexed char position of
    * the selected k-gram, `fp` its 60-bit hash. Texts shorter than
    * k + w − 1 chars produce no fingerprints (no complete window). */
  def fingerprints(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 8
  ): DataFrame = {
    require(k >= 1 && w >= 1, "winnow: k and w must be >= 1")
    val picks = element_at(
      transform(array(gramHashes(col(textCol), k)), gs =>
        when(size(gs) >= w,
          array_distinct(
            transform(sequence(lit(1), size(gs) - (w - 1)), j =>
              aggregate(sequence(j, j + lit(w - 1)),
                struct(lit(Long.MaxValue).as("h"), lit(0).as("p")),
                (acc, i) =>
                  // <= makes the RIGHTMOST minimal gram win the window —
                  // the paper's tie rule (maximizes pick reuse between
                  // overlapping windows, minimizing fingerprint density)
                  when(element_at(gs, i) <= acc.getField("h"),
                    struct(element_at(gs, i).as("h"), i.as("p")))
                    .otherwise(acc)))))
          .otherwise(array().cast("array<struct<h:bigint,p:int>>"))),
      1)
    df.select(col(idCol), explode(picks).as("f"))
      .select(col(idCol), col("f.p").cast("bigint").as("pos"),
        col("f.h").as("fp"))
  }

  /** Candidate near-duplicate pairs: documents sharing ≥ `minShared`
    * fingerprints, with the shared count. Fingerprints occurring in more
    * than `maxPostings` documents are dropped first — boilerplate grams
    * would otherwise turn the self-join quadratic (the same df-cap
    * discipline as the MinHash band join).
    * Output: (id_a, id_b, shared) with id_a < id_b. */
  def sharedFingerprintPairs(
      fps: DataFrame, idCol: String,
      minShared: Int = 2, maxPostings: Int = 1000
  ): DataFrame = {
    val posting = fps.select(col(idCol).cast("bigint").as("id"), col("fp"))
      .distinct()
    val rare = posting.groupBy("fp")
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxPostings)
      .select("fp")
    val p = posting.join(rare, "fp")
    p.as("a").join(p.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }
}
