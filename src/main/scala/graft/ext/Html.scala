package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawl curation — the step between the raw
  * fetch (the reference's HTTP download util) and every text-quality
  * operator in this package: strip markup, drop script/style payloads,
  * decode the common entities, collapse whitespace. A deliberately
  * rule-based extractor (the CCNet/C4 preprocessing posture, not a DOM
  * parser): deterministic, engine-replayable, and a pure per-row codegen'd
  * expression chain — zero shuffles, zero UDFs, linear in document bytes,
  * so it rides the same scan as the quality signals that consume it.
  *
  * Extraction order matters and is part of the spec:
  *   1. `<script>…</script>` and `<style>…</style>` blocks go FIRST
  *      (their payloads are code, not prose — and may contain `<` that
  *      the generic tag regex would mis-split on);
  *   2. remaining tags `<[^>]+>` become single spaces (so `a</p><p>b`
  *      stays two words);
  *   3. entity decode: `&nbsp;` → space BEFORE whitespace collapse; the
  *      literal entities after it; `&amp;` LAST so `&amp;lt;` decodes to
  *      the text "&lt;", not to "<" (double-decoding is the classic bug);
  *      decoded `<`/`>` are NOT re-interpreted as markup — tag stripping
  *      is already done, which is also what makes the pipeline injection-
  *      safe for downstream regex operators.
  *   4. whitespace collapse + trim.
  *
  * Link extraction reads double-quoted `href` values from the RAW html
  * (before any stripping), preserving order of appearance.
  */
object Html {

  /** Script/style payload removal — step 1 alone, exposed for callers
    * that want the markup kept but the code dropped. */
  def dropCodeBlocks(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")

  /** Visible text of an HTML document per the contract above. */
  def extractText(html: Column): Column = {
    val untagged = regexp_replace(dropCodeBlocks(html), "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Ordered array of double-quoted href values in the raw html. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))

  /** Convenience: (…, text_clean, links, n_links) for a corpus of raw
    * HTML pages — one narrow projection, no shuffle. */
  def extract(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumn("text_clean", extractText(col(htmlCol)))
      .withColumn("links", extractLinks(col(htmlCol)))
      .withColumn("n_links", size(col("links")).cast("bigint"))
}
