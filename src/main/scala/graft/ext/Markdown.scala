package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown → text extraction for crawl curation — the [[Html]] companion
  * for the other big web-document format (READMEs, forums, documentation
  * corpora). Same posture: a deliberately rule-based CommonMark-subset
  * stripper, deterministic and engine-replayable, pure per-row codegen'd
  * expression chain — zero shuffles, zero UDFs.
  *
  * Rule order is part of the spec:
  *   1. fenced code blocks (``` … ```) go FIRST (their payloads are code,
  *      not prose, and may contain any of the later markers);
  *   2. inline code spans keep their CONTENT, backticks stripped
  *      (`x` reads as x in prose);
  *   3. images before links (every image is syntactically a link with a
  *      `!` prefix): `![alt](url)` → alt, `[text](url)` → text;
  *   4. line-anchored structure markers (multiline mode): ATX headers,
  *      blockquote `>`, unordered/ordered list markers, horizontal rules;
  *   5. emphasis pairs, double before single (`**` would otherwise read
  *      as two empty `*` pairs): `**b**`/`__b__` → b, `*i*`/`_i_` → i;
  *   6. whitespace collapse + trim.
  *
  * Link harvesting reads `](url)` targets from the RAW markdown minus
  * code fences (a fenced `[x](y)` is code, not a link), images included —
  * order of appearance, like [[Html.extractLinks]].
  */
object Markdown {

  /** Fenced-code removal — step 1 alone, exposed like
    * [[Html.dropCodeBlocks]]. */
  def dropCodeFences(md: Column): Column =
    regexp_replace(md, "(?s)```.*?```", " ")

  /** Visible prose of a markdown document per the contract above. */
  def extractText(md: Column): Column = {
    val noFences = dropCodeFences(md)
    val noInline = regexp_replace(noFences, "`([^`]*)`", "$1")
    val noImages = regexp_replace(noInline,
      "!\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    val noLinks = regexp_replace(noImages,
      "\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    val noStructure = Seq(
      "(?m)^#{1,6} +" -> "",        // ATX headers
      "(?m)^ {0,3}> ?" -> "",       // blockquotes
      "(?m)^ *[-*+] +" -> "",       // unordered list markers
      "(?m)^ *[0-9]+\\. +" -> "",   // ordered list markers
      "(?m)^ *([-*_] *){3,}$" -> " " // horizontal rules
    ).foldLeft(noLinks) { case (c, (pat, to)) =>
      regexp_replace(c, pat, to)
    }
    val noEmphasis = Seq(
      "\\*\\*([^*]+)\\*\\*" -> "$1",
      "__([^_]+)__" -> "$1",
      "\\*([^*]+)\\*" -> "$1",
      "\\b_([^_]+)_\\b" -> "$1"
    ).foldLeft(noStructure) { case (c, (pat, to)) =>
      regexp_replace(c, pat, to)
    }
    trim(regexp_replace(noEmphasis, "\\s+", " "))
  }

  /** Ordered array of link/image targets in the raw markdown (code fences
    * excluded — a fenced `[x](y)` is code, not a link). */
  def extractLinks(md: Column): Column =
    regexp_extract_all(dropCodeFences(md), lit("\\]\\(([^)]*)\\)"), lit(1))

  /** Convenience: (…, text_clean, links, n_links) — one narrow
    * projection, no shuffle; mirrors [[Html.extract]]. */
  def extract(df: DataFrame, mdCol: String): DataFrame =
    df.withColumn("text_clean", extractText(col(mdCol)))
      .withColumn("links", extractLinks(col(mdCol)))
      .withColumn("n_links", size(col("links")).cast("bigint"))
}
