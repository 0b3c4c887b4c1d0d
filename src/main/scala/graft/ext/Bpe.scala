package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization against a provided merges table — exact
  * token counts for sequence packing and token budgeting at 100 TB, where
  * the regex approximation ([[TextStats.tokenCounts]]' `n_bpeish_tokens`)
  * drifts from the real tokenizer's count by several percent.
  *
  * Algorithm (the GPT-2 family's): pre-tokenize on whitespace, start each
  * word as its character sequence, then repeatedly merge THE LEFTMOST
  * OCCURRENCE OF THE LOWEST-RANK adjacent pair until no pair in the word
  * appears in the merges table. One-occurrence-at-a-time is the operator's
  * defined semantics (deterministic for ANY table, and the form a SQL
  * oracle can replay step by step); for tables learned by actual BPE
  * training it coincides with the batch apply-all-occurrences form,
  * because any pair involving a just-merged symbol was necessarily
  * learned later and therefore ranks after the pair being applied.
  *
  * Why `mapPartitions` (the documented last resort): the merge loop is
  * data-dependent iteration over a per-word token vector with a shared
  * rank lookup — no Catalyst expression composes it (an `Expression`
  * would re-enter interpreted HOF folds per iteration with no let-bound
  * state), and the rank map should be built ONCE per partition from the
  * broadcast merges, not once per row. The stage stays narrow: one pass
  * over the corpus, no shuffle, fixed-size broadcast (a production
  * merges table is ~50k pairs ≈ a few MB).
  *
  * Output: (idCol, n_bpe_tokens, tok_md5) — the exact token count and an
  * md5 over the tokens (U+0001-joined within words, U+0002 between words), so
  * correctness gates can hash-compare the full tokenization without
  * carrying arrays. Character-level (codepoint-for-BMP) alphabet; ids
  * must be integral (cast to long).
  */
object Bpe {

  /** Encode one word: leftmost occurrence of the lowest-rank pair, until
    * no adjacent pair is in the table. */
  def encodeWord(word: String, rank: ((String, String)) => Option[Int]): Vector[String] = {
    var toks = word.map(_.toString).toVector
    var go = toks.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < toks.length - 1) {
        rank((toks(i), toks(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestPos = i
          case _                       => ()
        }
        i += 1
      }
      if (bestPos < 0) go = false
      else
        toks = (toks.take(bestPos) :+ (toks(bestPos) + toks(bestPos + 1))) ++
          toks.drop(bestPos + 2)
    }
    toks
  }

  /** Tokenize every document; merges are (left, right) pairs in rank
    * order (index = priority, lower wins). */
  def tokenize(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap: Map[(String, String), Int])
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition init: one hash-map lookup closure for every row
        val table = bc.value
        val lookup = (p: (String, String)) => table.get(p)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          val toks = words.map(w => encodeWord(w, lookup))
          val n = toks.iterator.map(_.length.toLong).sum
          val joined = toks.iterator.map(_.mkString("\u0001")).mkString("\u0002")
          md.reset()
          val digest = md.digest(joined.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, n, digest.map("%02x".format(_)).mkString)
        }
      }
      .toDF(idCol, "n_bpe_tokens", "tok_md5")
  }
}
