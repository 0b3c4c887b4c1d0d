package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------------------------------------------------------------
  // BPE TRAINING (Sennrich et al. 2016, arXiv:1508.07909): learn the
  // merges table itself from a corpus, completing the tokenization story
  // (train here, apply with [[tokenize]]).
  //
  // Representation: the working vocabulary keeps each word's current
  // symbol sequence as ONE delimiter-wrapped string — every symbol stored
  // as U+0001<sym>U+0002, concatenated. Under that encoding, "merge every
  // occurrence of pair (l,r), scanning left to right" is EXACTLY the
  // semantics of SQL replace(enc, [l][r] in frames,
  // [lr]): leftmost match, non-overlapping, resume after the
  // replacement — so "aaaa" + (a,a) → [aa][aa], and a pattern can never
  // match across symbol boundaries (it must span full U+0001...U+0002
  // frames). Both engines implement that replace contract, which is what
  // makes the training loop ORACLE-REPLAYABLE: the ext_bpe_train gate
  // unrolls the same count→argmax→replace iteration in DuckDB CTEs and
  // must reproduce the learned table bit-for-bit. (Texts must not contain
  // U+0001/U+0002 — the same joiner constraint as [[tokenize]]'s hash.)
  //
  // Scale shape at 100 TB: the corpus is touched ONCE (whitespace word
  // count, a partial-aggregating groupBy); every iteration after that
  // runs on the WORD VOCABULARY — orders of magnitude smaller, persisted,
  // and shrink-pruned by `minCount` (the knob that keeps the working set
  // bounded when the corpus grows: rare words cannot win a merge early
  // anyway). Per merge: one vocab-sized partial-agg pair count, a
  // LIMIT-1 argmax (count desc, pair asc — the pinned tie-break), and a
  // narrow codegen'd replace. numMerges Spark jobs total, each with a
  // one-iteration-deep lineage, no window, no driver materialization
  // beyond the single best pair per round.
  //
  // Iteration hygiene — why the loop CHECKPOINTS instead of persisting:
  // stacking persist() per round chains InMemoryRelations, and an
  // InMemoryRelation's printed form embeds its cached child plan twice,
  // so the plan DESCRIPTION doubles per round (measured: 8 KB → 18 MB in
  // 11 rounds; ~8 GB by round 20). AQE renders that string on every
  // replan (`onUpdatePlan`), which OOMs the driver long before any data
  // pressure. An eager checkpoint per round resets the logical plan to a
  // flat scan, keeping plans O(1) across rounds — the same hygiene as
  // [[Dedup.duplicateClusters]]'s label loop. A reliable checkpoint dir
  // (`sc.setCheckpointDir`) is honored for executor-loss safety on real
  // clusters; without one the loop falls back to localCheckpoint.
  // ---------------------------------------------------------------------

  private val S = "\u0001" // symbol start frame
  private val E = "\u0002" // symbol end frame

  /** Adjacent symbol pairs of an encoded word, as structs (l, r); empty
    * for single-symbol words. */
  private def pairsOf(enc: Column): Column = {
    val syms = split(enc.substr(lit(2), length(enc) - 2), s"$E$S")
    element_at(
      transform(array(syms), { ss =>
        when(size(ss) < 2, array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(sequence(lit(1), size(ss) - 1), i =>
            struct(element_at(ss, i).as("l"), element_at(ss, i + 1).as("r"))))
      }),
      1)
  }

  /** The one corpus pass: whitespace word count → framed-symbol encoding,
    * pruned below `minCount`. Everything after runs on this vocabulary. */
  private[graft] def initialVocab(
      df: DataFrame, textCol: String, minCount: Long): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .select(regexp_replace(col("w"), "(?s)(.)", s"$S$$1$E").as("enc"), col("cnt"))

  /** Count-weighted adjacent-pair totals over a framed vocabulary —
    * the per-iteration aggregation (partial-agg, vocab-sized). */
  private[graft] def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(explode(pairsOf(col("enc"))).as("p"), col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("c"))

  /** Eagerly truncate lineage for the training loop: reliable checkpoint
    * when a checkpoint dir is configured, localCheckpoint otherwise (the
    * local variant is executor-loss-fragile — fine single-JVM, set
    * `sc.setCheckpointDir` on a dynamically-allocated cluster). */
  private def truncated(df: DataFrame): DataFrame =
    graft.ops.Lineage.cut(df, eager = true)

  /** Learn `numMerges` merges from a corpus: whitespace pre-tokenization,
    * character-level initial alphabet, highest-total-count pair wins each
    * round (ties broken (l asc, r asc) in binary order — pinned so any
    * engine replays the same table). Words below `minCount` occurrences
    * are pruned from the working vocabulary before the loop. Stops early
    * when no adjacent pair remains. Returns merges in learned order
    * (index = rank, lower = earlier = higher priority for [[tokenize]]). */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 1L
  ): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var vocab = truncated(initialVocab(df, textCol, minCount))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val best = pairCounts(vocab)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ((l, r))
        val next = truncated(vocab
          .select(
            call_function("replace",
              col("enc"), lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E")).as("enc"),
            col("cnt")))
        graft.ops.Lineage.release(vocab)
        vocab = next
      }
    }
    graft.ops.Lineage.release(vocab)
    merges.toSeq
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
