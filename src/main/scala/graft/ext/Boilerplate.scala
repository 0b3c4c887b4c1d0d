package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the C4/CCNet "line dedup" rule
  * re-expressed over fixed-width word segments (the synthetic corpus has no
  * newlines; a real corpus would pass its line split instead): a segment
  * that occurs verbatim in ≥ `minDocs` distinct documents is boilerplate
  * (navigation chrome, cookie banners, share buttons) and is removed from
  * EVERY document; the survivors are reassembled in original order.
  *
  * Scale shape (100 TB): the segment explode is a narrow transform; the
  * frequency count is one partial-aggregating shuffle on the segment hash
  * (128-bit md5 — the segment TEXT never shuffles for counting); the
  * boilerplate set (segments repeated across ≥ minDocs docs) is tiny
  * relative to the corpus, so AQE broadcasts it into the anti-join and the
  * corpus-side segment stream never shuffles for filtering. Only the kept
  * segments shuffle once, on doc id, for reassembly — and a pipeline that
  * just needs doc-level flags can skip the reassembly entirely.
  */
object Boilerplate {

  /** Fixed-width word segments of a text column: ceil(n/w) chunks of w
    * tokens, last chunk ragged. Same let-binding trick as
    * [[TextHash.shingles]] — the split is evaluated once per row. */
  def segments(text: Column, w: Int = 10): Column =
    element_at(
      transform(
        array(split(text, " ")), // bind once
        toks =>
          transform(
            sequence(lit(0L),
              floor((size(toks).cast("double") + (w - 1)) / w).cast("long") - 1L),
            i => array_join(slice(toks, (i * w + 1).cast("int"), lit(w)), " "))),
      1)

  /** DuckDB SQL fragment equivalent of [[segments]] (list of segment
    * strings, same ragged-tail semantics). */
  def segmentsSql(textE: String, w: Int = 10): String = {
    val toks = s"string_split($textE, ' ')"
    s"[array_to_string($toks[(i*$w+1):(i*$w+$w)], ' ') " +
      s"FOR i IN range(0, CAST(ceil(len($toks) / $w.0) AS BIGINT))]"
  }

  /** Remove segments that appear in ≥ `minDocs` distinct documents; returns
    * (idCol, clean_text) with surviving segments rejoined in order. Docs
    * whose every segment is boilerplate drop out (same as the SQL oracle's
    * inner-join + group). */
  def stripBoilerplate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 10,
      minDocs: Int = 3
  ): DataFrame = {
    val segs = df
      .select(col(idCol), posexplode(segments(col(textCol), w)).as(Seq("seg_idx", "seg")))
      .withColumn("h", md5(col("seg")))
    // frequency by 128-bit hash: the shuffle carries (hash, partial count),
    // never the segment text
    val boiler = segs.groupBy("h")
      .agg(countDistinct(col(idCol)).as("ndocs"))
      .where(col("ndocs") >= minDocs)
      .select("h")
    // boilerplate set ≪ corpus → AQE broadcasts it; corpus side stays
    // shuffle-free through the filter
    segs.join(boiler, Seq("h"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          x => x("seg")),
        " ").as("clean_text"))
  }
}
