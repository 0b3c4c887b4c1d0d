package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Incrementally-maintained materialized aggregate views over
  * [[TableStore]] tables.
  *
  * The 100 TB warehouse staple: a grouped aggregate the pipeline reads
  * every cycle (per-source doc counts, per-day revenue, per-host crawl
  * mass) must not cost a full base-table scan per read OR per update.
  * This view stores the aggregate as a normal store table and, on
  * [[refresh]], folds in ONLY the base snapshots appended since the last
  * refresh — O(delta + |view|) work, never O(base). All supported
  * measures are decomposable over disjoint row sets (count/sum re-add,
  * min/max re-compare), which is exactly what makes append-delta folding
  * sound; `avg` is `Sum`/`Count` derived at read time.
  *
  * Delta discovery rides the store's own manifest model: a base APPEND
  * adds snapshot dirs, so `base CURRENT ⊇ folded` ⇒ the difference is
  * the delta. Any rewrite that breaks the superset relation (overwrite,
  * merge, compaction — which may delete or change rows, where min/max
  * folding is unsound) is detected the same way and falls back to a full
  * recompute, so a refresh is ALWAYS correct, just not always
  * incremental.
  *
  * Crash safety reuses the store's single-file commit point: the view
  * state (definition + folded snapshot list) is written as a
  * `VIEWDEF-<snap>` sidecar BEFORE the view's CURRENT flips to `<snap>`,
  * and the reader resolves state via the snapshot named by CURRENT — so
  * state and data flip together, atomically, and a crash between the two
  * writes leaves the previous consistent pair live. */
final class MatView(store: TableStore) {
  import MatView._

  /** Create view `view` = `SELECT keys, measures FROM base GROUP BY keys`,
    * materialized now (one full aggregate) and incrementally refreshable
    * thereafter. */
  def define(view: String, base: String, keys: Seq[String],
      measures: Seq[Measure]): Unit = {
    require(keys.nonEmpty, "MatView: at least one group key")
    require(measures.nonEmpty, "MatView: at least one measure")
    val outs = keys ++ measures.map(_.out)
    require(outs.distinct.size == outs.size,
      s"MatView: duplicate output columns in ${outs.mkString(",")}")
    val baseSnaps = store.readManifest(base)
    // aggregate EXACTLY the manifest recorded as folded — a concurrent
    // base commit between the two reads would otherwise be in the data
    // but not in `folded`, and the next refresh would fold it again
    commit(view, Def(base, keys, measures, baseSnaps),
      aggregate(store.readState(base, baseSnaps), keys, measures))
  }

  /** Fold appended base snapshots into the view (or fully recompute when
    * the base was rewritten). Returns true when the view changed. */
  def refresh(view: String): Boolean = {
    val d = definition(view)
    val baseSnaps = store.readManifest(d.base)
    if (baseSnaps == d.folded) return false
    val delta = baseSnaps.filterNot(d.folded.contains)
    val merged =
      if (d.folded.forall(baseSnaps.contains) &&
          delta.forall(!_.startsWith("dv-"))) {
        // pure appends: new snapshots are unaffected by any deletion
        // vector already folded (vectors only erase rows that PRECEDE
        // them in the manifest), so the delta folds in directly
        // through the store's entry reader, not raw spark.read.parquet:
        // the per-entry footer-schema cache (primed at write) skips the
        // footer-inference Spark job each raw read paid per delta
        // snapshot, and the run-merged relation keeps the plan one scan
        // wide however many appends landed since the last refresh
        val deltaDf = store.scanEntries(d.base, delta)
        merge(store.scan(view), aggregate(deltaDf, d.keys, d.measures),
          d.keys, d.measures)
      } else
        // base overwritten/compacted/merged — or a deletion vector landed
        // since the last refresh: rows vanished, so delta folding is
        // unsound (count/sum can't subtract what a dv- entry names, and
        // min/max cannot "un-see" rows); recompute from the DV-applied
        // read of EXACTLY the captured manifest (a commit racing this
        // refresh must not be aggregated without being recorded as
        // folded, or the next refresh folds it twice). A refresh is
        // ALWAYS correct, just not always incremental.
        aggregate(store.readState(d.base, baseSnaps), d.keys, d.measures)
    commit(view, d.copy(folded = baseSnaps), merged)
    true
  }

  /** The view contents (a plain table scan — no base work). */
  def read(view: String): DataFrame = store.scan(view)

  /** The committed definition + refresh state for `view`. */
  def definition(view: String): Def = {
    val snaps = store.readManifest(view)
    require(snaps.size == 1, s"MatView: $view is not a materialized view")
    val f = new Path(store.tableDir(view), s"VIEWDEF-${snaps.head}")
    require(store.fs(f).exists(f),
      s"MatView: $view is not a materialized view (no VIEWDEF sidecar)")
    val in = store.fs(f).open(f)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    parseDef(new String(bytes, StandardCharsets.UTF_8))
  }

  private def commit(view: String, d: Def, data: DataFrame): Unit = {
    val snap = store.writeSnapshot(view, data)
    val dir = store.tableDir(view)
    val filesystem = store.fs(dir)
    val defFile = new Path(dir, s"VIEWDEF-$snap")
    val out = filesystem.create(defFile, true)
    try out.write(renderDef(d).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    store.commitManifest(view, Seq(snap))
    filesystem.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.startsWith("VIEWDEF-") && n != s"VIEWDEF-$snap")
        filesystem.delete(st.getPath, false)
    }
  }
}

object MatView {

  /** Decomposable aggregate measures. `out` is the stored/exposed column
    * name. Count is stored as a sum-able long; Sum keeps Spark's sum
    * result type for the input column. */
  sealed trait Measure { def out: String }
  final case class Count(out: String) extends Measure
  final case class Sum(col: String, out: String) extends Measure
  final case class Min(col: String, out: String) extends Measure
  final case class Max(col: String, out: String) extends Measure

  final case class Def(base: String, keys: Seq[String],
      measures: Seq[Measure], folded: Seq[String])

  /** Base-rows → view-rows aggregate (also applied to deltas). */
  private def aggregate(df: DataFrame, keys: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    val aggs = measures.map(aggExpr)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def aggExpr(m: Measure): Column = m match {
    case Count(out)  => count(lit(1)).as(out)
    case Sum(c, out) => sum(col(c)).as(out)
    case Min(c, out) => min(col(c)).as(out)
    case Max(c, out) => max(col(c)).as(out)
  }

  /** view-rows ⊎ delta-view-rows → view-rows: counts and sums re-add,
    * min/max re-compare. Sound only for append deltas (disjoint new rows);
    * the refresh path guarantees that by construction. */
  private def merge(cur: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    val remerge: Seq[Column] = measures.map {
      case Count(out)  => sum(col(out)).as(out)
      case Sum(_, out) => sum(col(out)).as(out)
      case Min(_, out) => min(col(out)).as(out)
      case Max(_, out) => max(col(out)).as(out)
    }
    cur.unionByName(delta, allowMissingColumns = false)
      .groupBy(keys.map(col): _*)
      .agg(remerge.head, remerge.tail: _*)
  }

  // -------------------------------------------------- VIEWDEF (de)serde

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def renderDef(d: Def): String = {
    def m(x: Measure): String = x match {
      case Count(o)  => s"""{"op": "count", "out": ${jstr(o)}}"""
      case Sum(c, o) => s"""{"op": "sum", "col": ${jstr(c)}, "out": ${jstr(o)}}"""
      case Min(c, o) => s"""{"op": "min", "col": ${jstr(c)}, "out": ${jstr(o)}}"""
      case Max(c, o) => s"""{"op": "max", "col": ${jstr(c)}, "out": ${jstr(o)}}"""
    }
    s"""{"base": ${jstr(d.base)},
       |"keys": [${d.keys.map(jstr).mkString(", ")}],
       |"measures": [${d.measures.map(m).mkString(", ")}],
       |"folded": [${d.folded.map(jstr).mkString(", ")}]}""".stripMargin
  }

  private def parseDef(s: String): Def = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(s)
    def strs(v: JValue): Seq[String] =
      v match { case JArray(xs) => xs.collect { case JString(x) => x }
        case _ => Nil }
    def str(v: JValue): String =
      v match { case JString(x) => x
        case other => throw new IllegalArgumentException(
          s"MatView: bad VIEWDEF field $other") }
    val measures = (j \ "measures") match {
      case JArray(ms) => ms.map { mv =>
        (str(mv \ "op"), mv \ "out") match {
          case ("count", o) => Count(str(o))
          case ("sum", o)   => Sum(str(mv \ "col"), str(o))
          case ("min", o)   => Min(str(mv \ "col"), str(o))
          case ("max", o)   => Max(str(mv \ "col"), str(o))
          case (op, _) => throw new IllegalArgumentException(
            s"MatView: unknown measure op $op")
        }
      }
      case _ => Nil
    }
    Def(str(j \ "base"), strs(j \ "keys"), measures, strs(j \ "folded"))
  }
}
