package graft.ext

import graft.table.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retention that reaches the persistent indexes.
  *
  * `TableStore.dropPartitions` / `expirePartitionsBelow` erase a crawl
  * date or source from the TABLE at O(metadata) cost — but a doc erased
  * that way remains findable through every persistent index built over
  * the table (near-dup LSH, BM25, positional, IVF) until someone
  * separately feeds the same ids to `deleteFrom*Index`. For a governance
  * erasure that gap is the first thing a user hits: expire a source,
  * then watch its documents keep surfacing in retrieval.
  *
  * These wrappers close the gap as one operation: capture the doomed
  * subset FIRST (a partition-pruned scan — directories outside the
  * doomed values are never listed, so the capture costs O(dropped data),
  * the floor for learning which ids die), then the O(metadata) partition
  * drop, then the per-family index delete. Tombstone families (near-dup,
  * positional, IVF) need only the ids; BM25 is log-structured count
  * negation and needs the indexed (id, text) rows re-derived — which is
  * why the capture happens before the manifest commit, while the doomed
  * partitions are still scannable.
  *
  * CRASH DURABILITY — the pending-cascade journal: the capture is
  * persisted to two ordinary store tables BEFORE the drop commits
  * (`<table>_retjournal` holds the captured doomed rows;
  * `<table>_retjournal_state` holds one row per index target plus
  * `__commit__`/`__done__` progress markers, all append-only commits).
  * The index deletes are then issued FROM THE JOURNALED ROWS, and a
  * death anywhere between the drop commit and the last index delete is
  * recoverable: the next cascade/expire call on the table (or an
  * explicit [[drainPendingCascades]], e.g. from [[Maintenance.maintain]])
  * replays exactly the not-yet-`__done__` targets from the journaled
  * payload — including the BM25 negation, replayed from the JOURNALED
  * text rather than re-derived (re-derived text that drifted from what
  * was indexed would leave the df/stats residue the BM25 delete contract
  * warns about). A cascade that died BEFORE its drop committed drains as
  * an abort (journal cleared, no index touched): the drop's success is
  * decided by the `__commit__` marker, or — for the crash window between
  * the drop commit and the marker — by the doomed values having vanished
  * from [[TableStore.partitionValues]]. The one residual ambiguity:
  * a doomed value RE-APPENDED between such a pre-marker crash and the
  * drain makes that window resolve as an abort (under-deletion — the
  * cascade can be re-run); resolving it the other way could erase
  * live docs from the indexes, the worse failure.
  *
  * The index deletes are takedown-sized appends (tombstones / negated
  * postings), never index rewrites; physical reclamation stays where it
  * was — `compact*Index` on the maintenance cadence, and table-side GC
  * after the next `compact`. The cascade is at-least-once per target:
  * tombstone replays dedup at probe time via DISTINCT; a BM25 target
  * replays only when its `__done__` marker is missing, which narrows the
  * double-negation window to a death between the negation's own appends
  * and the marker (the same non-atomicity `deleteFromBm25Index`'s three
  * appends already carry).
  *
  * Concurrency: the capture and the drop are bound together — the drop
  * commits ONLY if the manifest is still the one the capture read
  * ([[TableStore.dropPartitionsFromBasis]]); a batch appended to a
  * doomed partition mid-cascade forces a re-capture instead of being
  * silently dropped from the table while staying findable through
  * retrieval. Concurrent cascades on the SAME table from different
  * processes should be quiesced (the journal, like the underlying index
  * deletes, assumes one retention operator per table at a time).
  *
  * SYNC CONTRACT: each listed index must cover exactly the table's
  * indexed docs at capture time — the pairing the streaming
  * curate-and-index path maintains (every appended batch also
  * `append*Index`ed, every DV takedown also `deleteFrom*Index`ed). For
  * the tombstone families an over-capture is harmless (a tombstone for
  * a never-indexed id matches nothing), but BM25 is COUNT NEGATION:
  * negating a doc that was never indexed (or negating text that differs
  * from what was indexed) leaves df/stats residue that skews every
  * surviving score on the shared terms — `deleteFromBm25Index`'s own
  * contract, inherited here. If table and index have drifted, rebuild
  * the index instead of cascading. */
object Retention {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.retention")

  /** One persistent index built over the table being swept.
    * `numBuckets` (tombstone families) is only consulted by
    * [[Maintenance.maintain]]'s physical index compaction — 0 means
    * "delete-only target, never compact". */
  sealed trait IndexTarget

  /** Near-dup LSH index `name` (tombstone family — ids suffice). */
  final case class NearDup(name: String, numBuckets: Int = 0)
      extends IndexTarget

  /** Positional index `name` (tombstone family — ids suffice). */
  final case class Positional(name: String, numBuckets: Int = 0)
      extends IndexTarget

  /** IVF vector index `name` (tombstone family — ids suffice). */
  final case class Ivf(name: String, numBuckets: Int = 0)
      extends IndexTarget

  /** BM25 index `name`: count negation needs the indexed text column
    * and the index's bucket count (the negated postings land in the
    * same buckets as the originals). */
  final case class Bm25(name: String, textCol: String, numBuckets: Int)
      extends IndexTarget

  /** Pending-cascade journal tables of `table` — ordinary store tables
    * (atomic commits, GC, time travel), takedown-sized. */
  def journalName(table: String): String = s"${table}_retjournal"
  def journalStateName(table: String): String = s"${table}_retjournal_state"

  /** TEST SEAM: invoked with a label at each step boundary of the live
    * cascade ("journaled", "dropped", "committed-mark", "target-<i>") so
    * the crash spec can kill the cascade at an exact window. No-op in
    * production. */
  private[graft] var failpoint: String => Unit = _ => ()

  private val CommitKind = "__commit__"
  private val DoneKind = "__done__"

  /** [[TableStore.dropPartitions]] + index cascade. Returns true iff the
    * table drop committed (false = no matching partitions, no cascade).
    * Drains any pending journal from a crashed earlier cascade first. */
  def dropPartitionsCascade(
      store: TableStore, table: String, partitionCol: String,
      values: Seq[String], idCol: String, indexes: Seq[IndexTarget]
  ): Boolean = {
    drainPendingCascades(store, table)
    dropCascadeDrained(store, table, partitionCol, values, idCol, indexes)
  }

  /** [[dropPartitionsCascade]] body after the journal drain — shared with
    * [[expirePartitionsBelowCascade]], which has already drained (so a
    * standing no-op sweep still recovers crashed cascades) and must not
    * pay the probe twice. */
  private def dropCascadeDrained(
      store: TableStore, table: String, partitionCol: String,
      values: Seq[String], idCol: String, indexes: Seq[IndexTarget]
  ): Boolean = {
    if (indexes.isEmpty)
      return store.dropPartitions(table, partitionCol, values)
    val textCols = indexes.collect { case Bm25(_, t, _) => t }.distinct
    val cols = (idCol +: textCols).distinct
    var attempt = 0
    while (attempt < 8) {
      attempt += 1
      // capture BEFORE the drop, from the exact manifest the conditional
      // drop will commit against: partition filters prune the scan to the
      // doomed directories; the journal append materializes the rows to
      // parquet, pinning them durably past the commit (and past a crash)
      val basis = store.manifestEntries(table)
      val doomed = store.scanEntries(table, basis)
        .where(col(partitionCol).isin(values: _*))
        .select(cols.map(col): _*)
        .dropDuplicates(Seq(idCol))
      val cid = java.util.UUID.randomUUID().toString.replace("-", "")
      val hasDoomed = !doomed.isEmpty
      if (hasDoomed)
        journalWrite(store, table, cid, doomed, idCol, partitionCol,
          values, indexes)
      failpoint("journaled")
      store.dropPartitionsFromBasis(table, partitionCol, values,
        basis) match {
        case 1 =>
          failpoint("dropped")
          if (hasDoomed) {
            appendMarker(store, table, cid, CommitKind, -1)
            failpoint("committed-mark")
            runTargets(store, table, cid, idCol, indexes.zipWithIndex)
            clearCascade(store, table, cid)
          }
          return true
        case 0 =>
          if (hasDoomed) clearCascade(store, table, cid)
          return false
        case _ => // a commit landed mid-cascade: re-capture and retry
          if (hasDoomed) clearCascade(store, table, cid)
      }
    }
    throw new IllegalStateException(
      s"dropPartitionsCascade($table) kept racing concurrent commits — " +
        "quiesce writers or retry")
  }

  /** [[TableStore.expirePartitionsBelow]] + index cascade: drop every
    * partition sorting below `cutoff` (string order — ISO dates compare
    * correctly) and erase the dropped docs from the given indexes.
    * Returns true iff something was dropped. */
  def expirePartitionsBelowCascade(
      store: TableStore, table: String, partitionCol: String,
      cutoff: String, idCol: String, indexes: Seq[IndexTarget]
  ): Boolean = {
    drainPendingCascades(store, table)
    val doomed = store.partitionValues(table, partitionCol)
      .filter(_ < cutoff)
    doomed.nonEmpty &&
      dropCascadeDrained(store, table, partitionCol, doomed, idCol,
        indexes)
  }

  /** Replay any cascade that journaled its capture but died before all
    * its index deletes landed: not-yet-`__done__` targets re-issue from
    * the JOURNALED payload rows; a cascade whose drop never committed
    * (no `__commit__` marker AND its doomed values still live) is an
    * abort and its journal is cleared untouched. Idempotent and cheap
    * when nothing is pending (one existence probe + one tiny scan).
    * Called automatically at the head of every cascade/expire on the
    * table and from [[Maintenance.maintain]]. */
  def drainPendingCascades(store: TableStore, table: String): Unit = {
    val stName = journalStateName(table)
    if (!store.exists(stName)) return
    val all = store.scan(stName).collect() // targets × pending cascades
    all.groupBy(_.getAs[String]("cascade_id")).foreach { case (cid, rows) =>
      val committed = rows.exists(_.getAs[String]("kind") == CommitKind)
      val done = rows.filter(_.getAs[String]("kind") == DoneKind)
        .map(_.getAs[Int]("seq")).toSet
      val targets = rows
        .filterNot(r => Set(CommitKind, DoneKind)(r.getAs[String]("kind")))
        .sortBy(_.getAs[Int]("seq"))
      // state rows with the payload already cleared = a clearCascade was
      // interrupted between its two drops; every target had completed
      // (payload clears only after the last delete) — just finish clearing
      def payloadGone: Boolean =
        !store.exists(journalName(table)) ||
          store.scan(journalName(table))
            .where(col("__cascade_id") === cid).isEmpty
      if (targets.isEmpty || payloadGone) clearCascade(store, table, cid)
      else {
        val pcol = targets.head.getAs[String]("partition_col")
        val vals = targets.head.getSeq[String](
          targets.head.fieldIndex("part_values")).toSeq
        val idCol = targets.head.getAs[String]("id_col")
        val proceed = committed || {
          // pre-marker crash window: the drop committed iff the doomed
          // values are gone from the live layout
          val live =
            try Some(store.partitionValues(table, pcol).toSet)
            catch {
              case scala.util.control.NonFatal(e) =>
                // table dropped or re-laid-out since the crash: the drop's
                // fate is unknowable, so this drains as an abort — loudly,
                // because if the drop DID commit the dropped docs stay
                // findable until the indexes are rebuilt
                log.warn(s"pending cascade $cid on $table: liveness probe " +
                  s"failed (${e.getMessage}) — abandoning its journal; if " +
                  "the drop committed, rebuild the listed indexes")
                None
            }
          live.exists(lv => vals.forall(v => !lv.contains(v))) && {
            appendMarker(store, table, cid, CommitKind, -1); true
          }
        }
        if (proceed) {
          val pending = targets
            .filterNot(r => done.contains(r.getAs[Int]("seq")))
            .map(r => (decodeTarget(r), r.getAs[Int]("seq")))
          runTargets(store, table, cid, idCol, pending)
        }
        clearCascade(store, table, cid)
      }
    }
  }

  /** Governance introspection: the pending-cascade journal's state rows
    * for `table` — one row per (cascade, index target) plus progress
    * markers. Empty frame (correct schema) when nothing is pending. An
    * operator auditing "is any erasure half-landed?" reads this; a
    * non-empty result means [[drainPendingCascades]] (or any cascade
    * call, or [[Maintenance.maintain]]) has recovery work to do. */
  def pendingCascades(store: TableStore, table: String): DataFrame = {
    val sp = store.session
    val stName = journalStateName(table)
    if (store.exists(stName)) store.scan(stName)
    else {
      import sp.implicits._
      Seq.empty[(String, Int, String, String, String, Int)]
        .toDF("cascade_id", "seq", "kind", "index_name", "text_col",
          "num_buckets")
        .withColumn("id_col", lit(""))
        .withColumn("partition_col", lit(""))
        .withColumn("part_values", array().cast("array<string>"))
        .withColumn("created_ms", lit(0L))
        .where(lit(false))
    }
  }

  private def decodeTarget(r: org.apache.spark.sql.Row): IndexTarget =
    r.getAs[String]("kind") match {
      case "neardup"    => NearDup(r.getAs[String]("index_name"))
      case "positional" => Positional(r.getAs[String]("index_name"))
      case "ivf"        => Ivf(r.getAs[String]("index_name"))
      case "bm25" => Bm25(r.getAs[String]("index_name"),
        r.getAs[String]("text_col"), r.getAs[Int]("num_buckets"))
      case other => throw new IllegalStateException(
        s"unknown journal target kind: $other")
    }

  /** Persist the capture (payload rows, then the state rows that make the
    * cascade discoverable — payload-first so a discoverable cascade
    * always has its full payload on disk). */
  private def journalWrite(store: TableStore, table: String, cid: String,
      doomed: DataFrame, idCol: String, partitionCol: String,
      values: Seq[String], indexes: Seq[IndexTarget]): Unit = {
    val payload = doomed.withColumn("__cascade_id", lit(cid))
    if (store.exists(journalName(table)))
      store.append(journalName(table), payload)
    else store.overwrite(journalName(table), payload)
    val sp = doomed.sparkSession
    import sp.implicits._
    val meta = indexes.zipWithIndex.map { case (t, i) =>
      t match {
        case NearDup(n, _)    => (cid, i, "neardup", n, "", 0)
        case Positional(n, _) => (cid, i, "positional", n, "", 0)
        case Ivf(n, _)        => (cid, i, "ivf", n, "", 0)
        case Bm25(n, tc, nb)  => (cid, i, "bm25", n, tc, nb)
      }
    }
    val state = meta
      .toDF("cascade_id", "seq", "kind", "index_name", "text_col",
        "num_buckets")
      .withColumn("id_col", lit(idCol))
      .withColumn("partition_col", lit(partitionCol))
      .withColumn("part_values",
        array(values.map(lit): _*).cast("array<string>"))
      .withColumn("created_ms", lit(System.currentTimeMillis()))
    if (store.exists(journalStateName(table)))
      store.append(journalStateName(table), state)
    else store.overwrite(journalStateName(table), state)
  }

  /** Append a `__commit__`/`__done__` progress marker (same schema as
    * target rows — the journal is append-only; no rewrite sits between
    * an index delete and its durability record). */
  private def appendMarker(store: TableStore, table: String, cid: String,
      kind: String, seq: Int): Unit = {
    val sp = store.session
    import sp.implicits._
    store.append(journalStateName(table),
      Seq((cid, seq, kind, "", "", 0))
        .toDF("cascade_id", "seq", "kind", "index_name", "text_col",
          "num_buckets")
        .withColumn("id_col", lit(""))
        .withColumn("partition_col", lit(""))
        .withColumn("part_values", array().cast("array<string>"))
        .withColumn("created_ms", lit(System.currentTimeMillis())))
  }

  /** Issue the index deletes for one cascade FROM THE JOURNALED payload,
    * marking each target `__done__` as its delete lands. Callers pass
    * only not-yet-done targets. */
  private def runTargets(store: TableStore, table: String, cid: String,
      idCol: String, targets: Seq[(IndexTarget, Int)]): Unit = {
    lazy val payload = store.scan(journalName(table))
      .where(col("__cascade_id") === cid)
    targets.foreach { case (t, i) =>
      t match {
        case NearDup(n, _) =>
          NearDupIndex.deleteFromNearDupIndex(store, n,
            payload.select(idCol))
        case Positional(n, _) =>
          Retrieval.deleteFromPositionalIndex(store, n,
            payload.select(idCol))
        case Ivf(n, _) =>
          VectorIndex.deleteFromIvfIndex(store, n, payload.select(idCol))
        case Bm25(n, textCol, numBuckets) =>
          // tagged: count negation is not idempotent, and the crash
          // window between the delete completing and the __done__ marker
          // landing would otherwise replay it — the tag on the (last)
          // stats commit proves completion, so the replay skips
          Retrieval.deleteFromBm25IndexTagged(store, n,
            payload.select(col(idCol), col(textCol)), textCol, idCol,
            numBuckets, tag = s"rc.$cid.$i")
      }
      failpoint(s"target-pre-mark-$i")
      appendMarker(store, table, cid, DoneKind, i)
      failpoint(s"target-$i")
    }
  }

  /** Remove one cascade's journal rows. When the cascade owns every state
    * row (the normal single-operator case) both journal tables DROP — a
    * pure filesystem delete, no rewrite jobs; rows of a concurrent
    * cascade keep the tables alive and this one's rows rewrite out. */
  private def clearCascade(store: TableStore, table: String,
      cid: String): Unit = {
    val stName = journalStateName(table)
    if (!store.exists(stName)) return
    val others = store.scan(stName)
      .where(col("cascade_id") =!= cid).limit(1).count() > 0
    // payload before state, both branches: the state rows are the
    // cascade's discoverability root, so a crash between the two steps
    // leaves state-without-payload — which the drain recognizes as a
    // finished cascade mid-clear and just re-clears. The other order
    // would strand an invisible orphan payload (captured rows under an
    // erasure request) that no drain could ever see.
    if (!others) {
      store.drop(journalName(table))
      store.drop(stName)
    } else {
      if (store.exists(journalName(table)))
        store.deleteWhere(journalName(table), col("__cascade_id") === cid)
      store.deleteWhere(stName, col("cascade_id") === cid)
    }
  }
}
