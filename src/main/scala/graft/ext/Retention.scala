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
  * The index deletes are takedown-sized appends (tombstones / negated
  * postings), never index rewrites; physical reclamation stays where it
  * was — `compact*Index` on the maintenance cadence, and table-side GC
  * after the next `compact`. Like the underlying index deletes, the
  * cascade is at-least-once: if the process dies between the drop and an
  * index delete, re-running the cascade for the same values is safe
  * (tombstones dedup at probe time via DISTINCT; BM25 re-negation of
  * already-negated docs is prevented by the drop returning false on the
  * second run — re-issue the index deletes manually from the captured
  * ids if a partial cascade is suspected, or rebuild the index).
  *
  * Concurrency: the capture and the drop are bound together — the drop
  * commits ONLY if the manifest is still the one the capture read
  * ([[TableStore.dropPartitionsFromBasis]]); a batch appended to a
  * doomed partition mid-cascade forces a re-capture instead of being
  * silently dropped from the table while staying findable through
  * retrieval.
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

  /** One persistent index built over the table being swept. */
  sealed trait IndexTarget

  /** Near-dup LSH index `name` (tombstone family — ids suffice). */
  final case class NearDup(name: String) extends IndexTarget

  /** Positional index `name` (tombstone family — ids suffice). */
  final case class Positional(name: String) extends IndexTarget

  /** IVF vector index `name` (tombstone family — ids suffice). */
  final case class Ivf(name: String) extends IndexTarget

  /** BM25 index `name`: count negation needs the indexed text column
    * and the index's bucket count (the negated postings land in the
    * same buckets as the originals). */
  final case class Bm25(name: String, textCol: String, numBuckets: Int)
      extends IndexTarget

  /** [[TableStore.dropPartitions]] + index cascade. Returns true iff the
    * table drop committed (false = no matching partitions, no cascade). */
  def dropPartitionsCascade(
      store: TableStore, table: String, partitionCol: String,
      values: Seq[String], idCol: String, indexes: Seq[IndexTarget]
  ): Boolean = {
    val textCols = indexes.collect { case Bm25(_, t, _) => t }.distinct
    val cols = (idCol +: textCols).distinct
    var attempt = 0
    while (attempt < 8) {
      attempt += 1
      // capture BEFORE the drop, from the exact manifest the conditional
      // drop will commit against: partition filters prune the scan to the
      // doomed directories; eager checkpoint pins the rows past the commit
      val basis = store.manifestEntries(table)
      val doomed = store.scanEntries(table, basis)
        .where(col(partitionCol).isin(values: _*))
        .select(cols.map(col): _*)
        .dropDuplicates(Seq(idCol))
        .localCheckpoint(true)
      store.dropPartitionsFromBasis(table, partitionCol, values,
        basis) match {
        case 1 =>
          if (!doomed.isEmpty) indexes.foreach {
            case NearDup(n) =>
              NearDupIndex.deleteFromNearDupIndex(store, n,
                doomed.select(idCol))
            case Positional(n) =>
              Retrieval.deleteFromPositionalIndex(store, n,
                doomed.select(idCol))
            case Ivf(n) =>
              VectorIndex.deleteFromIvfIndex(store, n, doomed.select(idCol))
            case Bm25(n, textCol, numBuckets) =>
              Retrieval.deleteFromBm25Index(store, n,
                doomed.select(col(idCol), col(textCol)), textCol, idCol,
                numBuckets)
          }
          return true
        case 0 => return false
        case _ => () // a commit landed mid-cascade: re-capture and retry
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
    val doomed = store.partitionValues(table, partitionCol)
      .filter(_ < cutoff)
    doomed.nonEmpty &&
      dropPartitionsCascade(store, table, partitionCol, doomed, idCol,
        indexes)
  }
}
