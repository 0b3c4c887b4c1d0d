package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-free, order-preserving global row numbers starting at an offset — the
  * engine's one custom physical primitive (SURVEY.md §1.4/§4.3), replacing
  * the reference's streaming counter injection (aircan/dependencies/cloud/
  * storage.py:119-125,172-175,196-203,76-88) seeded by `MAX(_id)+1`
  * (warehouse.py:13-31).
  *
  * Why not built-ins:
  *   - `monotonically_increasing_id()` is NOT gap-free (partition id in the
  *     high bits),
  *   - `row_number().over(Window.orderBy(...))` collapses to ONE partition —
  *     a non-starter at 100 TB.
  *
  * Strategy (two jobs, no shuffle, no global sort):
  *   pass 1: count rows per partition (cheap job),
  *   pass 2: exclusive prefix-sum of counts → per-partition offset, applied
  *     via a broadcast-small literal map + `monotonically_increasing_id()`
  *     delta within the partition. Both passes stay in whole-stage codegen
  *     (no RDD conversion).
  *
  * Ordering contract: row numbers follow Spark's partition order, which is
  * file/offset order for a file scan. For multi-file inputs needing strict
  * global file order, sort by `input_file_name()` upstream first. The input
  * plan must be deterministic between the two passes (file scans are; plans
  * containing wide shuffles under AQE may not be — cache such inputs first,
  * or pass `cache = true`).
  */
object RowNumbers {

  private val PidCol = "__graft_pid"
  private val MonoCol = "__graft_mono"

  /** Add `colName` as the FIRST column: consecutive longs
    * start, start+1, ... in partition order. */
  def withRowNumbers(
      df: DataFrame,
      colName: String = "_id",
      start: Long = 1L,
      cache: Boolean = false
  ): DataFrame = {
    val work0 = if (cache) df.cache() else df
    val work = work0
      .withColumn(PidCol, spark_partition_id())
      .withColumn(MonoCol, monotonically_increasing_id())

    // Pass 1: per-partition (count, first mono id). monotonically_increasing_id
    // is consecutive within a partition, so mono - min(mono) is the in-partition
    // row index.
    val stats = work
      .groupBy(col(PidCol))
      .agg(count(lit(1)).as("cnt"), min(col(MonoCol)).as("mn"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)

    // Exclusive prefix sum of counts → offset of each partition's first row.
    var acc = start
    val adjust: Map[Int, Long] = stats.map { case (pid, (cnt, mn)) =>
      val offset = acc // global id of first row in this partition
      acc += cnt
      pid -> (offset - mn) // id = mono + adjust
    }.toMap

    if (adjust.isEmpty) {
      // empty input: just add the column
      return df.select(lit(null).cast("long").as(colName) +: df.columns.toIndexedSeq.map(col): _*)
    }

    val adjustCol: Column = element_at(typedLit(adjust), col(PidCol))
    work
      .withColumn(colName, adjustCol + col(MonoCol))
      .select(col(colName) +: df.columns.toIndexedSeq.map(col): _*)
  }

  /** Row numbers in a caller-defined total order (used when strict order
    * matters across splittable multi-file reads): range-partitioned sort then
    * gap-free numbering — still no single-partition window.
    *
    * The sorted frame is CACHED before numbering: a range sort's partition
    * boundaries come from a sample whose seed varies per action (RDD id),
    * so the two numbering passes over an un-materialized sort can see
    * DIFFERENT partitionings — silently corrupting ids. Materializing the
    * sort freezes one partitioning for both passes. (At very large scale
    * the cache spills to disk — MEMORY_AND_DISK — which is still cheaper
    * than a wrong answer; a checkpoint to scratch storage is the
    * cluster-grade equivalent.) */
  def withRowNumbersOrdered(
      df: DataFrame,
      orderBy: Seq[Column],
      colName: String = "_id",
      start: Long = 1L
  ): DataFrame =
    withRowNumbers(df.sort(orderBy: _*), colName, start, cache = true)
}
