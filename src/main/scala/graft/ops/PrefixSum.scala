package graft.ops

import graft.ops.Lineage.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sums WITHOUT an unpartitioned Window.
  *
  * `sum(x).over(Window.orderBy(k))` is the classic scale-killer: Spark
  * plans a global sort into a SINGLE partition and one task streams the
  * whole input (fine on a collapsed table today, a straggler the day the
  * table grows). This is the same distributed problem as gap-free row
  * numbers, and the same two-pass cure used by [[RowNumbers]],
  * [[graft.ext.Sampling.packSequences]] and
  * [[graft.ops.TimeSeries]]'s rolling anomalies, factored out:
  *
  *   1. range-sort on the order key — PARALLEL total order across
  *      partitions — frozen by an eager localCheckpoint (range
  *      boundaries are sampled per action; the stats pass and the output
  *      pass must read the identical partitioning);
  *   2. per-partition totals collected to the driver (O(#partitions)
  *      rows) and exclusive-prefix-summed there;
  *   3. a partition-LOCAL cumulative window seeded by each partition's
  *      offset.
  *
  * Values sum as long — callers with sums near 2^63 scale down first.
  * Checkpoint blocks are reclaimed by Spark's ContextCleaner when the
  * returned frame goes unreferenced. */
object PrefixSum {

  /** `df` + one INCLUSIVE running-sum column per (valueCol -> outCol)
    * entry, in the total order of `order`. Subtract the row's own value
    * for the exclusive variant. Ties in `order` are broken arbitrarily
    * but CONSISTENTLY across the output columns (all running sums read
    * one frozen sort), so order-insensitive consumers — CDFs grouped per
    * distinct key, like [[graft.ext.Eval]]'s collapsed score tables —
    * are deterministic; pass a total order for per-row determinism. */
  def running(
      df: DataFrame,
      order: Seq[Column],
      sums: Seq[(String, String)]
  ): DataFrame = {
    require(sums.nonEmpty, "PrefixSum.running: at least one value column")
    val pid = "__graft_ps_pid"
    val mono = "__graft_ps_mono"
    val work = df.sort(order: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn(mono, monotonically_increasing_id())
      .cutLineage()
    val aggs = sums.zipWithIndex.map { case ((v, _), i) =>
      sum(col(v).cast("long")).as(s"__s$i")
    }
    val stats = work.groupBy(col(pid)).agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    if (stats.isEmpty)
      return sums.foldLeft(df) { case (d, (_, out)) =>
        d.withColumn(out, lit(0L))
      }
    // exclusive prefix per value column: offset of each partition's
    // first row (null partition totals — all-null inputs — count as 0)
    val offsets: Seq[Map[Int, Long]] = sums.indices.map { i =>
      var acc = 0L
      stats.map { r =>
        val o = acc
        acc += (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))
        r.getInt(0) -> o
      }.toMap
    }
    val w = Window.partitionBy(col(pid)).orderBy(col(mono))
      .rowsBetween(Window.unboundedPreceding, 0)
    sums.zipWithIndex.foldLeft(work) { case (d, ((v, out), i)) =>
      d.withColumn(out,
        coalesce(sum(col(v).cast("long")).over(w), lit(0L)) +
          element_at(typedLit(offsets(i)), col(pid)))
    }.drop(pid, mono)
  }
}
