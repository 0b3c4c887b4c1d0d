package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, attach the payload of the
  * LATEST right row with the same key and `right.time <= left.time` — the
  * point-in-time lookup (feature value as of an event, last click before a
  * purchase, price as of a trade) that Spark has no built-in operator for.
  *
  * Spark-first formulation — NOT a per-row subquery and NOT a range
  * cross-join: tag both sides, union, and run ONE running
  * `last(payload, ignoreNulls)` window per key ordered by (time, tag).
  * Right rows sort before left rows at equal timestamps, so the match is
  * inclusive (`<=`). Cost at 100 TB: a single hash-partition-by-key +
  * sort-within-partition shuffle of left ∪ right — the same price as any
  * join on the key — and the window is a streaming O(n) pass, no
  * per-row probing. Key skew is the usual salting candidate; timestamp
  * ties among multiple right rows resolve to an identical payload time, so
  * output is deterministic in the `timeOut` column.
  */
object AsOfJoin {

  /** `left` gains `matchCol`: the greatest right `timeCol` value ≤ the left
    * row's `timeCol` within the same `keyCol` (null when no prior right
    * row). Both time columns must be the same orderable type. */
  def asOfTime(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      matchCol: String = "asof_time"
  ): DataFrame = {
    val leftCols = left.columns
    val leftStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val r = right.select(
      col(keyCol), col(timeCol).as("__t"), lit(0).as("__tag"),
      col(timeCol).as("__rt"), lit(null).cast(leftStruct).as("__l"))
    val l = left.select(
      col(keyCol), col(timeCol).as("__t"), lit(1).as("__tag"),
      lit(null).cast(right.schema(timeCol).dataType).as("__rt"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("__l"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .withColumn("__m", last(col("__rt"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l.$c")).toIndexedSeq :+
        col("__m").as(matchCol): _*)
  }
}
