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
    * row). Both time columns must be the same orderable type.
    *
    * SQL join semantics on nulls: a null key or null time on the right
    * never matches anything (those rows are dropped before the union —
    * window partitioning would otherwise group null keys together and let
    * null-key rows match each other); a null-key or null-time left row
    * survives with a null `matchCol`. */
  def asOfTime(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      matchCol: String = "asof_time"
  ): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.contains(matchCol),
      s"left already has a column named $matchCol")
    // internal working names must not collide with keyCol (the only other
    // top-level column in the tagged union) — pad until disjoint
    var p = "__asof_"
    while (Seq("t", "tag", "rt", "l", "m").exists(s => p + s == keyCol)) p += "_"
    val (tC, tagC, rtC, lC, mC) = (p + "t", p + "tag", p + "rt", p + "l", p + "m")
    val leftStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val r = right
      .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(
        col(keyCol), col(timeCol).as(tC), lit(0).as(tagC),
        col(timeCol).as(rtC), lit(null).cast(leftStruct).as(lC))
    val l = left.select(
      col(keyCol), col(timeCol).as(tC), lit(1).as(tagC),
      lit(null).cast(right.schema(timeCol).dataType).as(rtC),
      struct(leftCols.map(col).toIndexedSeq: _*).as(lC))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tC).asc, col(tagC).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .withColumn(mC, last(col(rtC), ignoreNulls = true).over(w))
      .where(col(tagC) === 1)
      .select(leftCols.map(c => col(s"$lC.$c")).toIndexedSeq :+
        col(mC).as(matchCol): _*)
  }

  /** Match directions for [[asOfDirectional]] (pandas `merge_asof`
    * surface): `Backward` = latest right time ≤ left time (the plain
    * [[asOfTime]]), `Forward` = earliest right time ≥ left time,
    * `Nearest` = whichever of the two is closer (ties → backward, the
    * pandas rule). */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  /** [[asOfTime]] with direction and an optional tolerance, for NUMERIC
    * (long) time columns — the pandas `merge_asof` contract on Spark.
    *
    * No new machinery: a FORWARD as-of is a BACKWARD as-of on negated
    * time (order-reversal is an involution), so every direction reuses
    * the same union+window plan — or the same custom physical operator
    * via `merged = true` — including its null semantics and its
    * one-keyed-shuffle cost. `Nearest` runs both passes (two keyed
    * shuffles) and keeps the closer match; `tolerance` nulls out matches
    * farther than the bound AFTER the join, which is exactly pandas
    * semantics (a nearer-but-out-of-tolerance right row does NOT fall
    * back to a farther in-tolerance one).
    *
    * Contract: `timeCol` must be integral (cast timestamps to epoch
    * first — the reason: negation needs arithmetic, and the (long, long)
    * fast path of [[graft.plans.AsOfJoinExec]] is the one worth taking);
    * times must exceed Long.MinValue for the negation to be exact. */
  def asOfDirectional(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      direction: Direction = Backward,
      tolerance: Option[Long] = None,
      matchCol: String = "asof_time",
      merged: Boolean = false
  ): DataFrame = {
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    def backward(l: DataFrame, r: DataFrame, out: String) =
      if (merged) asOfTimeMerged(l, r, keyCol, timeCol, out)
      else asOfTime(l, r, keyCol, timeCol, out)
    def neg(df: DataFrame) = df.withColumn(timeCol, -col(timeCol))
    def withinTol(m: Column, dist: Column) = tolerance match {
      case Some(tol) => when(dist <= tol, m)
      case None      => m
    }
    direction match {
      case Backward =>
        backward(left, right, matchCol)
          .withColumn(matchCol,
            withinTol(col(matchCol), col(timeCol) - col(matchCol)))
      case Forward =>
        // negate, backward-join, negate back: min{rt : rt >= lt} is
        // max{-rt : -rt <= -lt}
        neg(backward(neg(left), neg(right), matchCol))
          .withColumn(matchCol,
            withinTol(-col(matchCol), -col(matchCol) - col(timeCol)))
      case Nearest =>
        val (b, f) = ("__asof_bwd", "__asof_fwd")
        val both = asOfDirectional(
          asOfDirectional(left, right, keyCol, timeCol, Backward,
            tolerance, b, merged),
          right, keyCol, timeCol, Forward, tolerance, f, merged)
        both
          .withColumn(matchCol,
            when(col(b).isNull, col(f))
              .when(col(f).isNull, col(b))
              // ties prefer backward (pandas)
              .when(col(f) - col(timeCol) < col(timeCol) - col(b), col(f))
              .otherwise(col(b)))
          .drop(b, f)
    }
  }

  /** Same contract as [[asOfTime]], executed by the custom physical
    * operator [[graft.plans.AsOfJoinExec]] (logical node + strategy +
    * SparkPlan, SURVEY §4.3 path (c)): each side shuffles with its own
    * columns only, then a per-partition O(n) two-pointer merge with O(1)
    * state — no union widening, no window buffering. Requires a
    * GraftExtensions session (the strategy must be injected). */
  def asOfTimeMerged(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      matchCol: String = "asof_time"
  ): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    require(!left.columns.contains(matchCol),
      s"left already has a column named $matchCol")
    // fresh aliases give the right side its own attribute ids, so
    // self-joins (left and right derived from one scan) stay unambiguous
    val rFresh = right.select(
      right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val lPlan = GraftBridge.analyzed(left)
    val rPlan = GraftBridge.analyzed(rFresh)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        side: String, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"$side has no column $name"))
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]
    val (lk, lt) = (attr(lPlan, "left", keyCol), attr(lPlan, "left", timeCol))
    val (rk, rt) = (attr(rPlan, "right", keyCol), attr(rPlan, "right", timeCol))
    val mAttr = org.apache.spark.sql.catalyst.expressions
      .AttributeReference(matchCol, rt.dataType, nullable = true)()
    GraftBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinNode(lPlan, rPlan, lk, lt, rk, rt, mAttr))
  }
}
