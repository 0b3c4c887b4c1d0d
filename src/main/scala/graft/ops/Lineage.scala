package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** THE lineage-cut policy, in one place. Every operator that materializes
  * an intermediate to truncate its plan (the §3.3 "enormous plans" cure:
  * multi-consumer reuse points, per-iteration states) routes through
  * [[cut]] instead of calling `.localCheckpoint` directly:
  *
  *   - with a RELIABLE checkpoint dir configured on the SparkContext
  *     (`sc.setCheckpointDir` — the cluster posture), the cut is a real
  *     `checkpoint`: at 100 TB with executor loss, localCheckpoint'd
  *     lineage is unrecoverable BY DESIGN (blocks die with their
  *     executor and there is no lineage to recompute them), so a
  *     configured dir must win everywhere, not just in Graph;
  *   - without one (single-JVM/local posture — every test and the bench),
  *     `localCheckpoint`: same plan truncation, no HDFS round-trip.
  *
  * `eager = false` fuses the materialization into the first consuming
  * action (like persist) while still cutting the plan for every consumer.
  *
  * [[release]] is the explicit end-of-life for a cut frame: Dataset.
  * `unpersist` is a silent NO-OP on checkpointed frames (the CacheManager
  * never registered them), so swapping persist→localCheckpoint orphaned
  * the old unpersist lifecycles — blocks lived until the RDD was GC'd.
  * release() unpersists the materialized RDD under the cut frame's
  * LogicalRDD directly, restoring deterministic block lifetime for
  * long-lived sessions (a bench with per-query clearCache never sees the
  * difference; a service training in a loop does). */
object Lineage {

  /** Truncate `df`'s lineage: reliable `checkpoint` when the session has
    * a checkpoint dir configured, else `localCheckpoint`. */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = eager)
    else df.localCheckpoint(eager = eager)

  /** Release the blocks held by a frame returned from [[cut]] (no-op for
    * anything else, including reliable-checkpoint frames whose files are
    * owned by the checkpoint dir). Safe to call while downstream frames
    * DERIVED from the cut frame are still unexecuted only if the caller
    * accepts recomputation-from-nothing failure — i.e. call it when the
    * cut frame is truly done, exactly like the old unpersist contract. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false); ()
    case _ => ()
  }

  /** Chainable syntax: `df.groupBy(...).agg(...).cutLineage()` — the
    * drop-in replacement for a trailing `.localCheckpoint(...)`. */
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(eager: Boolean = true): DataFrame = cut(df, eager)
  }
}
