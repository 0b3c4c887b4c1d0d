package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** `_updated_at` change-timestamp maintenance (P6, SURVEY §1.4).
  *
  * The reference stamps after load with `UPDATE t SET col=@ts WHERE col IS
  * NULL` (warehouse.py:337-357); since Spark rewrites table state on commit,
  * we fuse the stamp into the write path: rows lacking a timestamp get the
  * job timestamp, already-stamped rows keep theirs. Upsert-path stamping
  * (changed-rows-only) lives inside [[Merge]].
  */
object UpdatedAt {
  def stamp(df: DataFrame, ts: Timestamp, colName: String = "_updated_at"): DataFrame =
    if (df.columns.contains(colName))
      df.withColumn(colName, coalesce(col(colName), lit(ts)))
    else df.withColumn(colName, lit(ts))
}
