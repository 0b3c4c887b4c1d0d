package graft.streaming

import graft.ops.Merge
import graft.table.TableStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2.9).
  *
  * The reference's append/upsert runs are incremental micro-batches over an
  * external table with `MAX(_id)+1` continuation bookkeeping
  * (warehouse.py:13-31); the Spark-native equivalent is a file-source stream
  * with `Trigger.AvailableNow` + checkpointed offsets, where each micro-batch
  * runs the same append/merge the batch pipeline uses (`foreachBatch`).
  * Windowed aggregation helpers are expressed once and usable from both
  * batch and streaming plans (same functions, same semantics; in streaming
  * add `withWatermark` for state eviction).
  */
object StreamingIngest {

  /** Incrementally ingest files appearing under `sourceDir` into `table`.
    * Each micro-batch appends (or merges when `uniqueKeys` is set) through
    * the same TableStore used by batch. Processes everything available, then
    * stops (AvailableNow) — rerunning continues from the checkpoint. */
  def ingestAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      format: String, // csv | json | parquet
      store: TableStore,
      table: String,
      checkpointDir: String,
      uniqueKeys: Seq[String] = Nil,
      rowNumberColumn: String = "_id",
      updatedAtColumn: String = "_updated_at"
  ): Unit = {
    val reader = spark.readStream.schema(schema)
    val stream = format match {
      case "csv"     => reader.option("header", true).csv(sourceDir)
      case "json"    => reader.json(sourceDir)
      case "parquet" => reader.parquet(sourceDir)
      case other     => throw new IllegalArgumentException(s"format: $other")
    }
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ts = new Timestamp(System.currentTimeMillis())
        val start = store.nextRowNumberStart(table, rowNumberColumn)
        val numbered = graft.ops.RowNumbers
          .withRowNumbers(batch, rowNumberColumn, start)
        val stamped = graft.ops.UpdatedAt.stamp(numbered, ts, updatedAtColumn)
        if (uniqueKeys.isEmpty || !store.exists(table)) {
          store.append(table, stamped)
        } else {
          store.overwrite(table, Merge.merge(
            store.scan(table), stamped, ts,
            Merge.MergeSpec(uniqueKeys = uniqueKeys,
              preserveColumns = Seq(rowNumberColumn),
              updatedAtColumn = Some(updatedAtColumn),
              dedupOrderCol = Some(rowNumberColumn))))
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def flattenWindow(aggDf: DataFrame, windowCol: String, startAlias: String): DataFrame = {
    val rest = aggDf.columns.filterNot(_ == windowCol).map(col)
    aggDf.select(col(s"$windowCol.start").as(startAlias) +: rest.toIndexedSeq: _*)
  }

  /** Tumbling-window aggregation (batch or streaming input). */
  def tumblingAgg(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      keys: Seq[String],
      aggs: Seq[Column]
  ): DataFrame =
    flattenWindow(
      df.groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*),
      "window", "window_start")

  /** Sliding-window aggregation. */
  def slidingAgg(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      slide: String,
      keys: Seq[String],
      aggs: Seq[Column]
  ): DataFrame =
    flattenWindow(
      df.groupBy(window(col(tsCol), windowLen, slide) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*),
      "window", "window_start")

  /** Session-window aggregation (gap-based). */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      gap: String,
      keys: Seq[String],
      aggs: Seq[Column]
  ): DataFrame =
    flattenWindow(
      df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*),
      "session_window", "session_start")

  /** Streaming deduplication bounded by event-time watermark: drops rows
    * whose key was already seen within the watermark horizon — the
    * streaming counterpart of the batch exact-dedup operator, with state
    * eviction so the key set never grows unboundedly (the property that
    * makes streaming dedup viable over an infinite training-data feed). */
  def dedupWithinWatermark(
      df: DataFrame,
      tsCol: String,
      watermark: String,
      keyCols: Seq[String]
  ): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming variant with watermark, for unbounded inputs. */
  def tumblingAggStreaming(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      watermark: String,
      keys: Seq[String],
      aggs: Seq[Column]
  ): DataFrame =
    tumblingAgg(df.withWatermark(tsCol, watermark), tsCol, windowLen, keys, aggs)
}
