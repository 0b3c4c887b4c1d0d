package graft.export

import org.apache.spark.sql.DataFrame

/** Connector-style row-batch sink (W8): the reference pushes rows to the
  * CKAN datastore API in 250-row JSON batches (aircan/dependencies_legacy/
  * api_loader.py:214-265; `chunky()` utils.py:158-168).
  *
  * Spark-first shape: rows serialize to JSON on the executors
  * (`toJSON`, codegen'd), and each partition streams bounded batches to a
  * pluggable poster — no driver collect, memory bounded by `batchSize`,
  * parallelism = partitions. The poster is injected (and must be
  * Serializable) because this environment has no network egress; a real
  * deployment passes an HTTP POST closure.
  */
object ApiBatchSink {

  /** Default batch size matches the reference
    * (`aircan_datastore_chunk_insert_rows_size`). */
  val DefaultBatchSize = 250

  /** Serialize df to JSON rows and deliver per-partition bounded batches
    * to `post`. Returns nothing; failures in `post` fail the task (Spark
    * retries per `spark.task.maxFailures`, mirroring the reference's HTTP
    * retry). */
  def writeBatches(
      df: DataFrame,
      post: Seq[String] => Unit,
      batchSize: Int = DefaultBatchSize
  ): Unit =
    df.toJSON.foreachPartition { rows: Iterator[String] =>
      rows.grouped(batchSize).foreach(batch => post(batch))
    }
}
