package graft

import graft.export.Export
import graft.ingest.{Reader, SourceFormat}
import graft.pipeline.{Pipeline, PipelineConfig, StatusCallback, LogStatusCallback}
import graft.schema.FrictionlessSchema
import graft.table.TableStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library facade — everything a reference (aircan) user needs to
  * switch, in one place:
  *
  * {{{
  * val spark = Graft.session()                       // extensions + tuned conf
  * val store = Graft.store(spark, "/data/tables")
  * val pipe  = Graft.pipeline(spark, store)
  * pipe.run(PipelineConfig("s3://bucket/resource.csv", "my_table",
  *   IngestionMethod.Upsert, schema = Some(mySchema), validate = true,
  *   exportPath = Some("/data/out")))
  * }}}
  *
  * Lower-level pieces (Reader, Merge, Validate, Export, ext.* training-data
  * operators) are public and composable on plain DataFrames.
  */
object Graft {

  /** Session with the engine's extensions (native expressions) and
    * scale-oriented defaults registered. */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession =
    GraftSession.get(master, shufflePartitions)

  def store(spark: SparkSession, root: String): TableStore =
    new TableStore(spark, root)

  def pipeline(spark: SparkSession, store: TableStore,
      status: StatusCallback = LogStatusCallback): Pipeline =
    new Pipeline(spark, store, status)

  /** One-shot ingest: path → sanitized, typed, row-numbered DataFrame. */
  def read(spark: SparkSession, path: String,
      schema: Option[FrictionlessSchema] = None,
      format: Option[SourceFormat] = None): DataFrame =
    Reader.read(spark, path, Reader.ReadOptions(format = format, schema = schema))

  /** One-shot ordered export. */
  def export(df: DataFrame, outPath: String,
      format: SourceFormat = SourceFormat.Csv,
      singleFile: Boolean = false): Unit =
    Export.export(df, outPath, Export.ExportOptions(format = format, singleFile = singleFile))
}
