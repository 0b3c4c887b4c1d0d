package graft.ingest

import graft.schema.{FrictionlessSchema, Sanitizer, TypeMapping}
import graft.ops.RowNumbers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Format-dispatched ingest: path → DataFrame with sanitized names, schema
  * applied-or-inferred, and the engine row-number column injected first.
  *
  * Replaces the reference's HTTP→GCS streamers (aircan/dependencies/cloud/
  * storage.py:62-222 — S1 CSV/TSV, S2 NDJSON, S3 JSON-array, S4 Parquet,
  * S5 gzip, S6 inference): Spark reads the source directly and in parallel;
  * the producer-thread/bounded-queue pipelining is Spark's pull-based
  * iterator model for free.
  *
  * Scale notes: CSV/JSON inference samples via one extra pass (use declared
  * schemas at 100 TB); gzip inputs are non-splittable (single task per file —
  * identical to the reference's single-stream behavior, document splittable
  * formats for scale).
  */
object Reader {

  final case class ReadOptions(
      format: Option[SourceFormat] = None, // None → detect from path
      schema: Option[FrictionlessSchema] = None, // None → infer
      header: Boolean = true,
      rowNumberColumn: Option[String] = Some("_id"),
      rowNumberStart: Long = 1L,
      numberAsDouble: Boolean = false,
      // CSV fidelity vs the reference (legacy postgres_loader.py:151:
      // pandas dayfirst + keep_default_na=False → only "" is null):
      dateFormat: String = "yyyy-MM-dd",
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
      nullValue: String = "",
      // HTTP(S) staging knobs for remote sources — on a cluster point
      // fetch.scratchDir at a shared filesystem so executors see the file.
      fetch: Fetch.FetchOptions = Fetch.FetchOptions()
  )

  def read(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): DataFrame = {
    val fmt = opts.format.getOrElse(SourceFormat.detect(path))
    val raw = readRaw(spark, path, fmt, opts)
    val sanitized = raw.toDF(Sanitizer.sanitizeAll(raw.columns.toIndexedSeq): _*)
    val typed = opts.schema match {
      case Some(fs) => castToSchema(sanitized, fs, opts.numberAsDouble)
      case None     => sanitized
    }
    opts.rowNumberColumn match {
      case Some(c) => RowNumbers.withRowNumbers(typed, c, opts.rowNumberStart)
      case None    => typed
    }
  }

  /** Raw format-dispatched read (no sanitize/number). Remote `http(s)://`
    * sources are staged to scratch first ([[Fetch]]) — one download per URL
    * per process, shared by the infer/validate/load passes. */
  def readRaw(spark: SparkSession, rawPath: String, fmt: SourceFormat, opts: ReadOptions): DataFrame = {
    val path = Fetch.stage(rawPath, opts.fetch)
    fmt match {
      case SourceFormat.Csv | SourceFormat.Tsv =>
        val sep = if (fmt == SourceFormat.Tsv) "\t" else ","
        val base = spark.read
          .option("header", opts.header)
          .option("sep", sep)
          .option("nullValue", opts.nullValue)
          .option("dateFormat", opts.dateFormat)
          .option("timestampFormat", opts.timestampFormat)
        opts.schema match {
          case Some(fs) =>
            // read all-string then cast (two-phase cast-audit compatible, V1)
            base.schema(allStringSchema(fs)).csv(path)
          case None => base.option("inferSchema", true).csv(path)
        }
      case SourceFormat.Ndjson =>
        val base = spark.read
        opts.schema match {
          case Some(fs) => base.schema(TypeMapping.toStructType(fs, opts.numberAsDouble)).json(path)
          case None     => base.json(path)
        }
      case SourceFormat.JsonArray =>
        val base = spark.read.option("multiLine", true)
        opts.schema match {
          case Some(fs) => base.schema(TypeMapping.toStructType(fs, opts.numberAsDouble)).json(path)
          case None     => base.json(path)
        }
      case SourceFormat.Parquet => spark.read.parquet(path)
      // ORC is self-describing like parquet (declared schemas are a cast
      // concern, not a parse concern) — splittable + predicate-pushdown-able,
      // a first-class 100 TB columnar source beside parquet
      case SourceFormat.Orc => spark.read.orc(path)
    }
  }

  /** All-string variant of a declared schema (phase 1 of the cast audit). */
  def allStringSchema(fs: FrictionlessSchema): StructType =
    StructType(TypeMapping.toStructType(fs).fields.map(_.copy(dataType = StringType, nullable = true)))

  /** Phase-2 cast of an all-string (or partially typed) frame to the declared
    * schema — P3 in SURVEY §2.2 (reference: warehouse.py:99-110 declared-
    * schema BQ load). Column order follows the declared schema. */
  def castToSchema(df: DataFrame, fs: FrictionlessSchema, numberAsDouble: Boolean = false): DataFrame = {
    val target = TypeMapping.toStructType(fs.sanitized, numberAsDouble)
    val present = df.columns.toSet
    df.select(target.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Schema inference producing a frictionless descriptor (S6; reference:
    * pipeline_ckan_to_bigquery.py:276-281). Spark samples the file itself;
    * at 100 TB pass a declared schema instead. */
  def inferSchema(spark: SparkSession, path: String, fmt: Option[SourceFormat] = None): FrictionlessSchema = {
    val f = fmt.getOrElse(SourceFormat.detect(path))
    val df = readRaw(spark, path, f, ReadOptions(schema = None))
    TypeMapping.fromStructType(
      StructType(df.schema.fields.map(fl => fl.copy(name = Sanitizer.sanitize(fl.name)))))
  }
}
