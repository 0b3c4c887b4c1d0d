package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table access for the declared queries (TESTDATA.md).
  *
  * `events.ts` has shipped as either parquet TIMESTAMP(NANOS) — which Spark
  * reads only as a long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
  * [[graft.GraftSession]]) — or as TIMESTAMP(MICROS), which Spark reads as
  * TIMESTAMP_NTZ. We normalize at this boundary to the long-nanos contract
  * every downstream query assumes (`ts div 1000` → µs), so the queries and
  * the DuckDB oracles (`epoch_ns(ts)//1000`, schema-agnostic in DuckDB) agree
  * exactly regardless of which physical type the generator emitted.
  * The session timezone is UTC, so the NTZ→TZ cast is epoch-preserving and
  * matches DuckDB's naive-as-UTC reading.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as long nanoseconds plus `ts_us` TimestampType (µs,
    * truncated — matches DuckDB `make_timestamp(epoch_ns(ts)//1000)`). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    val tsNanos: Column = raw.schema("ts").dataType match {
      case LongType         => col("ts")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
      case TimestampType    => unix_micros(col("ts")) * lit(1000L)
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }
    raw
      .withColumn("ts", tsNanos)
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
  }
}
