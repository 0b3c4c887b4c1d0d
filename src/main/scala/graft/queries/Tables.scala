package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access for the declared queries (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS) which Spark reads only as a long
  * (`spark.sql.legacy.parquet.nanosAsLong=true`, set by [[graft.GraftSession]]);
  * we expose both the raw nanos and a µs-truncated TimestampType column so
  * queries and DuckDB oracles (`epoch_ns(ts)//1000`) can agree exactly.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as long nanoseconds plus `ts_us` TimestampType (µs,
    * truncated — matches DuckDB `make_timestamp(epoch_ns(ts)//1000)`). */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
}
