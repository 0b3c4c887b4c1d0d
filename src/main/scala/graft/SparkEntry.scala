package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2 (plus
  * extension ops), each a `(spark, sfDir) => DataFrame` over the testdata
  * parquet tables. `oracleSql`: the equivalent DuckDB SQL; column aliases
  * match exactly and outputs are deterministically ordered.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Ext.queries ++
      graft.queries.Analytics.queries ++ graft.queries.Lifecycle.queries

  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++ graft.queries.Ext.oracles ++
      graft.queries.Analytics.oracles ++ graft.queries.Lifecycle.oracles
}
