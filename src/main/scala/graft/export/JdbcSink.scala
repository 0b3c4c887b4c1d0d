package graft.export

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}

/** JDBC sink (W7): thin wrapper over Spark's built-in JDBC writer, closing
  * the legacy Postgres-loader surface (aircan/dependencies_legacy/
  * postgres_loader.py:86-212 — COPY into a datastore table with
  * truncate-vs-append disposition and batched inserts).
  *
  * Spark-first mapping: `df.write.format("jdbc")` already does parallel
  * batched inserts (one connection per partition, `batchsize` rows per
  * round-trip) — the wrapper only standardizes the option set. The
  * upsert/merge semantics live engine-side in [[graft.ops.Merge]] (J1);
  * write the merged frame with `SaveMode.Overwrite` + `truncate=true`,
  * which is exactly the reference's delete-then-COPY shape.
  *
  * No JDBC driver ships in this environment, so [[options]]/[[writer]] are
  * unit-tested and `save()` is left to a real deployment. Scale note: cap
  * `numPartitions` (default 8 below) so a 1000-executor cluster doesn't open
  * 1000 simultaneous connections against one database.
  */
object JdbcSink {

  final case class JdbcConfig(
      url: String, // jdbc:postgresql://host:5432/db
      table: String,
      user: String,
      password: String,
      driver: Option[String] = Some("org.postgresql.Driver"),
      mode: SaveMode = SaveMode.Append,
      truncate: Boolean = false, // Overwrite: TRUNCATE instead of DROP (keeps grants/indexes)
      batchSize: Int = 1000,
      numPartitions: Int = 8, // max concurrent connections
      isolationLevel: String = "READ_COMMITTED",
      extraOptions: Map[String, String] = Map.empty
  )

  /** The exact option map handed to the JDBC data source. */
  def options(cfg: JdbcConfig): Map[String, String] =
    Map(
      "url" -> cfg.url,
      "dbtable" -> cfg.table,
      "user" -> cfg.user,
      "password" -> cfg.password,
      "batchsize" -> cfg.batchSize.toString,
      "numPartitions" -> cfg.numPartitions.toString,
      "isolationLevel" -> cfg.isolationLevel,
      "truncate" -> cfg.truncate.toString
    ) ++ cfg.driver.map("driver" -> _) ++ cfg.extraOptions

  /** Configured writer — caller invokes `.save()` where a driver exists. */
  def writer(df: DataFrame, cfg: JdbcConfig): DataFrameWriter[Row] =
    df.write.format("jdbc").mode(cfg.mode).options(options(cfg))

  def write(df: DataFrame, cfg: JdbcConfig): Unit = writer(df, cfg).save()
}
