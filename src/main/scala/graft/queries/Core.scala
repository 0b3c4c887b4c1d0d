package graft.queries

import graft.export.Export
import graft.ingest.{Reader, SourceFormat}
import graft.ops.{Merge, RowNumbers, UpdatedAt}
import graft.schema.{FrictionlessField, FrictionlessSchema, Sanitizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Core parity queries: one per reference operator family (SURVEY §2), each
  * paired with an equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism rules (the driver hash-compares values):
  *   - every query is ordered by a unique key,
  *   - float aggregation goes through exact DECIMAL sums, cast to DOUBLE at
  *     the end (double addition order is engine-dependent; decimal is not),
  *   - aliases match the oracle column names exactly.
  */
object Core {
  import Tables.t

  private val JobTs = Timestamp.valueOf("2026-02-02 00:00:00")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A: aggregations -------------------------------------------------
    "q1_pricing_summary" -> ((s, dir) => {
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(20,2)")).cast("double").as("sum_base_price"),
          // big-sum guard: round the SUM to 4 frac digits before the double
          // cast — at high SF the scale-6/8 sums exceed 2^53 scaled units,
          // where DuckDB's decimal→double (int division, two roundings) can
          // drift 1 ulp from Java's correctly-rounded conversion; the
          // decimal→decimal rounding is exact integer math both agree on
          sum(disc.cast("decimal(25,6)")).cast("decimal(38,4)").cast("double").as("sum_disc_price"),
          sum((disc * (lit(1) + col("l_tax"))).cast("decimal(25,8)")).cast("decimal(38,4)").cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "a1_next_row_number" -> ((s, dir) =>
      // MAX(_id)+1 continuation (warehouse.py:13-31), COALESCE(…,0) fallback
      t(s, dir, "orders")
        .agg((coalesce(max(col("o_orderkey")), lit(0L)) + lit(1L)).as("next_id"))),

    "a2_dedup_keep_first" -> ((s, dir) =>
      // stage dedup before MERGE (A2, warehouse.py:256-270) — deterministic
      // ANY_VALUE: keep the row with the lowest event_id per key
      Merge.dedupStage(
        Tables.events(s, dir).select("event_id", "user_id", "event_type", "value"),
        Seq("user_id", "event_type"), Some("event_id"))
        .orderBy("user_id", "event_type")),

    // ---- P: projections / transforms ------------------------------------
    "p2_sanitize_columns" -> ((s, dir) => {
      val dirty = t(s, dir, "region").toDF(" region key!! ", "la  région")
      dirty.toDF(Sanitizer.sanitizeAll(dirty.columns.toIndexedSeq): _*)
        .orderBy("region_key")
    }),

    "p3_cast_to_schema" -> ((s, dir) => {
      // two-phase cast (P3): stringified input → declared frictionless types
      val stringified = t(s, dir, "customer").select(
        col("c_custkey").cast("string").as("c_custkey"),
        col("c_name"),
        col("c_acctbal").cast("decimal(12,2)").cast("string").as("c_acctbal"))
      val fs = FrictionlessSchema(List(
        FrictionlessField("c_custkey", "integer"),
        FrictionlessField("c_name", "string"),
        FrictionlessField("c_acctbal", "number")))
      Reader.castToSchema(stringified, fs)
        .withColumn("c_acctbal", col("c_acctbal").cast("double"))
        .orderBy("c_custkey")
    }),

    "p6_updated_at_stamp" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"),
        when(pmod(col("event_id"), lit(3)) === 0, lit(null).cast("timestamp"))
          .otherwise(lit("2025-05-05 00:00:00").cast("timestamp")).as("_updated_at"))
      UpdatedAt.stamp(e, JobTs).orderBy("event_id")
    }),

    // ---- S: sources (format roundtrips through the engine reader) -------
    "s1_csv_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_s1").toString
      Export.export(t(s, dir, "nation"), s"$tmp/nation_csv",
        Export.ExportOptions(SourceFormat.Csv, orderBy = Some("n_nationkey"), singleFile = true))
      val fs = FrictionlessSchema(List(
        FrictionlessField("n_nationkey", "integer"),
        FrictionlessField("n_name", "string"),
        FrictionlessField("n_regionkey", "integer")))
      Reader.read(s, s"$tmp/nation_csv", Reader.ReadOptions(
        format = Some(SourceFormat.Csv), schema = Some(fs))).orderBy("_id")
    }),

    "s2_ndjson_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_s2").toString
      Export.export(t(s, dir, "supplier"), s"$tmp/supplier_json",
        Export.ExportOptions(SourceFormat.Ndjson, orderBy = Some("s_suppkey"), singleFile = true))
      val fs = FrictionlessSchema(List(
        FrictionlessField("s_suppkey", "integer"),
        FrictionlessField("s_name", "string"),
        FrictionlessField("s_nationkey", "integer"),
        FrictionlessField("s_acctbal", "number")))
      Reader.read(s, s"$tmp/supplier_json", Reader.ReadOptions(
        format = Some(SourceFormat.Ndjson), schema = Some(fs), numberAsDouble = true))
        .orderBy("_id")
    }),

    "s3_json_array_scan" -> ((s, dir) => {
      // JSON-array ingestion (S3, storage.py:186-212): one big JSON array,
      // constant-memory incremental parse → Spark multiLine JSON reader
      val rows = t(s, dir, "region").orderBy("r_regionkey").collect()
      val json = rows.map { r =>
        s"""{"r_regionkey": ${r.getInt(0)}, "r_name": "${r.getString(1)}"}"""
      }.mkString("[\n", ",\n", "\n]")
      val tmp = Files.createTempDirectory("graft_s3")
      Files.writeString(tmp.resolve("region.json"), json)
      val fs = FrictionlessSchema(List(
        FrictionlessField("r_regionkey", "integer"),
        FrictionlessField("r_name", "string")))
      Reader.read(s, tmp.resolve("region.json").toString, Reader.ReadOptions(
        format = Some(SourceFormat.JsonArray), schema = Some(fs))).orderBy("_id")
    }),

    "s4_parquet_rownumber" -> ((s, dir) =>
      // gap-free ordered row numbers (P1/§1.4) over a parquet scan
      RowNumbers.withRowNumbersOrdered(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        Seq(col("o_orderkey"))).orderBy("_id")),

    "s5_gzip_scan" -> ((s, dir) => {
      // S5 (storage.py gzip + pipeline_ckan_to_bigquery.py:257-259): gzip
      // CSV export → transparent codec detection on read by .gz suffix
      val tmp = Files.createTempDirectory("graft_s5").toString
      Export.export(t(s, dir, "nation"), s"$tmp/nation_gz",
        Export.ExportOptions(SourceFormat.Csv, orderBy = Some("n_nationkey"),
          singleFile = true, compression = Some("gzip")))
      val fs = FrictionlessSchema(List(
        FrictionlessField("n_nationkey", "integer"),
        FrictionlessField("n_name", "string"),
        FrictionlessField("n_regionkey", "integer")))
      Reader.read(s, s"$tmp/nation_gz", Reader.ReadOptions(
        format = Some(SourceFormat.Csv), schema = Some(fs))).orderBy("_id")
    }),

    "p4_tsv_roundtrip" -> ((s, dir) => {
      // P4 (TSV normalize, storage.py:117-125 fmt dispatch): tab-separated
      // export → TSV-dispatched read; same relational content as the CSV path
      val tmp = Files.createTempDirectory("graft_p4").toString
      Export.export(t(s, dir, "region"), s"$tmp/region.tsv",
        Export.ExportOptions(SourceFormat.Tsv, orderBy = Some("r_regionkey"), singleFile = true))
      val fs = FrictionlessSchema(List(
        FrictionlessField("r_regionkey", "integer"),
        FrictionlessField("r_name", "string")))
      Reader.read(s, s"$tmp/region.tsv", Reader.ReadOptions(
        format = Some(SourceFormat.Tsv), schema = Some(fs))).orderBy("_id")
    }),

    "s10_orc_roundtrip" -> ((s, dir) => {
      // ORC roundtrip (columnar sibling of S4/W5): ordered single-shard ORC
      // export through the engine writer → format-dispatched read back.
      // ORC is the second splittable columnar source (predicate pushdown +
      // column pruning apply exactly as with parquet at 100 TB).
      val tmp = Files.createTempDirectory("graft_s10").toString
      Export.export(t(s, dir, "documents").select("doc_id", "lang", "source", "n_chars"),
        s"$tmp/docs_orc", Export.ExportOptions(SourceFormat.Orc,
          orderBy = Some("doc_id"), singleFile = true))
      Reader.read(s, s"$tmp/docs_orc", Reader.ReadOptions(
        format = Some(SourceFormat.Orc))).orderBy("_id")
    }),

    "w5_parquet_export" -> ((s, dir) => {
      // W5 (parquet shard output, storage.py:516-569): ordered multi-shard
      // parquet export → scan back; shards carry the total order via _id
      val tmp = Files.createTempDirectory("graft_w5").toString
      val numbered = RowNumbers.withRowNumbersOrdered(
        t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal"),
        Seq(col("c_custkey")))
      Export.export(numbered, s"$tmp/cust_pq",
        Export.ExportOptions(SourceFormat.Parquet, orderBy = Some("_id")))
      s.read.parquet(s"$tmp/cust_pq").orderBy("_id")
    }),

    // ---- F: predicates ---------------------------------------------------
    "f3_change_detection" -> ((s, dir) => {
      // NULL-safe IS DISTINCT FROM change predicate (F3, warehouse.py:237-245)
      val a = t(s, dir, "customer")
      val b = a.select(
        col("c_custkey"),
        when(pmod(col("c_custkey"), lit(7)) === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("b_acctbal"),
        when(pmod(col("c_custkey"), lit(5)) === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")).as("b_mktsegment"))
      a.join(b, "c_custkey")
        .where(!(col("c_acctbal") <=> col("b_acctbal")) ||
               !(col("c_mktsegment") <=> col("b_mktsegment")))
        .select("c_custkey").orderBy("c_custkey")
    }),

    // ---- J: the merge-upsert crown jewel ---------------------------------
    "j1_merge_upsert" -> ((s, dir) => {
      val base = t(s, dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
      val target = RowNumbers.withRowNumbersOrdered(
        base.where(pmod(col("o_orderkey"), lit(4)).isin(0, 1)), Seq(col("o_orderkey")))
        .withColumn("_updated_at", lit("2026-01-01 00:00:00").cast("timestamp"))
      val stage = RowNumbers.withRowNumbersOrdered(
        base.where(pmod(col("o_orderkey"), lit(4)).isin(1, 2))
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(8)) === 1, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice"))),
        Seq(col("o_orderkey")), start = 1000001L)
      Merge.merge(target, stage, JobTs, Merge.MergeSpec(uniqueKeys = Seq("o_orderkey")))
        .orderBy("o_orderkey")
    }),

    // ---- W/set ops: append with schema evolution -------------------------
    "w1_append_evolution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val existing = c.select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val incoming = c.select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
        col("c_name"), col("c_acctbal"))
      existing.unionByName(incoming, allowMissingColumns = true)
        .orderBy("c_custkey")
    }),

    // ---- O: ordered export projection ------------------------------------
    "o1_ordered_scan" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(round(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))), 4) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(round(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(25,8))), 4) AS DECIMAL(38,4)) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a1_next_row_number" ->
      "SELECT COALESCE(MAX(o_orderkey),0)+1 AS next_id FROM orders",

    "a2_dedup_keep_first" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value FROM events e
        |JOIN (SELECT user_id, event_type, MIN(event_id) AS m FROM events GROUP BY 1,2) g
        |ON e.user_id=g.user_id AND e.event_type=g.event_type AND e.event_id=g.m
        |ORDER BY e.user_id, e.event_type""".stripMargin,

    "p2_sanitize_columns" ->
      "SELECT r_regionkey AS region_key, r_name AS la_r_gion FROM region ORDER BY region_key",

    "p3_cast_to_schema" ->
      """SELECT CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS c_custkey, c_name,
        | CAST(CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS DECIMAL(38,9)) AS DOUBLE) AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "p6_updated_at_stamp" ->
      """SELECT event_id,
        | COALESCE(CASE WHEN event_id % 3 = 0 THEN NULL ELSE TIMESTAMP '2025-05-05 00:00:00' END,
        |          TIMESTAMP '2026-02-02 00:00:00') AS _updated_at
        |FROM events ORDER BY event_id""".stripMargin,

    "s1_csv_roundtrip" ->
      """SELECT row_number() OVER (ORDER BY n_nationkey) AS _id,
        | CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY _id""".stripMargin,

    "s2_ndjson_roundtrip" ->
      """SELECT row_number() OVER (ORDER BY s_suppkey) AS _id,
        | CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        | CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
        |FROM supplier ORDER BY _id""".stripMargin,

    "s3_json_array_scan" ->
      """SELECT row_number() OVER (ORDER BY r_regionkey) AS _id,
        | CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region ORDER BY _id""".stripMargin,

    "s4_parquet_rownumber" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS _id,
        | o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY _id""".stripMargin,

    "s5_gzip_scan" ->
      """SELECT row_number() OVER (ORDER BY n_nationkey) AS _id,
        | CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY _id""".stripMargin,

    "p4_tsv_roundtrip" ->
      """SELECT row_number() OVER (ORDER BY r_regionkey) AS _id,
        | CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region ORDER BY _id""".stripMargin,

    "s10_orc_roundtrip" ->
      """SELECT row_number() OVER (ORDER BY doc_id) AS _id,
        | doc_id, lang, source, n_chars
        |FROM documents ORDER BY _id""".stripMargin,

    "w5_parquet_export" ->
      """SELECT row_number() OVER (ORDER BY c_custkey) AS _id,
        | c_custkey, c_name, c_acctbal
        |FROM customer ORDER BY _id""".stripMargin,

    "f3_change_detection" ->
      """SELECT a.c_custkey FROM customer a
        |JOIN (SELECT c_custkey,
        |        CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS b_acctbal,
        |        CASE WHEN c_custkey % 5 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS b_mktsegment
        |      FROM customer) b ON a.c_custkey = b.c_custkey
        |WHERE a.c_acctbal IS DISTINCT FROM b.b_acctbal
        |   OR a.c_mktsegment IS DISTINCT FROM b.b_mktsegment
        |ORDER BY a.c_custkey""".stripMargin,

    "j1_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        |t AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS _id, o_orderkey, o_totalprice, o_orderstatus,
        |        TIMESTAMP '2026-01-01 00:00:00' AS _updated_at
        |      FROM base WHERE o_orderkey % 4 IN (0,1)),
        |s AS (SELECT 1000000 + row_number() OVER (ORDER BY o_orderkey) AS _id, o_orderkey,
        |        CASE WHEN o_orderkey % 8 = 1 THEN o_totalprice*2 ELSE o_totalprice END AS o_totalprice,
        |        o_orderstatus
        |      FROM base WHERE o_orderkey % 4 IN (1,2)),
        |j AS (SELECT t._id AS t_id, t.o_orderkey AS t_key, t.o_totalprice AS t_price, t.o_orderstatus AS t_status, t._updated_at AS t_ts,
        |             s._id AS s_id, s.o_orderkey AS s_key, s.o_totalprice AS s_price, s.o_orderstatus AS s_status,
        |             (t.o_totalprice IS DISTINCT FROM s.o_totalprice OR t.o_orderstatus IS DISTINCT FROM s.o_orderstatus) AS changed
        |      FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey)
        |SELECT CASE WHEN t_key IS NOT NULL THEN t_id ELSE s_id END AS _id,
        |       COALESCE(t_key, s_key) AS o_orderkey,
        |       CASE WHEN t_key IS NOT NULL AND s_key IS NOT NULL THEN (CASE WHEN changed THEN s_price ELSE t_price END)
        |            WHEN t_key IS NOT NULL THEN t_price ELSE s_price END AS o_totalprice,
        |       CASE WHEN t_key IS NOT NULL AND s_key IS NOT NULL THEN (CASE WHEN changed THEN s_status ELSE t_status END)
        |            WHEN t_key IS NOT NULL THEN t_status ELSE s_status END AS o_orderstatus,
        |       CASE WHEN t_key IS NOT NULL AND s_key IS NOT NULL THEN (CASE WHEN changed THEN TIMESTAMP '2026-02-02 00:00:00' ELSE t_ts END)
        |            WHEN t_key IS NOT NULL THEN t_ts ELSE TIMESTAMP '2026-02-02 00:00:00' END AS _updated_at
        |FROM j ORDER BY o_orderkey""".stripMargin,

    "w1_append_evolution" ->
      """SELECT c_custkey, c_name, c_nationkey, CAST(NULL AS DOUBLE) AS c_acctbal FROM customer
        |UNION ALL
        |SELECT c_custkey+1000000, c_name, CAST(NULL AS INTEGER), c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "o1_ordered_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
