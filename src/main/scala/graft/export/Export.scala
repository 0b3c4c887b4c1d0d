package graft.export

import graft.ingest.SourceFormat
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Table → file export, ordered by the row-number column — W3/W4/W5 + O1 of
  * SURVEY §2 (reference: aircan/dependencies/cloud/warehouse.py:368-427
  * tmp-table ORDER BY + extract; storage.py:403-569 shard compose).
  *
  * Spark-first: `orderBy(_id)` is a range-partitioned distributed sort (no
  * temp table needed), and the writer emits ordered part-files directly —
  * part-file N+1 continues where N ends, so CSV/NDJSON shards are
  * concatenable in name order exactly like the reference's GCS compose.
  * `singleFile = true` coalesces to one ordered file (small exports only;
  * at 100 TB keep shards — compose is an object-store concat, not a Spark
  * job). Parquet shards stay multi-part (reference: storage.py:516-569,
  * parquet is not byte-concatenable).
  */
object Export {

  final case class ExportOptions(
      format: SourceFormat = SourceFormat.Csv,
      orderBy: Option[String] = Some("_id"),
      header: Boolean = true,
      singleFile: Boolean = false,
      compression: Option[String] = None
  )

  def export(df: DataFrame, outPath: String, opts: ExportOptions = ExportOptions()): Unit = {
    val ordered = opts.orderBy.filter(df.columns.contains) match {
      case Some(c) => df.orderBy(col(c).asc)
      case None    => df
    }
    val shaped = if (opts.singleFile) ordered.coalesce(1) else ordered
    val w0 = shaped.write.mode(SaveMode.Overwrite)
    val w = opts.compression.map(c => w0.option("compression", c)).getOrElse(w0)
    opts.format match {
      case SourceFormat.Csv =>
        w.option("header", opts.header).csv(outPath)
      case SourceFormat.Tsv =>
        w.option("header", opts.header).option("sep", "\t").csv(outPath)
      case SourceFormat.Ndjson | SourceFormat.JsonArray =>
        w.json(outPath) // NDJSON; a JSON array export is NDJSON + brackets
      case SourceFormat.Parquet =>
        w.parquet(outPath)
      case SourceFormat.Orc =>
        w.orc(outPath) // columnar shards, not byte-concatenable (like parquet)
    }
  }
}
