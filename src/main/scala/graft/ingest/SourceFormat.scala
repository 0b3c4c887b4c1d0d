package graft.ingest

/** Source format ADT — the format dispatch of the reference's streamer
  * (aircan/dependencies/cloud/storage.py:214-222) plus gzip auto-detection
  * by suffix (pipeline_ckan_to_bigquery.py:257-259). */
sealed trait SourceFormat { def name: String }

object SourceFormat {
  case object Csv extends SourceFormat { val name = "csv" }
  case object Tsv extends SourceFormat { val name = "tsv" }
  case object Ndjson extends SourceFormat { val name = "ndjson" }
  case object JsonArray extends SourceFormat { val name = "json" }
  case object Parquet extends SourceFormat { val name = "parquet" }
  case object Orc extends SourceFormat { val name = "orc" }

  /** Detect from a path/URL; `.gz` is transparent (Spark auto-detects the
    * codec — note: gzip is non-splittable, same single-stream behavior as the
    * reference; prefer splittable inputs at 100 TB). */
  def detect(path: String): SourceFormat = {
    // URLs carry query/fragment after the filename — strip before matching
    val p = path.toLowerCase.takeWhile(c => c != '?' && c != '#').stripSuffix(".gz")
    if (p.endsWith(".tsv") || p.endsWith(".tab")) Tsv
    else if (p.endsWith(".ndjson") || p.endsWith(".jsonl")) Ndjson
    else if (p.endsWith(".json")) JsonArray
    else if (p.endsWith(".parquet") || p.endsWith(".pq")) Parquet
    else if (p.endsWith(".orc")) Orc
    else Csv
  }

  def fromName(name: String): SourceFormat = name.toLowerCase match {
    case "csv"                => Csv
    case "tsv" | "tab"        => Tsv
    case "ndjson" | "jsonl"   => Ndjson
    case "json"               => JsonArray
    case "parquet" | "pq"     => Parquet
    case "orc"                => Orc
    case other =>
      throw new IllegalArgumentException(s"Unsupported source format: $other")
  }
}
