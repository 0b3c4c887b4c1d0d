package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (ISO 28500, the Common Crawl / Internet Archive format) read and
  * write — the on-disk shape a web-scale crawl actually arrives in, ahead
  * of the engine's HTML/Markdown extraction, URL, robots, and dedup
  * stages.
  *
  * Format recap (public spec, WARC/1.1): a record is a header block
  * (`WARC/1.1\r\n` + `Name: value` lines + blank line), exactly
  * `Content-Length` payload bytes, then `\r\n\r\n`. Archives ship either
  * plain (`.warc`) or — the Common Crawl convention — as one gzip MEMBER
  * per record concatenated into a `.warc.gz`, which decompressors that
  * honor multi-member streams (java.util.zip does) read end-to-end.
  *
  * Scale shape: a WARC file is a sequential container, so the unit of
  * parallelism is the FILE — exactly how crawl archives are published
  * (Common Crawl cuts each crawl into ~64k files of ~1 GB; a 1000-executor
  * cluster is saturated by file-level parallelism alone). The reader
  * therefore streams each file through a constant-memory record iterator
  * (`binaryFiles` + `PortableDataStream` — only ONE record's payload is
  * ever materialized per task, never the file) and `flatMap`s records out;
  * an RDD stage is the right tool here (per-partition imperative stream
  * decode, the `mapPartitions`-class exception the architecture notes
  * carve out) and the result is immediately a DataFrame for everything
  * downstream. The writer emits one WARC file per partition — shard count
  * = upstream partitioning, no extra shuffle.
  */
object Warc {

  /** Read output schema: one row per WARC record. `headers` carries every
    * header verbatim (original names) for extension fields; the common
    * ones are promoted to typed columns. */
  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType),
    StructField("record_seq", LongType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("payload", BinaryType)))

  // ---------------------------------------------------------------- read

  /** Parse every WARC record under `path` (plain or per-record-gzip; mixed
    * directories fine — each file sniffs its own magic bytes). One task
    * per file: WARC is sequential by design, parallelism comes from file
    * count (see object doc). Malformed records fail fast with file +
    * record-sequence context — a truncated archive should stop a 100 TB
    * ingest at the bad shard, not silently drop its tail. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap {
      case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        val in = if (isGzip(raw)) new GZIPInputStream(raw, 1 << 16) else raw
        new RecordIterator(file, in).map { r =>
          Row(r.file, r.seq, r.warcType, r.recordId, r.targetUri, r.date,
            r.contentType, r.contentLength, r.headers, r.payload)
        }
    }
    spark.createDataFrame(rows, schema)
  }

  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    b0 == 0x1f && b1 == 0x8b
  }

  private final case class Rec(file: String, seq: Long, warcType: String,
      recordId: String, targetUri: String, date: String, contentType: String,
      contentLength: Long, headers: Map[String, String], payload: Array[Byte])

  /** Constant-memory sequential record parser. Header lines are
    * ISO-8859-1 (byte-transparent, per the spec's octet orientation);
    * bare-LF line endings are tolerated (widespread in the wild). */
  private final class RecordIterator(file: String, in: InputStream)
      extends Iterator[Rec] {
    private var recSeq = 0L
    private var nextRec: Rec = _
    private var done = false

    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }
    override def next(): Rec = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"graft.Warc: $msg (file=$file record=$recSeq)")

    /** One header/trailer line, CRLF or LF terminated; null at EOF. */
    private def readLine(): String = {
      val sb = new java.lang.StringBuilder(96)
      var c = in.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      sb.toString
    }

    private def advance(): Unit = {
      // skip inter-record blank lines; EOF here is a clean end
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) { done = true; in.close(); return }
      if (!line.startsWith("WARC/"))
        fail(s"expected record marker WARC/x.y, got '${line.take(40)}'")
      // header block
      var headers = Vector.empty[(String, String)]
      line = readLine()
      while (line != null && line.nonEmpty) {
        val i = line.indexOf(':')
        if (i <= 0) fail(s"malformed header line '${line.take(40)}'")
        headers :+= (line.substring(0, i).trim -> line.substring(i + 1).trim)
        line = readLine()
      }
      if (line == null) fail("EOF inside header block")
      def h(name: String): Option[String] =
        headers.collectFirst {
          case (k, v) if k.equalsIgnoreCase(name) => v }
      val len = h("Content-Length").map(_.toLong)
        .getOrElse(fail("missing Content-Length"))
      if (len < 0 || len > Int.MaxValue - 16)
        fail(s"unsupported Content-Length $len")
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < len) {
        val n = in.read(payload, off, len.toInt - off)
        if (n < 0) fail(s"EOF inside payload at $off/$len bytes")
        off += n
      }
      nextRec = Rec(file, recSeq,
        h("WARC-Type").getOrElse(fail("missing WARC-Type")),
        h("WARC-Record-ID").getOrElse(""),
        h("WARC-Target-URI").getOrElse(null),
        h("WARC-Date").getOrElse(""),
        h("Content-Type").getOrElse(null),
        len, headers.toMap, payload)
      recSeq += 1
    }
  }

  // --------------------------------------------------------------- write

  /** Serialize `df` into WARC files under `dir`, one file per partition
    * (`part-NNNNN.warc[.gz]`), each headed by a `warcinfo` record. Rows
    * become `resource` records (raw payload under its own URI — the
    * spec's type for non-HTTP captures; `response` + HTTP framing is the
    * [[httpBody]] direction). `idCol`, when given, rides an extension
    * header (`WARC-Graft-Id`) so round trips don't depend on URI
    * uniqueness. Deterministic: record ids derive from md5(uri, id), the
    * date is a fixed argument — same input, same archive bytes.
    *
    * Zero-shuffle: partitioning is taken as-is (repartition upstream to
    * choose shard count/size — ~1 GB shards is the published convention). */
  def write(df: DataFrame, dir: String, urlCol: String, payloadCol: String,
      idCol: Option[String] = None,
      gzipPerRecord: Boolean = true,
      contentType: String = "text/plain",
      date: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = df.sparkSession
    val dirPath = new Path(dir)
    val fsConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    dirPath.getFileSystem(fsConf.value).mkdirs(dirPath)
    val payloadBin = df.schema(payloadCol).dataType match {
      case BinaryType => col(payloadCol)
      case _          => encode(col(payloadCol).cast("string"), "UTF-8")
    }
    val cols = Seq(col(urlCol).cast("string").as("__uri"),
      payloadBin.as("__payload")) ++
      idCol.map(c => col(c).cast("string").as("__gid"))
    val ext = gzipPerRecord
    val ct = contentType
    val dt = date
    df.select(cols: _*).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new Path(dirPath,
          f"part-$pid%05d.warc${if (ext) ".gz" else ""}")
        val rawOut = p.getFileSystem(fsConf.value).create(p, true)
        try {
          writeMember(rawOut, ext, record(
            Seq("WARC-Type" -> "warcinfo",
              "WARC-Date" -> dt,
              "WARC-Record-ID" -> s"<urn:graft:warcinfo:$pid>",
              "Content-Type" -> "application/warc-fields"),
            "software: graft\r\nformat: WARC File Format 1.1\r\n"
              .getBytes(StandardCharsets.UTF_8)))
          it.foreach { row =>
            val uri = row.getString(0)
            require(uri != null, "graft.Warc.write: null URI")
            val payload = row.getAs[Array[Byte]](1)
            val gid = if (row.length > 2) Option(row.getString(2)) else None
            val md = java.security.MessageDigest.getInstance("MD5")
            md.update(uri.getBytes(StandardCharsets.UTF_8))
            gid.foreach(g => md.update(g.getBytes(StandardCharsets.UTF_8)))
            val rid = md.digest().map("%02x".format(_)).mkString
            writeMember(rawOut, ext, record(
              Seq("WARC-Type" -> "resource",
                "WARC-Target-URI" -> uri,
                "WARC-Date" -> dt,
                "WARC-Record-ID" -> s"<urn:graft:$rid>",
                "Content-Type" -> ct) ++
                gid.map("WARC-Graft-Id" -> _),
              payload))
          }
        } finally rawOut.close()
      }
    }
  }

  /** One serialized record: header block + payload + record trailer. */
  private def record(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("WARC/1.1\r\n")
    (headers :+ ("Content-Length" -> payload.length.toString)).foreach {
      case (k, v) => sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("\r\n")
    val head = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Append one record, as its own gzip member when `gzip` — the Common
    * Crawl layout: members are independently decompressible, so a future
    * offset index can seek straight to a record. */
  private def writeMember(out: java.io.OutputStream, gzip: Boolean,
      bytes: Array[Byte]): Unit =
    if (gzip) {
      val gz = new GZIPOutputStream(out, 1 << 14) {
        // end the member WITHOUT closing the shared shard stream, and
        // release the native Deflater eagerly (millions of members per
        // shard must not wait on the GC for native memory)
        override def close(): Unit = { finish(); flush(); `def`.end() }
      }
      gz.write(bytes); gz.close()
    } else out.write(bytes)

  // ----------------------------------------- HTTP payload helpers (response records)

  /** For `response` records whose payload is a full HTTP/1.1 message:
    * the body bytes after the first CRLFCRLF. Pure column expressions
    * (ISO-8859-1 decode is byte-transparent, so substring/locate work on
    * the exact octets and the encode round-trips them) — stays inside
    * whole-stage codegen, no UDF. */
  def httpBody(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s = decode(payload, "ISO-8859-1")
    val sep = locate("\r\n\r\n", s)
    encode(when(sep > 0, substring(s, sep + lit(4), lit(Int.MaxValue)))
      .otherwise(lit("")), "ISO-8859-1")
  }

  /** HTTP status code from a response-record payload (0 when absent). */
  def httpStatus(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val first = substring_index(decode(payload, "ISO-8859-1"), "\r\n", 1)
    coalesce(try_element_at(split(first, " "), lit(2)).cast("int"), lit(0))
  }
}
