package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.Files

class WarcSpec extends SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, s"https://example.com/p$i",
        s"payload $i\nwith a second line and WARC/1.1 inside\n" * (i % 3 + 1)))
      .toDF("id", "url", "text")
  }

  private def roundTrip(gzip: Boolean, parts: Int): Unit = {
    val dir = Files.createTempDirectory("graft_warc_spec").toString
    val df = corpus(37)
    Warc.write(df.repartition(parts), dir, "url", "text",
      idCol = Some("id"), gzipPerRecord = gzip)
    val back = Warc.read(spark, dir)
    // one warcinfo per shard, one resource per row
    assert(back.where(col("warc_type") === "warcinfo").count() == parts.toLong)
    val res = back.where(col("warc_type") === "resource")
      .select(element_at(col("headers"), "WARC-Graft-Id").cast("long").as("id"),
        col("target_uri").as("url"),
        decode(col("payload"), "UTF-8").as("text"),
        col("content_length"))
    assert(res.count() == 37L)
    // byte-exact payload + uri round trip, lengths match UTF-8 octets
    val joined = res.join(df, Seq("id"), "full_outer")
      .where(res("url") =!= df("url") || res("text") =!= df("text") ||
        col("content_length") =!= octet_length(encode(df("text"), "UTF-8")))
    assert(joined.count() == 0L)
  }

  test("round trip, uncompressed, multiple shards")(roundTrip(gzip = false, 3))
  test("round trip, per-record gzip members")(roundTrip(gzip = true, 2))

  test("record ids are deterministic URIs and dates propagate") {
    val dir = Files.createTempDirectory("graft_warc_ids").toString
    Warc.write(corpus(3).coalesce(1), dir, "url", "text", idCol = Some("id"),
      date = "2026-02-03T04:05:06Z")
    val r = Warc.read(spark, dir).where(col("warc_type") === "resource")
      .select("record_id", "warc_date").collect()
    assert(r.forall(_.getString(0).matches("<urn:graft:[0-9a-f]{32}>")))
    assert(r.forall(_.getString(1) == "2026-02-03T04:05:06Z"))
  }

  test("binary payload column passes through untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_warc_bin").toString
    val bytes = Array[Byte](0, 1, 2, -1, 13, 10, 13, 10, 65) // embeds CRLFCRLF
    val df = Seq((1L, "https://example.com/bin", bytes)).toDF("id", "url", "blob")
    Warc.write(df.coalesce(1), dir, "url", "blob", idCol = Some("id"),
      contentType = "application/octet-stream")
    val got = Warc.read(spark, dir).where(col("warc_type") === "resource")
      .select("payload", "content_type").collect()
    assert(got.head.getAs[Array[Byte]](0).toSeq == bytes.toSeq)
    assert(got.head.getString(1) == "application/octet-stream")
  }

  test("reader tolerates bare-LF line endings") {
    val dir = Files.createTempDirectory("graft_warc_lf")
    val body = "hello"
    val rec = "WARC/1.0\nWARC-Type: resource\n" +
      "WARC-Target-URI: https://x.test/a\nWARC-Record-ID: <urn:x:1>\n" +
      s"Content-Length: ${body.length}\n\n$body\n\n"
    Files.write(dir.resolve("lf.warc"), rec.getBytes(StandardCharsets.UTF_8))
    val r = Warc.read(spark, dir.toString).collect()
    assert(r.length == 1)
    assert(new String(r.head.getAs[Array[Byte]]("payload"),
      StandardCharsets.UTF_8) == body)
  }

  test("truncated payload fails fast with file and record context") {
    val dir = Files.createTempDirectory("graft_warc_bad")
    val rec = "WARC/1.1\r\nWARC-Type: resource\r\nContent-Length: 99\r\n\r\nshort"
    Files.write(dir.resolve("bad.warc"), rec.getBytes(StandardCharsets.UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, dir.toString).count()
    }
    assert(e.getMessage.contains("EOF inside payload") ||
      Option(e.getCause).exists(_.getMessage.contains("EOF inside payload")))
  }

  test("missing Content-Length fails fast") {
    val dir = Files.createTempDirectory("graft_warc_nolen")
    val rec = "WARC/1.1\r\nWARC-Type: resource\r\n\r\n"
    Files.write(dir.resolve("nolen.warc"), rec.getBytes(StandardCharsets.UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, dir.toString).count()
    }
    assert(e.getMessage.contains("missing Content-Length") ||
      Option(e.getCause).exists(_.getMessage.contains("missing Content-Length")))
  }

  test("http helpers split response payloads inside codegen") {
    import spark.implicits._
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>body bytes é</html>").getBytes(StandardCharsets.ISO_8859_1)
    val df = Seq((1, payload)).toDF("id", "p")
    val got = df.select(
      Warc.httpStatus(col("p")).as("status"),
      decode(Warc.httpBody(col("p")), "ISO-8859-1").as("body")).collect().head
    assert(got.getInt(0) == 200)
    assert(got.getString(1) == "<html>body bytes é</html>")
    // headerless payload → status 0, empty body
    val none = df.select(Warc.httpStatus(encode(lit("junk"), "UTF-8")),
      Warc.httpBody(encode(lit("junk"), "UTF-8"))).collect().head
    assert(none.getInt(0) == 0)
    assert(none.getAs[Array[Byte]](1).isEmpty)
  }
}
