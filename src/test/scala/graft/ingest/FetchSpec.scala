package graft.ingest

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPOutputStream

/** HTTP(S) source staging: a real loopback HTTP server exercises the full
  * fetch path — retry on transient status, permanent failure, MD5, suffix
  * preservation, and end-to-end ingest through [[Reader]]. */
class FetchSpec extends SparkSpec {

  private val Csv = "id,name\n1,alpha\n2,beta\n"

  private def withServer(test: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try test(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  test("transient 503 is retried; CSV ingests end-to-end from a URL with a query string") {
    withServer { (server, port) =>
      val hits = new AtomicInteger(0)
      server.createContext("/res/data.csv", (ex: HttpExchange) =>
        if (hits.incrementAndGet() == 1) respond(ex, 503, Array.empty)
        else respond(ex, 200, Csv.getBytes(StandardCharsets.UTF_8)))
      Fetch.clearStaged()
      val df = Reader.read(spark, s"http://127.0.0.1:$port/res/data.csv?token=abc",
        Reader.ReadOptions())
      assert(df.count() == 2)
      assert(df.columns.toSeq == Seq("_id", "id", "name"))
      assert(hits.get() == 2, "first 503 must be retried exactly once")
    }
  }

  test("one download is shared across infer + read (per-URL staging cache)") {
    withServer { (server, port) =>
      val hits = new AtomicInteger(0)
      server.createContext("/once.csv", (ex: HttpExchange) => {
        hits.incrementAndGet()
        respond(ex, 200, Csv.getBytes(StandardCharsets.UTF_8))
      })
      Fetch.clearStaged()
      val url = s"http://127.0.0.1:$port/once.csv"
      Reader.inferSchema(spark, url)
      assert(Reader.read(spark, url, Reader.ReadOptions()).count() == 2)
      assert(hits.get() == 1, "staging cache must collapse repeated fetches")
    }
  }

  test("cache hit re-validates the staged file and re-fetches if reaped") {
    withServer { (server, port) =>
      val hits = new AtomicInteger(0)
      server.createContext("/reap.csv", (ex: HttpExchange) => {
        hits.incrementAndGet()
        respond(ex, 200, Csv.getBytes(StandardCharsets.UTF_8))
      })
      Fetch.clearStaged()
      val url = s"http://127.0.0.1:$port/reap.csv"
      val first = Fetch.stage(url)
      assert(Fetch.stage(url) == first && hits.get() == 1)
      // a tmp cleaner reaps the scratch file on a long-lived driver
      java.nio.file.Files.delete(java.nio.file.Paths.get(first))
      val second = Fetch.stage(url)
      assert(hits.get() == 2, "dead staged path must trigger a re-fetch")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(second)))
    }
  }

  test("gzip suffix survives staging so the codec is auto-detected") {
    withServer { (server, port) =>
      val bytes = {
        val bos = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        gz.write(Csv.getBytes(StandardCharsets.UTF_8)); gz.close()
        bos.toByteArray
      }
      server.createContext("/z/data.csv.gz", (ex: HttpExchange) => respond(ex, 200, bytes))
      Fetch.clearStaged()
      val df = Reader.read(spark, s"http://127.0.0.1:$port/z/data.csv.gz", Reader.ReadOptions())
      assert(df.count() == 2 && df.columns.contains("name"))
    }
  }

  test("non-transient 404 fails immediately (no retry)") {
    withServer { (server, port) =>
      val hits = new AtomicInteger(0)
      server.createContext("/gone.csv", (ex: HttpExchange) => {
        hits.incrementAndGet()
        respond(ex, 404, Array.empty)
      })
      val e = intercept[Fetch.HttpStatusError] {
        Fetch.toScratch(s"http://127.0.0.1:$port/gone.csv")
      }
      assert(e.status == 404 && hits.get() == 1)
    }
  }

  test("toScratch reports bytes and the md5 of the streamed content") {
    withServer { (server, port) =>
      server.createContext("/m.csv", (ex: HttpExchange) =>
        respond(ex, 200, Csv.getBytes(StandardCharsets.UTF_8)))
      val f = Fetch.toScratch(s"http://127.0.0.1:$port/m.csv")
      assert(f.bytes == Csv.getBytes(StandardCharsets.UTF_8).length.toLong)
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(Csv.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
      assert(f.md5Hex == expected)
      assert(f.path.endsWith(".csv"))
    }
  }

  test("local paths pass through stage untouched; suffix parsing handles URLs") {
    assert(Fetch.stage("/tmp/x.parquet") == "/tmp/x.parquet")
    assert(!Fetch.isRemote("/tmp/x.parquet") && Fetch.isRemote("HTTPS://h/x.csv"))
    assert(Fetch.suffixOf("http://h/a/b.csv?q=1") == ".csv")
    assert(Fetch.suffixOf("http://h/a/b.csv.gz#frag") == ".csv.gz")
    assert(Fetch.suffixOf("http://h/a/noext") == "")
    assert(SourceFormat.detect("http://h/a/b.tsv?sig=zz") == SourceFormat.Tsv)
  }
}
