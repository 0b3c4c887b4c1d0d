package graft.pipeline

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.ingest.SourceFormat
import graft.schema.{FrictionlessField, FrictionlessSchema}
import graft.table.TableStore
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** C5: lifecycle posts over real HTTP on success and failure paths, and the
  * never-throw guarantee when the endpoint is unreachable. */
class HttpStatusCallbackSpec extends SparkSpec {

  private val schema = FrictionlessSchema(List(
    FrictionlessField("id", "integer"),
    FrictionlessField("amount", "number")))

  private def withPosts(test: (HttpStatusCallback, () => Seq[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    server.createContext("/status", (ex: HttpExchange) => {
      bodies.synchronized {
        bodies += new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      }
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try test(
      HttpStatusCallback.toUrl(s"http://127.0.0.1:${server.getAddress.getPort}/status"),
      () => bodies.synchronized(bodies.toSeq))
    finally server.stop(0)
  }

  test("success pipeline posts pending → … → success JSON to the endpoint") {
    withPosts { (cb, posts) =>
      val work = Files.createTempDirectory("graft_httpcb")
      Files.writeString(work.resolve("ok.csv"), "id,amount\n1,2.5\n")
      val pipe = new Pipeline(spark, new TableStore(spark, work.resolve("t").toString), cb)
      pipe.run(PipelineConfig(work.resolve("ok.csv").toString, "t",
        IngestionMethod.Overwrite, format = Some(SourceFormat.Csv), schema = Some(schema)))
      val states = posts()
      assert(states.head.contains("\"state\":\"pending\""))
      assert(states.last.contains("\"state\":\"success\""))
      assert(states.exists(_.contains("\"state\":\"progress\"")))
    }
  }

  test("failure pipeline posts a failed state") {
    withPosts { (cb, posts) =>
      val work = Files.createTempDirectory("graft_httpcb_f")
      Files.writeString(work.resolve("bad.csv"), "id,amount\nnope,1.0\n")
      val pipe = new Pipeline(spark, new TableStore(spark, work.resolve("t").toString), cb)
      intercept[PipelineException] {
        pipe.run(PipelineConfig(work.resolve("bad.csv").toString, "t",
          IngestionMethod.Overwrite, format = Some(SourceFormat.Csv),
          schema = Some(schema), validate = false))
      }
      assert(posts().exists(_.contains("\"state\":\"failed\"")))
    }
  }

  test("unreachable endpoint never throws; payload escapes JSON specials") {
    // port 1 is never listening — every POST fails inside, update() must not
    HttpStatusCallback.toUrl("http://127.0.0.1:1/status", connectTimeoutMs = 200)
      .update("failed", "boom")
    assert(HttpStatusCallback.payload("s", "a\"b\\c\nd") ==
      """{"state":"s","message":"a\"b\\c\nd"}""")
  }
}
