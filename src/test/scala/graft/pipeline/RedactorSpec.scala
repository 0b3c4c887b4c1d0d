package graft.pipeline

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import graft.ingest.SourceFormat
import graft.schema.{FieldConstraints, FrictionlessField, FrictionlessSchema}
import graft.table.TableStore
import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import scala.collection.mutable

/** Outbound redaction (C6 hygiene): the replacer map must scrub staged
  * paths/hostnames from BOTH off-box channels — the status POST and the
  * SMTP alert body — while the in-process PipelineException keeps the
  * full message. Live loopback servers on both channels, like
  * HttpStatusCallbackSpec / SmtpAlertSpec. */
class RedactorSpec extends SparkSpec {

  test("ordered literal replacement; specific secret precedes broader one") {
    val r = Redactor(Seq(
      "/data/tenant-a/raw" -> "<STAGE>",
      "/data" -> "<ROOT>",
      "db-internal.example" -> "<DB_HOST>"))
    assert(r("read /data/tenant-a/raw/x.csv from db-internal.example:5432 under /data/tmp")
      == "read <STAGE>/x.csv from <DB_HOST>:5432 under <ROOT>/tmp")
    // regex metacharacters in secrets are literal, never patterns
    assert(Redactor(Seq("a.b(c)*" -> "<X>"))("is a.b(c)* here, aXbY not") ==
      "is <X> here, aXbY not")
    assert(Redactor.Empty("unchanged") == "unchanged")
  }

  test("failure payload scrubbed from status POST and SMTP body; exception keeps it") {
    // --- loopback status endpoint (captures every POST body) ---
    val posts = mutable.ArrayBuffer.empty[String]
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/status", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      posts.synchronized { posts += body }
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    http.start()

    // --- loopback SMTP server (captures the DATA lines) ---
    val smtpLines = mutable.ArrayBuffer.empty[String]
    val smtp = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val s = smtp.accept()
        val in = new BufferedReader(
          new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
        val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
        def say(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
        say("220 fake ready")
        var inData = false
        var quit = false
        var line = in.readLine()
        while (line != null && !quit) {
          smtpLines.synchronized { smtpLines += line }
          if (inData) { if (line == ".") { inData = false; say("250 queued") } }
          else {
            val resp =
              if (line.startsWith("EHLO")) "250 fake"
              else if (line.startsWith("DATA")) { inData = true; "354 go" }
              else if (line.startsWith("QUIT")) { quit = true; "221 bye" }
              else "250 ok"
            say(resp)
          }
          if (!quit) line = in.readLine()
        }
        s.close()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()

    // --- staged pipeline whose failure message embeds a secret value and
    //     whose lifecycle statuses embed the staging path ---
    val work = Files.createTempDirectory("graft_redact")
    val secretCell = "jdbc://db-internal.example:5432/ids"
    Files.writeString(work.resolve("bad.csv"), s"id,amount\n$secretCell,1.0\n")
    val schema = FrictionlessSchema(List(
      FrictionlessField("id", "integer", constraints = FieldConstraints(unique = true)),
      FrictionlessField("amount", "number")))
    val store = new TableStore(spark, work.resolve("t").toString)

    val site = SiteCredentials("demo", CredentialResolver.inMemory(Map(
      "demo_api_key" -> ConnectionSpec(password = "token-demo"),
      "demo_email" -> ConnectionSpec(
        host = "127.0.0.1", port = smtp.getLocalPort,
        extra = Map("to" -> "ops@demo", "from" -> "graft@demo")))))
    val redact = Redactor(Seq(
      "db-internal.example" -> "<DB_HOST>",
      work.toString -> "<STAGE>"))
    val pipe = new Pipeline(spark, store, site,
      s"http://127.0.0.1:${http.getAddress.getPort}/status", redact)

    val e = intercept[PipelineException] {
      pipe.run(PipelineConfig(work.resolve("bad.csv").toString, "t",
        IngestionMethod.Overwrite, format = Some(SourceFormat.Csv),
        schema = Some(schema), validate = false))
    }
    http.stop(0)
    try smtp.close() catch { case _: Throwable => () }

    // in-process exception keeps the full message for debugging
    assert(e.payload.contains("db-internal.example"),
      "PipelineException must keep the unredacted payload")

    val postBodies = posts.synchronized(posts.toSeq)
    assert(postBodies.nonEmpty, "status endpoint must have been POSTed")
    assert(postBodies.exists(_.contains("<STAGE>")),
      s"staging path must be replaced in the status POSTs: $postBodies")
    assert(postBodies.exists(_.contains("<DB_HOST>")),
      s"secret host must be replaced in the failed status POST: $postBodies")
    assert(!postBodies.exists(b =>
      b.contains("db-internal.example") || b.contains(work.toString)),
      s"no secret may reach the status endpoint: $postBodies")

    val mail = smtpLines.synchronized(smtpLines.toSeq)
    assert(mail.exists(_.contains("<DB_HOST>")),
      s"secret host must be replaced in the SMTP body: $mail")
    assert(!mail.exists(_.contains("db-internal.example")),
      s"no secret may reach the SMTP body: $mail")
  }
}
