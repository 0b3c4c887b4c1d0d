package graft.tools

import graft.GraftSession
import graft.ingest.SourceFormat
import graft.pipeline._
import graft.schema.{FieldConstraints, FrictionlessField, FrictionlessSchema}
import graft.table.TableStore
import java.nio.file.Files

/** End-to-end smoke drive of the full pipeline surface: CSV ingest →
  * overwrite → upsert (changed + unchanged + new rows) → ordered export,
  * plus the failure paths (upsert without keys, sanitize collision,
  * validation abort). Run: `sbt "runMain graft.tools.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[8]", 8)
    val work = Files.createTempDirectory("graft_smoke")
    val csv1 = work.resolve("batch1.csv")
    val csv2 = work.resolve("batch2.csv")
    Files.writeString(csv1,
      """id,name,amount
        |1,alpha,10.5
        |2,beta,20.0
        |3,gamma,30.25
        |""".stripMargin)
    // batch2: id=2 changed, id=3 unchanged, id=4 new, id=4 duplicated (dedup)
    Files.writeString(csv2,
      """id,name,amount
        |2,beta,99.99
        |3,gamma,30.25
        |4,delta,40.0
        |4,delta-dup,41.0
        |""".stripMargin)

    val schema = FrictionlessSchema(List(
      FrictionlessField("id", "integer", constraints = FieldConstraints(unique = true)),
      FrictionlessField("name", "string"),
      FrictionlessField("amount", "number")))

    // constructed through the public facade — Smoke drives the same entry
    // points a migrating user would call
    val store = graft.Graft.store(spark, work.resolve("tables").toString)
    val pipe = graft.Graft.pipeline(spark, store)

    println("=== overwrite batch1 ===")
    pipe.run(PipelineConfig(csv1.toString, "t", IngestionMethod.Overwrite,
      format = Some(SourceFormat.Csv), schema = Some(schema), validate = true))
      .orderBy("_id").show(false)

    // validate=false: in-file duplicate keys are handled by the merge's
    // stage dedup (A2); validate=true would abort on the unique constraint,
    // matching the reference's frictionless behavior.
    println("=== upsert batch2 ===")
    pipe.run(PipelineConfig(csv2.toString, "t", IngestionMethod.Upsert,
      format = Some(SourceFormat.Csv), schema = Some(schema), validate = false,
      exportPath = Some(work.resolve("export").toString),
      exportSingleFile = true))
      .orderBy("_id").show(false)

    println("=== exported file ===")
    import scala.jdk.CollectionConverters._
    Files.list(work.resolve("export")).iterator().asScala
      .filter(_.toString.endsWith(".csv"))
      .foreach(p => println(Files.readString(p)))

    println("=== probe: upsert without unique keys ===")
    val noKeys = FrictionlessSchema(schema.fields.map(f =>
      f.copy(constraints = FieldConstraints())))
    try {
      pipe.run(PipelineConfig(csv2.toString, "t2", IngestionMethod.Upsert,
        format = Some(SourceFormat.Csv), schema = Some(noKeys)))
      println("ERROR: should have thrown")
    } catch { case e: IllegalArgumentException => println(s"OK: ${e.getMessage}") }

    println("=== probe: validation abort on bad rows ===")
    val bad = work.resolve("bad.csv")
    Files.writeString(bad, "id,name,amount\nx,one,1.0\n2,,oops\n")
    val reqSchema = FrictionlessSchema(List(
      FrictionlessField("id", "integer", constraints = FieldConstraints(unique = true)),
      FrictionlessField("name", "string", constraints = FieldConstraints(required = true)),
      FrictionlessField("amount", "number")))
    try {
      pipe.run(PipelineConfig(bad.toString, "t3", IngestionMethod.Overwrite,
        format = Some(SourceFormat.Csv), schema = Some(reqSchema), validate = true))
      println("ERROR: should have thrown")
    } catch { case e: PipelineException => println(s"OK report: ${e.payload}") }

    println("=== probe: sanitize collision ===")
    try {
      graft.schema.Sanitizer.sanitizeAll(Seq("a b", "a_b"))
      println("ERROR: should have thrown")
    } catch { case e: IllegalArgumentException => println(s"OK: ${e.getMessage}") }

    println("=== governance status (Retention.status: one frame) ===")
    locally {
      import org.apache.spark.sql.functions.col
      val docs = spark.range(0, 40).selectExpr("id AS doc_id",
        "concat('w', id % 7, ' w', id % 11, ' w', id % 13) AS text",
        "concat('2026-01-0', id % 3 + 1) AS day")
      store.overwrite("gov_docs", docs)
      graft.ext.NearDupIndex.buildNearDupIndex(store, "gov_nd", docs,
        "text", "doc_id", numBuckets = 2, registerFor = Some("gov_docs"))
      graft.ext.Retention.defineView(store, "gov_docs", "gov_by_day",
        Seq("day"), Seq(graft.table.MatView.Count("n_docs")))
      graft.ext.Retention.deleteByKeysCascade(store, "gov_docs", "doc_id",
        docs.where(col("doc_id") % 4 === 0).select("doc_id"), indexes = Nil)
      // lease holder, pending/abandoned cascades, registered targets —
      // the four probes in one frame (idle here: cascade just drained)
      graft.ext.Retention.status(store, "gov_docs").show(false)
      println("view after cascade (erased ids gone from the aggregate):")
      new graft.table.MatView(store).read("gov_by_day").orderBy("day").show(false)
    }

    println("=== streaming ingest (AvailableNow + checkpoint resume) ===")
    val streamDir = work.resolve("stream_in")
    Files.createDirectories(streamDir)
    Files.writeString(streamDir.resolve("b1.csv"), "id,name,amount\n1,one,1.0\n2,two,2.0\n")
    val st = graft.schema.TypeMapping.toStructType(schema)
    def runStream(): Unit = graft.streaming.StreamingIngest.ingestAvailableNow(
      spark, streamDir.toString, st, "csv",
      store, "stream_t", work.resolve("ckpt").toString,
      uniqueKeys = Seq("id"))
    runStream()
    println(s"after batch1: ${store.scan("stream_t").count()} rows")
    // new file appears; old file must NOT be reprocessed (checkpoint)
    Files.writeString(streamDir.resolve("b2.csv"), "id,name,amount\n2,two-CHANGED,9.9\n3,three,3.0\n")
    runStream()
    store.scan("stream_t").orderBy("id").show(false)
    // re-run with nothing new: no change (idempotent)
    val before = store.scan("stream_t").orderBy("id").collect().toSeq
    runStream()
    val after = store.scan("stream_t").orderBy("id").collect().toSeq
    println(s"idempotent-rerun: ${if (before == after) "OK" else "MISMATCH"}")

    spark.stop()
  }
}
