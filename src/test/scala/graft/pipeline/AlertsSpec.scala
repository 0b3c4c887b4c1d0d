package graft.pipeline

import graft.SparkSpec
import graft.ingest.SourceFormat
import graft.schema.{FrictionlessField, FrictionlessSchema}
import graft.table.TableStore
import java.nio.file.Files

/** C6: failure alerts carry the structured payload, fire on both the
  * validation-abort and load-failure paths, and a broken transport never
  * masks the original pipeline failure. */
class AlertsSpec extends SparkSpec {

  private val schema = FrictionlessSchema(List(
    FrictionlessField("id", "integer"),
    FrictionlessField("amount", "number")))

  private def runBad(validate: Boolean, sink: AlertSink): PipelineException = {
    val work = Files.createTempDirectory("graft_alerts")
    Files.writeString(work.resolve("bad.csv"), "id,amount\nnope,1.0\n")
    val pipe = new Pipeline(spark, new TableStore(spark, work.resolve("t").toString),
      alerts = sink)
    intercept[PipelineException] {
      pipe.run(PipelineConfig(work.resolve("bad.csv").toString, "t",
        IngestionMethod.Overwrite, format = Some(SourceFormat.Csv),
        schema = Some(schema), validate = validate))
    }
  }

  test("load failure delivers the structured payload to the alert sink") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val e = runBad(validate = false, AlertSink.poster(seen += _))
    assert(seen.size == 1)
    assert(seen.head.contains("\"table\":\"t\""))
    assert(seen.head.contains("\"stage\":\"load\""))
    assert(e.payload.contains("\"stage\":\"load\""))
  }

  test("validation abort alerts with the validation report") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    runBad(validate = true, AlertSink.poster(seen += _))
    assert(seen.size == 1)
    assert(seen.head.contains("type-error"), "alert must carry the report errors")
  }

  test("a throwing transport never masks the pipeline failure") {
    val e = runBad(validate = false,
      AlertSink.poster(_ => throw new RuntimeException("smtp down")))
    assert(e.payload.contains("\"valid\":false"))
  }

  test("success path never alerts") {
    val work = Files.createTempDirectory("graft_alerts_ok")
    Files.writeString(work.resolve("ok.csv"), "id,amount\n1,2.5\n")
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val pipe = new Pipeline(spark, new TableStore(spark, work.resolve("t").toString),
      alerts = AlertSink.poster(seen += _))
    pipe.run(PipelineConfig(work.resolve("ok.csv").toString, "t",
      IngestionMethod.Overwrite, format = Some(SourceFormat.Csv), schema = Some(schema)))
    assert(seen.isEmpty)
  }
}
