package graft.schema

import graft.SparkSpec
import graft.export.ApiBatchSink
import graft.ops.Validate
import org.apache.spark.sql.types._

class SchemaCompareSpec extends SparkSpec {

  private val inferred = FrictionlessSchema(List(
    FrictionlessField("id", "integer"),
    FrictionlessField("name", "string")))

  test("same columns+types → append in place") {
    val live = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    assert(SchemaCompare.decide(Some(live), inferred, appendRequired = true) ==
      SchemaCompare.Decision.AppendInPlace)
  }

  test("no live table or changed shape → recreate") {
    assert(SchemaCompare.decide(None, inferred, appendRequired = false) ==
      SchemaCompare.Decision.Recreate)
    val live = StructType(Seq(StructField("id", LongType)))
    assert(SchemaCompare.decide(Some(live), inferred, appendRequired = false) ==
      SchemaCompare.Decision.Recreate)
  }

  test("type change on append-enabled resource → incompatible") {
    val live = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))
    SchemaCompare.decide(Some(live), inferred, appendRequired = true) match {
      case SchemaCompare.Decision.Incompatible(reason) =>
        assert(reason.contains("id"))
      case other => fail(s"expected Incompatible, got $other")
    }
  }

  test("data-dictionary overrides replace inferred types by name") {
    val out = SchemaCompare.withOverrides(inferred, Map("id" -> "string"))
    assert(out.fields.head.fieldType == "string")
    assert(out.fields(1).fieldType == "string")
  }

  test("P9 header override renames positionally, pads both sides") {
    val fs = FrictionlessSchema(List(
      FrictionlessField("a", "integer"), FrictionlessField("b", "number")))
    val out = Validate.withHeaderOverride(fs, Seq("Col One", "Col Two", "extra"))
    assert(out.fields.map(_.name) == List("Col One", "Col Two", "extra"))
    assert(out.fields.map(_.fieldType) == List("integer", "number", "string"))
    val short = Validate.withHeaderOverride(fs, Seq("only"))
    assert(short.fields.map(_.name) == List("only", "b"))
  }

  test("W8 api batch sink: bounded 250-row JSON batches per partition") {
    val collected = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val df = spark.range(0, 1234, 1, 3).toDF("id")
    ApiBatchSink.writeBatches(df, batch => {
      collected.add(batch.size)
      assert(batch.forall(_.startsWith("{\"id\":")))
    })
    import scala.jdk.CollectionConverters._
    val sizes = collected.value.asScala.map(_.toInt)
    assert(sizes.sum == 1234)
    assert(sizes.forall(_ <= ApiBatchSink.DefaultBatchSize))
    assert(sizes.count(_ == ApiBatchSink.DefaultBatchSize) >= 3)
  }
}
