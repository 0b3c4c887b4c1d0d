package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeMappingSpec extends AnyFunSuite {

  test("frictionless → Spark type table (SURVEY §1.3)") {
    val cases = Seq(
      "string" -> StringType, "any" -> StringType,
      "integer" -> LongType,
      "number" -> DecimalType(38, 9),
      "boolean" -> BooleanType,
      "date" -> DateType,
      "time" -> StringType,
      "datetime" -> TimestampNTZType,
      "year" -> IntegerType,
      "yearmonth" -> StringType,
      "duration" -> StringType,
      "object" -> StringType, "array" -> StringType, "list" -> StringType,
      "geopoint" -> StringType, "geojson" -> StringType,
      "whatever-unknown" -> StringType)
    cases.foreach { case (f, dt) =>
      assert(TypeMapping.frictionlessToSpark(f) == dt, s"for $f")
    }
    assert(TypeMapping.frictionlessToSpark("NUMBER", numberAsDouble = true) == DoubleType)
  }

  test("descriptor → StructType carries required + description, sanitizes names") {
    val fs = FrictionlessSchema(List(
      FrictionlessField("my col!", "integer",
        constraints = FieldConstraints(required = true)),
      FrictionlessField("note", "string", description = Some("a note"))))
    val st = TypeMapping.toStructType(fs)
    assert(st.fields(0) == StructField("my_col", LongType, nullable = false))
    assert(st.fields(1).metadata.getString("description") == "a note")
  }

  test("StructType → descriptor roundtrip") {
    val st = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", TimestampType), StructField("d", ArrayType(FloatType))))
    val fs = TypeMapping.fromStructType(st)
    assert(fs.fields.map(_.fieldType) == List("integer", "number", "datetime", "array"))
  }

  test("row-number field is prepended first as long") {
    val st = TypeMapping.withRowNumberField(
      StructType(Seq(StructField("x", StringType))), "_id")
    assert(st.fields.head == StructField("_id", LongType, nullable = true))
    assert(st.fields.map(_.name).toSeq == Seq("_id", "x"))
  }

  test("json codec roundtrip with constraints and unique keys") {
    val json =
      """{"fields":[
        |{"name":"id","type":"integer","constraints":{"unique":true,"required":true}},
        |{"name":"name","type":"string"},
        |{"name":"amt","type":"number","description":"d"}]}""".stripMargin
    val fs = FrictionlessSchema.fromJson(json)
    assert(fs.uniqueKeys == List("id"))
    assert(fs.fields(0).constraints.required)
    val back = FrictionlessSchema.fromJson(fs.toJson)
    assert(back == fs)
  }

  test("numeric minimum/maximum serialize as JSON numbers, dates as strings") {
    val fs = FrictionlessSchema(List(
      FrictionlessField("qty", "integer", constraints =
        FieldConstraints(minimum = Some("1"), maximum = Some("100"))),
      FrictionlessField("amt", "number", constraints =
        FieldConstraints(minimum = Some("0.5"))),
      FrictionlessField("day", "date", constraints =
        FieldConstraints(minimum = Some("2024-01-01")))))
    val j = fs.toJson
    assert(j.contains(""""minimum":1""") && j.contains(""""maximum":100"""),
      s"integer constraints must be JSON numbers: $j")
    assert(j.contains(""""minimum":0.5"""), s"number constraints too: $j")
    assert(j.contains(""""minimum":"2024-01-01""""),
      s"date constraints stay strings: $j")
    assert(FrictionlessSchema.fromJson(j) == fs, s"roundtrip drift: $j")
  }

  test("invalid descriptors are hard errors") {
    intercept[IllegalArgumentException](FrictionlessSchema.fromJson("[1,2]"))
    intercept[IllegalArgumentException](FrictionlessSchema.fromJson("not json"))
    intercept[IllegalArgumentException](
      FrictionlessSchema.fromJson("""{"fields": 5}"""))
  }
}
