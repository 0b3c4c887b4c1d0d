package graft.ingest

import graft.SparkSpec
import graft.schema.{FieldConstraints, FrictionlessField, FrictionlessSchema}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

class ReaderSpec extends SparkSpec {

  private val schema = FrictionlessSchema(List(
    FrictionlessField("id", "integer", constraints = FieldConstraints(unique = true)),
    FrictionlessField("name", "string"),
    FrictionlessField("amount", "number")))

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft_reader")
    val p = d.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("csv with declared schema: types, sanitized names, row numbers first") {
    val p = tmpFile("x.csv", "id,Name !,amount\n1,a,1.5\n2,b,2.5\n")
    val fs = FrictionlessSchema(List(
      FrictionlessField("id", "integer"),
      FrictionlessField("Name !", "string"),
      FrictionlessField("amount", "number")))
    val df = Reader.read(spark, p, Reader.ReadOptions(schema = Some(fs)))
    assert(df.columns.toSeq == Seq("_id", "id", "Name", "amount"))
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("amount").dataType.typeName.startsWith("decimal"))
    assert(df.select("_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("tsv dispatch by extension") {
    val p = tmpFile("x.tsv", "id\tname\n1\talpha\n")
    val df = Reader.read(spark, p, Reader.ReadOptions())
    assert(df.count() == 1 && df.columns.contains("name"))
  }

  test("ndjson and json-array dispatch") {
    val nd = tmpFile("x.ndjson", """{"id":1,"v":"a"}""" + "\n" + """{"id":2,"v":"b"}""" + "\n")
    assert(Reader.read(spark, nd, Reader.ReadOptions()).count() == 2)
    val ja = tmpFile("x.json", """[{"id":1,"v":"a"},{"id":2,"v":"b"}]""")
    assert(Reader.read(spark, ja, Reader.ReadOptions()).count() == 2)
  }

  test("gzip csv transparently decoded (S5)") {
    val d = Files.createTempDirectory("graft_gz")
    val p = d.resolve("x.csv.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    out.write("id,name\n1,a\n2,b\n".getBytes("UTF-8"))
    out.close()
    val df = Reader.read(spark, p.toString, Reader.ReadOptions())
    assert(df.count() == 2)
    assert(SourceFormat.detect(p.toString) == SourceFormat.Csv)
  }

  test("orc roundtrip: dispatch by extension, types survive") {
    import org.apache.spark.sql.functions.col
    val d = Files.createTempDirectory("graft_orc").toString
    val src = spark.range(0, 10).select(
      col("id"), (col("id") * 2).cast("int").as("v"),
      col("id").cast("string").as("s"))
    src.write.mode("overwrite").orc(s"$d/t.orc")
    assert(SourceFormat.detect(s"$d/t.orc") == SourceFormat.Orc)
    val back = Reader.read(spark, s"$d/t.orc", Reader.ReadOptions(
      format = Some(SourceFormat.Orc), rowNumberColumn = None))
    assert(back.schema("v").dataType.typeName == "integer")
    assert(back.count() == 10)
    assert(back.select("s").orderBy("id").collect().map(_.getString(0)).last == "9")
  }

  test("rowNumberStart offsets ids (append continuation)") {
    val p = tmpFile("x.csv", "id\n10\n20\n30\n")
    val df = Reader.read(spark, p, Reader.ReadOptions(
      schema = Some(FrictionlessSchema(List(FrictionlessField("id", "integer")))),
      rowNumberStart = 100))
    assert(df.select("_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L, 102L))
  }

  test("empty-string is null, not NaN-ish (keep_default_na=False fidelity)") {
    val p = tmpFile("x.csv", "id,name,amount\n1,,\n")
    val df = Reader.read(spark, p, Reader.ReadOptions(schema = Some(schema)))
    val r = df.select("name", "amount").first()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("schema inference produces a frictionless descriptor (S6)") {
    val p = tmpFile("x.csv", "id,name,amount\n1,a,1.5\n2,b,2.5\n")
    val fs = Reader.inferSchema(spark, p)
    assert(fs.fields.map(_.name) == List("id", "name", "amount"))
    assert(fs.fields.map(_.fieldType) == List("integer", "string", "number"))
  }

  test("castToSchema null-fills declared-but-missing columns") {
    val p = tmpFile("x.csv", "id\n1\n")
    val raw = Reader.readRaw(spark, p, SourceFormat.Csv, Reader.ReadOptions())
    val cast = Reader.castToSchema(raw, schema)
    assert(cast.columns.toSeq == Seq("id", "name", "amount"))
    assert(cast.first().isNullAt(2))
  }
}
