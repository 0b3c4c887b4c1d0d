package graft.schema

import org.apache.spark.sql.types._

/** Frictionless ⇄ Spark type mapping — the Spark-target column of the
  * consolidated type table in SURVEY.md §1.3, derived from the reference's
  * canonical mapper (aircan/dependencies/utils/schema.py:13-33) and the
  * legacy maps (dependencies_legacy/utils.py:23-65).
  *
  * `number` maps to DECIMAL(38,9) by default for BigQuery-NUMERIC fidelity
  * (schema.py:17); pass `numberAsDouble = true` to trade fidelity for speed.
  * Nested types (`object`/`array`/`list`/geo) are opaque JSON/WKT text — the
  * reference never destructures them.
  */
object TypeMapping {

  val NumericPrecision = 38
  val NumericScale = 9

  def frictionlessToSpark(fieldType: String, numberAsDouble: Boolean = false): DataType =
    fieldType.toLowerCase match {
      case "string" | "any" => StringType
      case "integer"        => LongType
      case "number" =>
        if (numberAsDouble) DoubleType
        else DecimalType(NumericPrecision, NumericScale)
      case "boolean"   => BooleanType
      case "date"      => DateType
      case "time"      => StringType // Spark has no TIME type; ISO string
      case "datetime"  => TimestampNTZType
      case "year"      => IntegerType
      case "yearmonth" => StringType
      case "duration"  => StringType // ISO-8601 text, like the reference
      case "object" | "array" | "list" => StringType // opaque JSON text
      case "geopoint" | "geojson"      => StringType // WKT/GeoJSON text
      case _                           => StringType // unknown → STRING (schema.py:33)
    }

  /** Reverse map for schema inference output (Spark inferred → frictionless
    * descriptor), mirror of the frictionless `infer()` surface
    * (reference: pipeline_ckan_to_bigquery.py:276-281). */
  def sparkToFrictionless(dt: DataType): String = dt match {
    case StringType                          => "string"
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType       => "number"
    case BooleanType                         => "boolean"
    case DateType                            => "date"
    case TimestampType | TimestampNTZType    => "datetime"
    case _: ArrayType                        => "array"
    case _: MapType | _: StructType          => "object"
    case _                                   => "string"
  }

  /** Descriptor → Spark StructType (mirror of schema.py:116-136).
    * `required` → non-nullable. */
  def toStructType(schema: FrictionlessSchema, numberAsDouble: Boolean = false): StructType =
    StructType(schema.fields.map { f =>
      StructField(
        Sanitizer.sanitize(f.name),
        frictionlessToSpark(f.fieldType, numberAsDouble),
        nullable = !f.constraints.required,
        metadata = f.description
          .map(d => new MetadataBuilder().putString("description", d).build())
          .getOrElse(Metadata.empty)
      )
    })

  /** StructType → descriptor (for round-tripping inferred schemas). */
  def fromStructType(st: StructType): FrictionlessSchema =
    FrictionlessSchema(st.fields.map { f =>
      FrictionlessField(
        name = f.name,
        fieldType = sparkToFrictionless(f.dataType),
        constraints = FieldConstraints(required = !f.nullable),
        description =
          if (f.metadata.contains("description"))
            Some(f.metadata.getString("description"))
          else None
      )
    }.toList)

  /** Prepend the engine-managed row-number column as the FIRST field
    * (reference: schema.py:139-149 `build_schema_fields`). */
  def withRowNumberField(st: StructType, rowNumberColumn: String): StructType =
    StructType(StructField(rowNumberColumn, LongType, nullable = true) +: st.fields)
}
