package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Frictionless Table Schema descriptor — the user-facing schema IR of the
  * engine, mirroring the reference's descriptor handling
  * (reference: aircan/dependencies/utils/schema.py:36-48, 62-90).
  *
  * A descriptor is `{"fields":[{name,type,format,constraints,description}]}`.
  * We keep it as a first-class ADT plus a JSON codec, and convert to/from
  * Spark `StructType` in [[TypeMapping]].
  */
/** The full frictionless constraint vocabulary. The reference itself only
  * consumes `required`/`unique` (schema.py:89-124); the rest — `pattern`
  * (full-value regex), `enum`, `minimum`/`maximum` (compared in the
  * field's declared type), `minLength`/`maxLength` (string length) — are
  * part of the Table Schema spec and validated distributedly in
  * [[graft.ops.Validate]]. Constraints never fire on missing/empty cells;
  * that is `required`'s job (frictionless semantics). */
final case class FieldConstraints(
    required: Boolean = false,
    unique: Boolean = false,
    pattern: Option[String] = None,
    enumVals: Option[List[String]] = None,
    minimum: Option[String] = None,
    maximum: Option[String] = None,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None
)

final case class FrictionlessField(
    name: String,
    fieldType: String = "string", // frictionless "type"
    format: Option[String] = None,
    constraints: FieldConstraints = FieldConstraints(),
    description: Option[String] = None
)

final case class FrictionlessSchema(fields: List[FrictionlessField]) {

  /** Field names marked `constraints.unique == true`, sanitized — these are
    * the upsert key columns (reference: schema.py:92-113). */
  def uniqueKeys: List[String] =
    fields.filter(_.constraints.unique).map(f => Sanitizer.sanitize(f.name))

  /** Descriptor with all field names sanitized; collisions are a hard error
    * (reference: schema.py:62-90). */
  def sanitized: FrictionlessSchema =
    FrictionlessSchema(Sanitizer.sanitizeFields(fields))

  def toJson: String = {
    def fieldJ(f: FrictionlessField): JObject = {
      var o: List[(String, JValue)] =
        List("name" -> JString(f.name), "type" -> JString(f.fieldType))
      f.format.foreach(fm => o :+= ("format" -> JString(fm)))
      val k = f.constraints
      if (k != FieldConstraints()) {
        var c: List[(String, JValue)] = Nil
        if (k.required) c :+= ("required" -> JBool(true))
        if (k.unique) c :+= ("unique" -> JBool(true))
        k.pattern.foreach(p => c :+= ("pattern" -> JString(p)))
        k.enumVals.foreach(e => c :+= ("enum" -> JArray(e.map(JString(_)))))
        // Table Schema requires constraint values to match the field
        // type: numeric minimum/maximum must round-trip as JSON numbers,
        // not strings (dates/times stay strings).
        def numOrStr(m: String): JValue =
          if (m.matches("[+-]?\\d+")) JInt(BigInt(m))
          else
            try JDecimal(BigDecimal(m))
            catch { case _: NumberFormatException => JString(m) }
        k.minimum.foreach(m => c :+= ("minimum" -> numOrStr(m)))
        k.maximum.foreach(m => c :+= ("maximum" -> numOrStr(m)))
        k.minLength.foreach(n => c :+= ("minLength" -> JInt(n)))
        k.maxLength.foreach(n => c :+= ("maxLength" -> JInt(n)))
        o :+= ("constraints" -> JObject(c))
      }
      f.description.foreach(d => o :+= ("description" -> JString(d)))
      JObject(o)
    }
    JsonMethods.compact(
      JsonMethods.render(
        JObject("fields" -> JArray(fields.map(fieldJ)))
      )
    )
  }
}

object FrictionlessSchema {

  /** Parse a descriptor from JSON text. Mirrors the reference's strictness:
    * non-object input or non-list `fields` is a hard error
    * (reference: schema.py:36-48, 64-66). */
  def fromJson(json: String): FrictionlessSchema = {
    val parsed =
      try JsonMethods.parse(json)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(
            "Invalid frictionless schema. Provide a JSON object string.", e)
      }
    parsed match {
      case JObject(_) => fromJValue(parsed)
      case _ =>
        throw new IllegalArgumentException(
          "Frictionless schema must be a JSON object.")
    }
  }

  private def fromJValue(jv: JValue): FrictionlessSchema = {
    val fields = jv \ "fields" match {
      case JArray(items) => items
      case JNothing      => Nil
      case _ =>
        throw new IllegalArgumentException(
          "Frictionless schema fields must be a list.")
    }
    FrictionlessSchema(fields.map {
      case fo @ JObject(_) =>
        def str(k: String): Option[String] = fo \ k match {
          case JString(s) => Some(s)
          case _          => None
        }
        def bool(v: JValue): Boolean = v match {
          case JBool(b) => b
          case _        => false
        }
        FrictionlessField(
          name = str("name").getOrElse(""),
          fieldType = str("type").getOrElse("string"),
          format = str("format"),
          constraints = {
            val co = fo \ "constraints"
            def cstr(k: String): Option[String] = co \ k match {
              case JString(s)  => Some(s)
              case JInt(n)     => Some(n.toString)
              case JDouble(d)  => Some(d.toString)
              case JDecimal(d) => Some(d.toString)
              case _           => None
            }
            def cint(k: String): Option[Int] = co \ k match {
              case JInt(n) => Some(n.toInt)
              case _       => None
            }
            FieldConstraints(
              required = bool(fo \ "required") || bool(co \ "required"),
              unique = bool(co \ "unique"),
              pattern = cstr("pattern"),
              enumVals = co \ "enum" match {
                case JArray(items) => Some(items.collect {
                  case JString(s)  => s
                  case JInt(n)     => n.toString
                  case JDouble(d)  => d.toString
                  case JDecimal(d) => d.toString
                })
                case _ => None
              },
              minimum = cstr("minimum"),
              maximum = cstr("maximum"),
              minLength = cint("minLength"),
              maxLength = cint("maxLength")
            )
          },
          description = str("description")
        )
      case _ =>
        throw new IllegalArgumentException(
          "Frictionless schema field must be an object.")
    })
  }
}
