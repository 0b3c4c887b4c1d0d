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
final case class FieldConstraints(
    required: Boolean = false,
    unique: Boolean = false
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
      if (f.constraints.required || f.constraints.unique) {
        var c: List[(String, JValue)] = Nil
        if (f.constraints.required) c :+= ("required" -> JBool(true))
        if (f.constraints.unique) c :+= ("unique" -> JBool(true))
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
          constraints = FieldConstraints(
            required = bool(fo \ "required") ||
              bool(fo \ "constraints" \ "required"),
            unique = bool(fo \ "constraints" \ "unique")
          ),
          description = str("description")
        )
      case _ =>
        throw new IllegalArgumentException(
          "Frictionless schema field must be an object.")
    })
  }
}
