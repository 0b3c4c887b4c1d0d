package graft.schema

import org.apache.spark.sql.types.StructType

/** Legacy schema-compare decision (J4): compare a freshly inferred schema
  * against the live table's schema, honoring user type overrides, and
  * decide how to load (reference: aircan/dependencies_legacy/
  * api_loader.py:70-150, decision returns at :133-144):
  *
  *   - same columns and types              → append in place
  *   - any difference, append not required → drop & recreate
  *   - type change but append required     → hard error
  */
object SchemaCompare {

  sealed trait Decision
  object Decision {
    case object AppendInPlace extends Decision
    case object Recreate extends Decision
    final case class Incompatible(reason: String) extends Decision
  }

  /** Apply user type overrides (the CKAN data-dictionary equivalent,
    * api_loader.py:96-116) onto an inferred descriptor by field name. */
  def withOverrides(
      inferred: FrictionlessSchema,
      overrides: Map[String, String]
  ): FrictionlessSchema =
    FrictionlessSchema(inferred.fields.map { f =>
      overrides.get(f.name).orElse(overrides.get(Sanitizer.sanitize(f.name)))
        .map(t => f.copy(fieldType = t)).getOrElse(f)
    })

  def decide(
      live: Option[StructType],
      incoming: FrictionlessSchema,
      appendRequired: Boolean
  ): Decision = {
    val incomingSt = TypeMapping.toStructType(incoming.sanitized)
    live match {
      case None => Decision.Recreate
      case Some(cur) =>
        val curCols = cur.fields.map(f => f.name -> f.dataType).toMap
        val newCols = incomingSt.fields.map(f => f.name -> f.dataType).toMap
        if (curCols == newCols) Decision.AppendInPlace
        else {
          val typeChanged = incomingSt.fields
            .filter(f => curCols.get(f.name).exists(_ != f.dataType))
          if (appendRequired && typeChanged.nonEmpty)
            Decision.Incompatible(
              "Type change on an append-enabled resource: " +
                typeChanged.map(f => s"${f.name}: ${curCols(f.name)} -> ${f.dataType}")
                  .mkString(", "))
          else Decision.Recreate
        }
    }
  }
}
