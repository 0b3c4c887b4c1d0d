package graft.schema

/** Column-name sanitization to warehouse-safe identifiers, with collision
  * detection. Exact semantics of the reference
  * (aircan/dependencies/utils/schema.py:51-90):
  *
  *   1. trim whitespace
  *   2. every run of non-`[a-zA-Z0-9_]` chars → `_`
  *   3. collapse `_` runs, strip leading/trailing `_`
  *   4. if the result does not start with a letter or `_`, prefix `f_`
  *   5. truncate to 128 chars
  *
  * Two *different* original names mapping to the same sanitized name is a
  * hard error; the same original appearing twice maps consistently.
  */
object Sanitizer {

  def sanitize(name: String): String = {
    var n = name.trim
    n = n.replaceAll("[^a-zA-Z0-9_]+", "_")
    n = n.replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")
    if (!n.matches("^[A-Za-z_].*")) n = s"f_$n"
    n.take(128)
  }

  /** Sanitize a list of names; error on collisions between distinct originals
    * (reference: schema.py:69-85 `seen` map). */
  def sanitizeAll(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, String]
    names.map { original =>
      val s = sanitize(original)
      seen.get(s) match {
        case Some(prev) if prev != original =>
          throw new IllegalArgumentException(
            s"Sanitized field name collision: $prev and $original -> $s")
        case _ =>
          seen(s) = original
          s
      }
    }
  }

  def sanitizeFields(fields: List[FrictionlessField]): List[FrictionlessField] = {
    val names = sanitizeAll(fields.map(_.name))
    fields.lazyZip(names).map((f, n) => f.copy(name = n)).toList
  }
}
