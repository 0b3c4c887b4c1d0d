package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Nested-record flattening for JSON ingest — the missing step between
  * "NDJSON parses" and "a warehouse table" when sources emit nested
  * objects (the reference's loaders assume flat records; see
  * `aircan/dependencies/hybrid_load.py` schema handling). Struct columns
  * expand recursively to `parent<sep>child` scalar columns, depth-first in
  * schema order, so the output column order is a deterministic function of
  * the input schema.
  *
  * Arrays and maps are NOT exploded — flattening changes no row counts,
  * ever (explode is a different operator with different cardinality
  * semantics; compose with it explicitly when wanted). A null struct
  * yields nulls in all of its flattened children (Spark's native
  * null-propagating field access — no UDF, stays codegen'd and
  * pushdown-friendly: a filter on `a_b` prunes to field `a.b` at the
  * scan).
  *
  * Name collisions ("a_b" struct field colliding with a flat "a_b") fail
  * fast with the colliding paths — the [[Sanitizer.sanitizeAll]] posture:
  * silent renames would corrupt downstream schema contracts.
  */
object Flatten {

  /** Fully-flattened projection of `df` (structs only, any depth). */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    val cols = flatColumns(df.schema, Nil, sep)
    val names = cols.map(_._1)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    require(dups.isEmpty,
      s"Flatten: flattened name collision on ${dups.mkString(", ")} — " +
        "rename the source fields or use a different separator")
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  private def flatColumns(
      schema: StructType, path: List[String], sep: String
  ): Seq[(String, Column)] =
    schema.fields.toIndexedSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        flatColumns(st, path :+ name, sep)
      case StructField(name, _, _, _) =>
        val p = path :+ name
        Seq((p.mkString(sep), col(p.map(q => s"`$q`").mkString("."))))
    }
}
