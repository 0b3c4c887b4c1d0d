package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Named parquet tables with atomic snapshot swap.
  *
  * One CKAN resource = one flat table (SURVEY §1.1). The reference leans on
  * BigQuery for table atomicity (MERGE is atomic, load jobs are atomic —
  * warehouse.py:73-135, 200-297); plain Spark overwrites are not atomic, so
  * we write every new table state to a fresh snapshot directory and then
  * atomically repoint a small `CURRENT` manifest file:
  *
  *   root/<table>/snap-<n>/part-*.parquet
  *   root/<table>/CURRENT          ← contains "snap-<n>"
  *
  * A crash between snapshot write and pointer flip leaves the previous
  * snapshot live (recoverable; stale snapshots are GC'd on the next commit).
  * Works on any Hadoop FileSystem (local, HDFS; on S3 the single-file
  * manifest PUT is atomic even though dir-rename is not).
  */
final class TableStore(spark: SparkSession, root: String) {

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tableDir(name: String) = new Path(root, name)
  private def currentFile(name: String) = new Path(tableDir(name), "CURRENT")
  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(name: String): Boolean = {
    val f = currentFile(name)
    fs(f).exists(f)
  }

  def list(): Seq[String] = {
    val r = new Path(root)
    val f = fs(r)
    if (!f.exists(r)) Nil
    else f.listStatus(r).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  private def readCurrent(name: String): Option[String] = {
    val f = currentFile(name)
    val filesystem = fs(f)
    if (!filesystem.exists(f)) None
    else {
      val in = filesystem.open(f)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  private def snapshotPath(name: String): Option[Path] =
    readCurrent(name).map(s => new Path(tableDir(name), s))

  def scan(name: String): DataFrame = snapshotPath(name) match {
    case Some(p) => spark.read.parquet(p.toString)
    case None =>
      throw new IllegalArgumentException(s"Table not found: $name")
  }

  /** Write df as the new state of `name` (atomic pointer flip). */
  def overwrite(name: String, df: DataFrame): Unit = commit(name, df)

  /** Append with schema evolution: new columns are added, missing columns
    * null-filled (reference: warehouse.py:112-115 ALLOW_FIELD_ADDITION +
    * :154-172 ensure_table_has_fields). Type CHANGES on an existing column
    * remain a hard error, like the reference (api_loader.py:133-134). */
  def append(name: String, df: DataFrame): Unit =
    if (!exists(name)) commit(name, df)
    else {
      val existing = scan(name)
      checkNoTypeChanges(name, existing, df)
      commit(name, existing.unionByName(df, allowMissingColumns = true))
    }

  private def checkNoTypeChanges(name: String, existing: DataFrame, incoming: DataFrame): Unit = {
    val old = existing.schema.fields.map(f => f.name -> f.dataType).toMap
    val changed = incoming.schema.fields.filter(f => old.get(f.name).exists(_ != f.dataType))
    if (changed.nonEmpty)
      throw new IllegalArgumentException(
        s"Type change not allowed on append to $name: " +
          changed.map(f => s"${f.name}: ${old(f.name)} -> ${f.dataType}").mkString(", "))
  }

  /** Schema-only clone — `CREATE TABLE … WHERE 1=0` (warehouse.py:138-151). */
  def createLike(name: String, df: DataFrame): Unit =
    if (!exists(name)) commit(name, df.where(lit(false)))

  def drop(name: String): Unit = {
    val d = tableDir(name)
    val filesystem = fs(d)
    if (filesystem.exists(d)) filesystem.delete(d, true)
  }

  /** `SELECT COALESCE(MAX(col),0)+1` — next row-number start; missing table
    * or column → 1, like the reference's failure fallback
    * (warehouse.py:13-31). */
  def nextRowNumberStart(name: String, col: String = "_id"): Long =
    if (!exists(name)) 1L
    else {
      val df = scan(name)
      if (!df.columns.contains(col)) 1L
      else df.agg(coalesce(max(org.apache.spark.sql.functions.col(col)), lit(0L)))
        .first().getLong(0) + 1L
    }

  /** Write a new snapshot dir then atomically flip CURRENT; GC older
    * snapshots afterwards. */
  private def commit(name: String, df: DataFrame): Unit = {
    val dir = tableDir(name)
    val filesystem = fs(dir)
    filesystem.mkdirs(dir)
    val next = "snap-" + System.currentTimeMillis() + "-" +
      java.util.UUID.randomUUID().toString.take(8)
    df.write.mode("overwrite").parquet(new Path(dir, next).toString)

    // atomic pointer flip: write tmp, rename over CURRENT
    val tmp = new Path(dir, s"CURRENT.tmp-$next")
    val out = filesystem.create(tmp, true)
    try out.write(next.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val cur = currentFile(name)
    if (filesystem.exists(cur)) filesystem.delete(cur, false)
    if (!filesystem.rename(tmp, cur))
      throw new IllegalStateException(s"Failed to commit snapshot $next of $name")

    // GC stale snapshots (anything but the new current)
    filesystem.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("snap-") && n != next)
        filesystem.delete(st.getPath, true)
    }
  }
}
