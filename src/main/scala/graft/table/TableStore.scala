package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Named parquet tables with atomic manifest swap.
  *
  * One CKAN resource = one flat table (SURVEY §1.1). The reference leans on
  * BigQuery for table atomicity (MERGE and load jobs are atomic —
  * warehouse.py:73-135, 200-297); plain Spark writes are not atomic, so
  * every table state is described by a small `CURRENT` manifest file listing
  * one or more immutable snapshot directories:
  *
  *   root/<table>/snap-<id>/part-*.parquet      (immutable once written)
  *   root/<table>/CURRENT                       ("snap-a\nsnap-b\n…")
  *
  * - `overwrite`/merge commit ONE new snapshot dir and point the manifest
  *   at it alone.
  * - `append` writes ONLY the incoming batch as a new snapshot dir and
  *   points the manifest at old dirs + the new one — O(batch), never a
  *   table rewrite (at 100 TB rewriting the table per append is the
  *   difference between a working pipeline and a dead one). Schema
  *   evolution happens at read time via unionByName(allowMissingColumns);
  *   type CHANGES on an existing column remain a hard error, like the
  *   reference (api_loader.py:133-134).
  *
  * A crash between snapshot write and manifest flip leaves the previous
  * state live (orphan dirs are GC'd on the next commit). Works on any
  * Hadoop FileSystem; on S3 the single-file manifest PUT is atomic even
  * though dir-rename is not.
  */
/** @param retainVersions how many committed table versions stay readable
  *   via [[scanAsOf]]. The default 1 keeps only the live version (snapshots
  *   GC as soon as they leave CURRENT — exactly the storage profile of a
  *   plain table); a history store (e.g. 8) retains the last N versions'
  *   manifests AND their snapshot dirs, giving Delta-style time travel for
  *   the cost of the retained deltas.
  *
  *   Commit protocol (multi-writer safe): the COMMIT POINT is the atomic
  *   claim of the next version file `v-NNNNNN` (tmp write + no-overwrite
  *   rename — putIfAbsent). A writer that loses the claim re-reads the
  *   fresh manifest, re-derives its change (append unions re-derive their
  *   snapshot list), and retries the next slot, so two racing appenders
  *   both land and neither's snapshot is lost. CURRENT is a tagged CACHE
  *   of the head (`#v:N` first line), flipped after the claim: readers
  *   prefer the higher of (CURRENT's tag, the highest sealed version
  *   file), so a crash between claim and flip is invisible. Same-process
  *   writers additionally serialize on a per-table lock; cross-process
  *   atomicity delegates to the filesystem's no-overwrite rename (atomic
  *   on HDFS; conditional-put on object stores).
  *
  * @param gcGraceMs snapshot/DV dirs younger than this are never GC'd even
  *   when unreferenced — the cross-PROCESS guard for a writer whose
  *   snapshot is on disk but whose commit hasn't claimed a version yet.
  *   Same-process in-flight writes are tracked exactly (a registry the GC
  *   always spares), so the default 0 is safe for any number of racing
  *   writers in one JVM; fleets with writers in separate processes should
  *   set this to a few commit-latencies (e.g. 15 min). */
final class TableStore(spark: SparkSession, root: String,
    retainVersions: Int = 1, gcGraceMs: Long = 0L) {
  require(retainVersions >= 1, "retainVersions must be >= 1")
  require(gcGraceMs >= 0L, "gcGraceMs must be >= 0")

  private[table] def session: SparkSession = spark
  private def conf = spark.sparkContext.hadoopConfiguration
  private[table] def tableDir(name: String) = new Path(root, name)
  private def currentFile(name: String) = new Path(tableDir(name), "CURRENT")
  private def versionFile(name: String, v: Long) =
    new Path(tableDir(name), f"v-$v%06d")
  private[table] def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(name: String): Boolean = {
    val f = currentFile(name)
    fs(f).exists(f) || versions(name).nonEmpty
  }

  def list(): Seq[String] = {
    val r = new Path(root)
    val f = fs(r)
    if (!f.exists(r)) Nil
    else f.listStatus(r).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Raw pointer-file lines (comments included); Nil when absent. */
  private def readPointerLines(f: Path): Seq[String] = {
    val filesystem = fs(f)
    if (!filesystem.exists(f)) Nil
    else {
      val in =
        try filesystem.open(f)
        catch { case _: java.io.FileNotFoundException => return Nil }
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      finally in.close()
    }
  }

  /** Manifest entries of a pointer file — `#`-prefixed metadata lines
    * (CURRENT's `#v:N` tag, version files' `#graft-commit` seal) are
    * dropped; entry names never start with `#`. */
  private def readManifestFile(f: Path): Seq[String] =
    readPointerLines(f).filterNot(_.startsWith("#"))

  /** The seal every version file written by the claim protocol carries as
    * its last line. Its PRESENCE distinguishes a committed claim from a
    * legacy-format version file, making version files authoritative only
    * once a table has been committed by this protocol. */
  private val SealLine = "#graft-commit"

  /** Resolve the live manifest: the higher of CURRENT's `#v:N` tag and the
    * highest SEALED version file wins (they agree except in the claim→flip
    * crash window, where the sealed claim is the committed truth). Legacy
    * tables (untagged CURRENT, unsealed version files) resolve to CURRENT,
    * their original contract. Retries ride out the prune race (a reader
    * listing a version the next commit just retired re-lists and finds the
    * newer head). */
  private[table] def readManifest(name: String): Seq[String] =
    readHead(name)._2

  /** [[readManifest]] plus the HEAD VERSION the manifest corresponds to —
    * the commit loop's read-point. A committer must claim exactly
    * `head + 1`: binding the claim slot to the version its manifest was
    * read at is what makes the claim a compare-and-swap (a racer landing
    * in between takes the slot, our rename fails, and we re-derive from
    * THEIR manifest instead of silently committing over it). */
  private[table] def readHead(name: String): (Long, Seq[String]) = {
    var attempt = 0
    while (true) {
      attempt += 1
      val curLines = readPointerLines(currentFile(name))
      val curTag = curLines.collectFirst {
        case l if l.startsWith("#v:") => l.drop(3).toLong }
      val curSnaps = curLines.filterNot(_.startsWith("#"))
      val vmax = versions(name).lastOption
      // the claim base must clear every number either pointer kind knows
      val base = math.max(vmax.getOrElse(0L), curTag.getOrElse(0L))
      vmax match {
        case Some(v) if curTag.forall(_ < v) =>
          val lines = readPointerLines(versionFile(name, v))
          if (lines.contains(SealLine))
            return (base, lines.filterNot(_.startsWith("#")))
          else if (lines.isEmpty && attempt < 20) () // pruned underneath — re-list
          else if (lines.isEmpty)
            // a head that stays unreadable is NOT license to serve (and
            // worse, commit on top of) the stale CURRENT — that would
            // silently drop every commit between the tag and the head
            throw new IllegalStateException(
              s"head version v$v of $name unreadable after 20 attempts")
          else return (base, curSnaps) // legacy (unsealed) version file: CURRENT is the contract
        case _ => return (base, curSnaps)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Committed versions still readable via [[scanAsOf]], ascending. */
  def versions(name: String): Seq[Long] = {
    val dir = tableDir(name)
    val filesystem = fs(dir)
    if (!filesystem.exists(dir)) Nil
    else filesystem.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v-") => n.drop(2).toLong }
      .toSeq.sorted
  }

  /** Scan = replay of the manifest in commit order: snapshot entries union
    * in (read-time schema evolution — later snapshots may add columns);
    * deletion-vector entries ([[deleteByKeysDV]]) anti-join their key list
    * out of everything that PRECEDES them, so a key re-appended after a
    * takedown is live again — exactly the state a rewrite at each step
    * would have produced, at O(batch)/O(deleted) commit cost. */
  def scan(name: String): DataFrame = {
    val entries = readManifest(name)
    if (entries.isEmpty)
      throw new IllegalArgumentException(s"Table not found: $name")
    readState(name, entries)
  }

  /** Time travel: scan the table as of a retained `version` (from
    * [[versions]]). Same replay + schema evolution as [[scan]]. */
  def scanAsOf(name: String, version: Long): DataFrame = {
    val entries = readManifestFile(versionFile(name, version))
    if (entries.isEmpty)
      throw new IllegalArgumentException(
        s"Version $version of $name not found (retained: ${versions(name).mkString(",")})")
    readState(name, entries)
  }

  private def isDvEntry(e: String): Boolean = e.startsWith("dv-")

  /** The replay core shared by every read path: fold the manifest in
    * commit order — data snapshots union in, deletion vectors anti-join
    * the accumulated state on THEIR OWN columns (the key tuple each DV
    * was written with; DVs are dimension-sized, so the broadcast never
    * shuffles the table). Every snapshot is read against the full evolved
    * schema (parquet fills absent columns with null), which keeps the
    * interleaved unions positionally safe.
    *
    * @param keepFile when set, each snapshot reads only its physical
    *   files passing the predicate (zone-map / Bloom file skipping);
    *   snapshots with no surviving file drop out of the replay, DVs still
    *   apply. The per-snapshot grouping is what keeps replay order
    *   correct under pruning.
    * @param withFile prepend `__file` (= `_metadata.file_path`) to every
    *   row, selected per-snapshot because hidden metadata columns don't
    *   survive unions. */
  private[table] def readState(name: String, entries: Seq[String],
      keepFile: Option[String => Boolean] = None,
      withFile: Boolean = false): DataFrame = {
    val dataEntries = entries.filterNot(isDvEntry)
    require(dataEntries.nonEmpty, s"manifest of $name holds no data snapshots")
    def snapPath(sn: String) = new Path(tableDir(name), sn).toString
    // fast path — no vectors, no file pruning, no metadata column: the
    // plain union read (one footer pass per snapshot, not two). This is
    // the overwhelmingly common shape; the replay fold below pays an
    // extra schema-discovery pass only when a DV or pruning demands the
    // per-snapshot structure.
    if (keepFile.isEmpty && !withFile && dataEntries.sizeIs == entries.size)
      return dataEntries
        .map(sn => spark.read.parquet(snapPath(sn)))
        .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    val fullSchema = dataEntries
      .map(sn => spark.read.parquet(snapPath(sn)))
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true)).schema
    def decorate(df: DataFrame): DataFrame =
      if (!withFile) df
      else df.select(col("_metadata.file_path").as("__file") +:
        fullSchema.fieldNames.map(col).toIndexedSeq: _*)
    def snapFrame(sn: String): Option[DataFrame] = {
      val whole = spark.read.schema(fullSchema).parquet(snapPath(sn))
      keepFile match {
        case None => Some(decorate(whole))
        case Some(p) =>
          val kept = whole.inputFiles.filter(p).toIndexedSeq
          if (kept.isEmpty) None
          else Some(decorate(spark.read.schema(fullSchema).parquet(kept: _*)))
      }
    }
    val replayed = entries.foldLeft(Option.empty[DataFrame]) { (acc, e) =>
      if (isDvEntry(e)) acc.map { df =>
        val dv = spark.read.parquet(snapPath(e))
        df.join(broadcast(dv), dv.columns.toIndexedSeq, "left_anti")
      }
      else snapFrame(e) match {
        case None    => acc
        case Some(f) => Some(acc.map(_.unionByName(f)).getOrElse(f))
      }
    }
    replayed.getOrElse(
      // every file of every snapshot pruned away: an empty frame that
      // still carries the table's evolved schema
      decorate(spark.read.schema(fullSchema).parquet(snapPath(dataEntries.head)))
        .where(lit(false)))
  }

  /** Name of the zone-map sidecar table for `name` (a regular store table,
    * so it commits/GCs/time-travels like any other — the `_postings`
    * suffix convention). */
  def zoneMapTable(name: String): String = s"${name}_zonemap"

  /** Per-snapshot frames with the physical file path attached (replay
    * semantics identical to [[scan]], DVs applied). */
  private def scanWithFile(name: String): DataFrame = {
    val entries = readManifest(name)
    if (entries.isEmpty)
      throw new IllegalArgumentException(s"Table not found: $name")
    readState(name, entries, withFile = true)
  }

  /** Build/refresh the manifest-level zone map of `name`: one row per
    * physical file with row count and per-column min/max for `cols`.
    *
    * Parquet row-group statistics already prune WITHIN a file the scan has
    * opened; the zone map prunes the FILE LIST itself, before Spark plans
    * a single split — at 100 TB (millions of files) that is the difference
    * between a driver-side listing-and-footer storm and reading a
    * file-count-of-matches plan (the role of min/max file stats in
    * Delta/Iceberg manifests, rebuilt here on plain parquet + the atomic
    * manifest this store already has). Cost: one narrow scan of the table
    * (only `cols` + the metadata path), full map-side partial aggregation,
    * zone map output is file-count-sized. Pairs naturally with
    * [[overwriteClustered]]/[[overwriteZOrdered]], which make the
    * per-file ranges tight. */
  def analyzeZoneMaps(name: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "analyzeZoneMaps: at least one column")
    val df = scanWithFile(name)
    cols.foreach(c => require(df.columns.contains(c),
      s"analyzeZoneMaps: no such column $c in $name"))
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
    val zm = df.groupBy(col("__file").as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    overwrite(zoneMapTable(name), zm)
  }

  /** Incrementally refresh the zone map: ONLY files not yet in the
    * sidecar are scanned (the appends since the last analyze/refresh);
    * sidecar rows for files no longer live drop out. Content-equivalent
    * to a fresh [[analyzeZoneMaps]] over the same state at O(new files)
    * cost instead of O(table) — the only refresh cadence that survives a
    * 100 TB append stream (re-analyzing 100 TB to index a 100 GB append
    * is the zone-map equivalent of the rewrite-per-takedown trap).
    * Falls back to the full analyze when no sidecar exists or the
    * requested columns changed. Stats rows for files whose rows were
    * since DV-deleted keep their (wider) ranges — skipping stays
    * conservative, the residual predicate still decides every row. */
  def refreshZoneMaps(name: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "refreshZoneMaps: at least one column")
    val zmName = zoneMapTable(name)
    if (!exists(zmName)) return analyzeZoneMaps(name, cols)
    val zm = scan(zmName)
    // EXACT column-set match or full re-analyze: a subset would leave
    // the new files without the other columns' stats (and the union
    // would not even resolve), a superset lacks stats for the new ones
    val analyzed = zm.columns.collect {
      case c if c.endsWith("__min") => c.stripSuffix("__min") }.toSet
    if (analyzed != cols.toSet) return analyzeZoneMaps(name, cols)
    val d = sidecarDelta(name, zm)
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
    val next =
      if (!d.hasFresh) d.survivors
      else {
        val newPart = readState(name, readManifest(name),
            keepFile = Some(f => !d.knownPaths.contains(pathOf(f))),
            withFile = true)
          .groupBy(col("__file").as("file"))
          .agg(count(lit(1)).as("n_rows"), aggs: _*)
        d.survivors.unionByName(newPart)
      }
    overwrite(zmName, next)
  }

  /** The live data files (deletion-vector dirs excluded). */
  private def dataFiles(name: String): Seq[String] =
    readManifest(name).filterNot(isDvEntry).flatMap(sn =>
      spark.read.parquet(new Path(tableDir(name), sn).toString).inputFiles)

  /** Shared incremental-refresh scaffolding for the sidecar tables:
    * given the sidecar's `file` values, split the world into SURVIVORS
    * (sidecar rows for still-live files, filtered by the exact values
    * the column holds) and the known set for fresh-file discovery.
    * Matching is driver-side on [[pathOf]]-normalized values, so URI
    * scheme/authority/percent-encoding differences between the
    * sidecar's rendering and `inputFiles`' can never drop live rows —
    * all sets are file-count-sized (manifest metadata, never data). */
  private case class SidecarDelta(
      survivors: DataFrame, knownPaths: Set[String], hasFresh: Boolean)
  private def sidecarDelta(name: String, sidecar: DataFrame): SidecarDelta = {
    val fileVals = sidecar.select("file").distinct().collect()
      .map(_.getString(0))
    val known = fileVals.map(pathOf).toSet
    val liveSet = dataFiles(name).map(pathOf).toSet
    val survivorVals = fileVals.filter(v => liveSet.contains(pathOf(v)))
    val survivors =
      if (survivorVals.isEmpty) sidecar.where(lit(false))
      else sidecar.where(sidecar("file").isin(survivorVals.toSeq: _*))
    SidecarDelta(survivors, known, !liveSet.forall(known.contains))
  }

  /** Incremental Bloom-sidecar refresh — [[refreshZoneMaps]]'s contract
    * for [[analyzeBloomFilters]]: only unseen files scanned, dead files
    * dropped, build parameters taken from the existing sidecar so probe
    * and build can never hash differently. */
  def refreshBloomFilters(name: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "refreshBloomFilters: at least one column")
    val btName = bloomTable(name)
    if (!exists(btName)) return analyzeBloomFilters(name, cols)
    val bt = scan(btName)
    // EXACT column-set match or full re-analyze — a subset would index
    // fresh files for only the requested columns while still marking
    // them known, so the other columns' rows would NEVER be backfilled
    // (the zone-map path enforces the same policy for the same reason)
    val have = bt.select("column").distinct().collect().map(_.getString(0)).toSet
    if (have != cols.toSet) return analyzeBloomFilters(name, cols)
    val params = bt.select("bits", "hashes").distinct().collect()
    require(params.length == 1,
      s"refreshBloomFilters: mixed bits/hashes in Bloom sidecar of $name")
    val (bits, hashes) = (params.head.getInt(0), params.head.getInt(1))
    val d = sidecarDelta(name, bt)
    val next =
      if (!d.hasFresh) d.survivors
      else {
        val df = readState(name, readManifest(name),
          keepFile = Some(f => !d.knownPaths.contains(pathOf(f))),
          withFile = true)
        val perCol = cols.map { c =>
          df.where(col(c).isNotNull)
            .select(col("__file").as("file"), lit(c).as("column"),
              explode(bloomPositions(col(c), bits, hashes)).as("pos"))
        }
        val newPart = perCol.reduce(_ unionByName _)
          .groupBy("file", "column")
          .agg(collect_set(col("pos")).as("positions"))
          .withColumn("bits", lit(bits))
          .withColumn("hashes", lit(hashes))
        d.survivors.unionByName(newPart)
      }
    overwrite(btName, next)
  }

  /** `scan(name).where(colName BETWEEN lo AND hi)` with zone-map file
    * skipping: files whose [min, max] cannot intersect [lo, hi] (or that
    * hold no non-null value of the column) are dropped from the read plan
    * entirely; the residual predicate still applies to whatever is read,
    * so the result is ALWAYS exactly the filtered table.
    *
    * Staleness is safe by construction: files appended after the last
    * [[analyzeZoneMaps]] aren't in the map and are read unpruned
    * (correctness first, re-analyze to regain skipping); map entries for
    * files GC'd since are ignored. No zone map at all → plain filtered
    * scan. Skipping NEVER decides row membership — only the residual
    * predicate does. */
  def scanPruned(name: String, colName: String, lo: Any, hi: Any): DataFrame = {
    def resid(df: DataFrame) =
      df.where(col(colName) >= lit(lo) && col(colName) <= lit(hi))
    if (!exists(zoneMapTable(name))) return resid(scan(name))
    val zm = scan(zoneMapTable(name))
    require(zm.columns.contains(s"${colName}__min"),
      s"scanPruned: zone map of $name was not analyzed for $colName — " +
        s"re-run analyzeZoneMaps(${name}, Seq(..., $colName, ...))")
    // NaN bounds make both comparisons false → file kept (conservative)
    val skip = zm.where(col(s"${colName}__min").isNull ||
        col(s"${colName}__max") < lit(lo) || col(s"${colName}__min") > lit(hi))
      .select("file").collect().map(r => pathOf(r.getString(0))).toSet
    resid(readState(name, readManifest(name),
      keepFile = Some(f => !skip.contains(pathOf(f)))))
  }

  /** Scheme-independent path component ("file:/x", "file:///x", "/x" all
    * compare equal) — `inputFiles` and `_metadata.file_path` may render
    * the same file with different URI spellings. */
  private def pathOf(uri: String): String = new java.net.URI(uri).getPath

  def bloomTable(name: String): String = s"${name}_bloom"

  /** Build/refresh manifest-level Bloom filters of `name`: one sidecar row
    * per (physical file, column) holding the file's set of Bloom bit
    * positions for that column's values.
    *
    * Zone maps ([[analyzeZoneMaps]]) prune RANGE predicates, but min/max
    * is blind to EQUALITY on high-cardinality unordered columns (a host
    * name or doc hash is "within range" of almost every file). This is
    * the file-level Bloom index Delta/Iceberg keep in manifests, rebuilt
    * on plain parquet: `hashes` positions per value over a `bits`-slot
    * space (defaults ≈ 128k slots / 5 hashes — <1% false-file rate at
    * ~18k distinct values per file, position sets capped at `bits`
    * entries ~1 MB per file-column worst case). Cost: one narrow scan,
    * explode factor `hashes` per value, partial-agg `collect_set` whose
    * merged size is bounded by `bits` — never by row count. The params
    * ride in the sidecar rows so the probe side can never hash
    * differently than the build side. */
  def analyzeBloomFilters(name: String, cols: Seq[String],
      bits: Int = 1 << 17, hashes: Int = 5): Unit = {
    require(cols.nonEmpty, "analyzeBloomFilters: at least one column")
    require(bits > 0 && hashes > 0, "analyzeBloomFilters: bits, hashes > 0")
    val df = scanWithFile(name)
    cols.foreach(c => require(df.columns.contains(c),
      s"analyzeBloomFilters: no such column $c in $name"))
    val perCol = cols.map { c =>
      df.where(col(c).isNotNull)
        .select(col("__file").as("file"), lit(c).as("column"),
          explode(bloomPositions(col(c), bits, hashes)).as("pos"))
    }
    val bloom = perCol.reduce(_ unionByName _)
      .groupBy("file", "column")
      .agg(collect_set(col("pos")).as("positions"))
      .withColumn("bits", lit(bits))
      .withColumn("hashes", lit(hashes))
    overwrite(bloomTable(name), bloom)
  }

  /** The `hashes` Bloom positions of a value: `xxhash64(v, i) mod bits`
    * for i < hashes — evaluated identically at build and probe time. */
  private def bloomPositions(c: org.apache.spark.sql.Column, bits: Int,
      hashes: Int): org.apache.spark.sql.Column =
    array((0 until hashes).map(i =>
      pmod(xxhash64(c, lit(i)), lit(bits.toLong))): _*)

  /** `scan(name).where(colName = value)` with Bloom file skipping: files
    * whose position set provably lacks one of the value's positions are
    * dropped from the read plan before Spark sees them. Same safety
    * contract as [[scanPruned]]: the residual equality predicate decides
    * every row, skipping only shrinks the file list; files appended after
    * the last [[analyzeBloomFilters]] have no sidecar row and are read
    * unpruned; no sidecar at all → plain filtered scan. */
  def scanBloomPruned(name: String, colName: String, value: Any): DataFrame = {
    require(value != null, "scanBloomPruned: equality to NULL never matches")
    def resid(df: DataFrame) = df.where(col(colName) === lit(value))
    val base = scan(name)
    if (!exists(bloomTable(name))) return resid(base)
    val bt = scan(bloomTable(name)).where(col("column") === colName)
    // (probe hashing needs the column's type from the evolved schema)
    val params = bt.select("bits", "hashes").distinct().collect()
    if (params.isEmpty)
      throw new IllegalArgumentException(
        s"scanBloomPruned: Bloom sidecar of $name was not analyzed for " +
          s"$colName — re-run analyzeBloomFilters($name, Seq(..., $colName, ...))")
    require(params.length == 1,
      s"scanBloomPruned: mixed bits/hashes in Bloom sidecar of $name")
    val (bits, hashes) = (params.head.getInt(0), params.head.getInt(1))
    // the probe value's positions, via the same engine expression as the
    // build (one local 1-row job — never a reimplementation of the hash)
    val probe = spark.range(1).select(bloomPositions(
      lit(value).cast(base.schema(colName).dataType), bits, hashes).as("p"))
      .first().getSeq[Long](0)
    val skip = bt
      .where(!probe.map(p => array_contains(col("positions"), p))
        .reduce(_ && _))
      .select("file").collect().map(r => pathOf(r.getString(0))).toSet
    resid(readState(name, readManifest(name),
      keepFile = Some(f => !skip.contains(pathOf(f)))))
  }

  /** Snapshot CDC: row-level difference between two retained versions —
    * the change feed a downstream consumer replays to follow the table
    * without re-reading it (the reference's change-detection predicate
    * lifted from merge-time to whole-version granularity).
    *
    * Output: key columns + `op` (`insert` | `delete` | `update`) +
    * `changed_cols` (sorted names of non-key columns whose value differs,
    * null-safe comparison; null for insert/delete). Unchanged rows are NOT
    * emitted, so the result is change-sized, not table-sized.
    *
    * Scale shape: one full-outer join co-keyed on `keys` — both sides
    * shuffle once on the key (bucket both versions on the key to make
    * even that exchange-free); the change classification is a per-row
    * projection. Keys must be unique per version (the MERGE precondition
    * this store already enforces on upsert paths). */
  def diffVersions(name: String, fromV: Long, toV: Long,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diffVersions: at least one key column")
    diffFrames(scanAsOf(name, fromV), scanAsOf(name, toV), keys)
  }

  /** Keyed row diff of two frames — (keys..., op ∈ insert/update/delete,
    * changed_cols) from a's state to b's. The full-outer-join core of
    * [[diffVersions]] and [[mergeBranch]]. */
  private[table] def diffFrames(
      a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKey = b.columns.filter(c => !keys.contains(c) && a.columns.contains(c))
    val keyCond = keys.map(k => a(k) <=> b(k)).reduce(_ && _)
    val joined = a.as("a").join(b.as("b"), keyCond, "full_outer")
    val changed = array_sort(filter(
      array(nonKey.sorted.map(c =>
        when(col(s"a.$c") <=> col(s"b.$c"), lit(null).cast("string"))
          .otherwise(lit(c))).toIndexedSeq: _*),
      c => c.isNotNull))
    joined
      .withColumn("__a_present",
        keys.map(k => col(s"a.$k").isNotNull).reduce(_ || _))
      .withColumn("__b_present",
        keys.map(k => col(s"b.$k").isNotNull).reduce(_ || _))
      .withColumn("op",
        when(!col("__a_present"), lit("insert"))
          .when(!col("__b_present"), lit("delete"))
          .otherwise(lit("update")))
      .withColumn("changed_cols",
        when(col("op") === "update", changed).otherwise(lit(null)))
      .where(col("op") =!= "update" || size(col("changed_cols")) > 0)
      .select(keys.map(k =>
        coalesce(col(s"b.$k"), col(s"a.$k")).as(k)) ++
        Seq(col("op"), col("changed_cols")): _*)
  }

  /** Write df as the whole new state of `name` (atomic manifest flip). */
  def overwrite(name: String, df: DataFrame): Unit = {
    val snap = writeSnapshot(name, df)
    val done = commitOwning(name, snap)(_ => Some(Seq(snap)))
    assert(done, s"unconditional overwrite of $name cannot abort")
  }

  /** Overwrite with the data CLUSTERED on `clusterKeys`: range-partitioned
    * and sorted within files, so parquet row-group min/max statistics make
    * key-predicate scans prune most of the table (the path-table stand-in
    * for metastore bucketing — Spark cannot record output partitioning for
    * path tables, but data skipping needs only the file statistics). The
    * natural layout for tables merged/exported by `_id` or joined on a
    * stable key at 100 TB. */
  def overwriteClustered(name: String, df: DataFrame, clusterKeys: Seq[String],
      numFiles: Option[Int] = None): Unit = {
    val keys = clusterKeys.map(org.apache.spark.sql.functions.col)
    val shaped = numFiles match {
      case Some(n) => df.repartitionByRange(n, keys: _*)
      case None    => df.repartitionByRange(keys: _*)
    }
    overwrite(name, shaped.sortWithinPartitions(keys: _*))
  }

  /** Z-order (Morton curve) multi-column clustering: interleaves the bits
    * of each column's min/max-scaled value so that a range predicate on
    * ANY clustered column touches files whose per-column min/max stats are
    * narrow — parquet row-group skipping then prunes on every clustered
    * dimension. [[overwriteClustered]]'s linear order gives perfect
    * pruning on the leading key and NONE on the others; Z-order trades a
    * little leading-key locality for pruning on all d dimensions — the
    * standard layout for multi-dimensional slice queries over 100 TB
    * (the same curve behind Delta's OPTIMIZE ZORDER BY).
    *
    * Cost: one O(d)-value min/max aggregation (driver-collected), a pure
    * bitwise codegen'd z-value expression, and the same range-partition +
    * sort shuffle as any clustered rewrite. Numeric columns only; nulls
    * and degenerate (min==max) columns map to 0. */
  def overwriteZOrdered(name: String, df: DataFrame, clusterKeys: Seq[String],
      numFiles: Option[Int] = None, bits: Int = 16): Unit = {
    val z = zOrderValue(df, clusterKeys, bits)
    var zc = "__z"
    while (df.columns.contains(zc)) zc += "_"
    val withZ = df.withColumn(zc, z)
    val shaped = numFiles match {
      case Some(n) => withZ.repartitionByRange(n, col(zc))
      case None    => withZ.repartitionByRange(col(zc))
    }
    overwrite(name, shaped.sortWithinPartitions(col(zc)).drop(zc))
  }

  /** The interleaved z-value: column d contributes its scaled bit i at
    * output position `i*D + d` (higher columns own the higher tie-break
    * bits). Scaling is min/max to `[0, 2^effBits)`; effBits shrinks so the
    * interleaved value fits in a positive long. */
  private def zOrderValue(df: DataFrame, keys: Seq[String], bits: Int): org.apache.spark.sql.Column = {
    require(keys.size >= 2, "z-order needs at least two columns; use overwriteClustered for one")
    val d = keys.size
    val effBits = math.min(bits, 62 / d)
    val statsRow = df.agg(
      lit(0L).as("__zero"),
      keys.flatMap(k => Seq(
        min(col(k)).cast("double"), max(col(k)).cast("double"))): _*).first()
    val span = (1L << effBits) - 1
    val scaled: Seq[org.apache.spark.sql.Column] = keys.zipWithIndex.map { case (k, i) =>
      // empty input → null stats → degenerate column (all-zero contribution)
      val lo = if (statsRow.isNullAt(1 + 2 * i)) 0.0 else statsRow.getDouble(1 + 2 * i)
      val hi = if (statsRow.isNullAt(2 + 2 * i)) 0.0 else statsRow.getDouble(2 + 2 * i)
      if (hi <= lo) lit(0L)
      else least(lit(span), greatest(lit(0L),
        ((coalesce(col(k).cast("double"), lit(lo)) - lit(lo)) /
          lit(hi - lo) * lit(span.toDouble)).cast("long")))
    }
    (for { i <- 0 until effBits; j <- 0 until d } yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Overwrite as a BUCKETED catalog table: hash-bucketed (and sorted)
    * on `keys` into `numBuckets` files per writer task. Two tables bucketed
    * identically join/merge on those keys with NO exchange on either side —
    * the co-location lever for 100 TB steady-state merges: bucket the
    * target once, bucket each staging batch the same way, and the per-batch
    * full-outer MERGE stops reshuffling the target. Bucketing metadata
    * needs the session catalog (Spark cannot record output partitioning
    * for path tables — see [[overwriteClustered]] for the path-table
    * stand-in, which gives file skipping but not shuffle elimination);
    * data lands under this store's root, catalog entry
    * `graft_bkt_<rootHash>_<name>` (root-hashed so same-named tables in
    * different stores never collide in the shared session catalog).
    * Scan through [[scanBucketed]]; plain [[scan]] would read the files
    * but lose the bucketing guarantee. */
  def overwriteBucketed(name: String, df: DataFrame, keys: Seq[String],
      numBuckets: Int): Unit = {
    val dir = new Path(tableDir(name), s"bucketed").toString
    val catalog = bucketedCatalogName(name)
    spark.sql(s"DROP TABLE IF EXISTS `$catalog`")
    df.write.format("parquet").option("path", dir)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(catalog)
  }

  /** Append to a BUCKETED catalog table created by [[overwriteBucketed]]
    * with the SAME keys and bucket count (Spark validates the spec and
    * refuses a mismatch). Each append adds one file per (writer task,
    * bucket); bucket pruning and exchange-free joins keep working — the
    * per-bucket data is just split across more files. Sort order is
    * per-file, so merge-sorted reads across appends are NOT guaranteed;
    * callers needing one sorted run per bucket should compact by
    * re-calling [[overwriteBucketed]] with the scan. */
  def appendBucketed(name: String, df: DataFrame, keys: Seq[String],
      numBuckets: Int): Unit = {
    require(spark.catalog.tableExists(bucketedCatalogName(name)),
      s"appendBucketed: no bucketed table '$name' — overwriteBucketed first")
    df.write.format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("append")
      .saveAsTable(bucketedCatalogName(name))
    // `df` may belong to another session (e.g. Structured Streaming's
    // cloned micro-batch session); its write only invalidates THAT
    // session's relation cache, and a reader on this store's session would
    // keep serving the pre-append file listing. Refresh here so appends
    // are immediately visible wherever the store reads from.
    spark.catalog.refreshTable(bucketedCatalogName(name))
  }

  /** Scan a bucketed table WITH its bucketing metadata (via the catalog). */
  def scanBucketed(name: String): DataFrame =
    spark.table(bucketedCatalogName(name))

  /** Catalog entries are session-global while stores are root-scoped, so the
    * name embeds a stable hash of this store's root — two stores with the
    * same table name in one SparkSession get distinct catalog entries
    * instead of silently repointing each other's. */
  private def bucketedCatalogName(name: String): String = {
    val rootHash = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(new Path(root).toString))
    s"graft_bkt_${rootHash}_" + name.replaceAll("[^a-zA-Z0-9_]", "_")
  }

  /** Append ONLY the incoming batch as a new snapshot (no table rewrite);
    * evolution by field addition, type changes rejected. */
  def append(name: String, df: DataFrame): Unit =
    if (!exists(name)) overwrite(name, df)
    else {
      checkNoTypeChanges(name, scan(name), df)
      val snap = writeSnapshot(name, df)
      // the closure re-derives the union from the manifest AT COMMIT
      // TIME, so losing the version race to a concurrent appender only
      // means retrying on top of their manifest — never dropping it
      val done = commitOwning(name, snap)(cur => Some(cur :+ snap))
      assert(done, s"append to $name cannot abort")
    }

  private def checkNoTypeChanges(name: String, existing: DataFrame, incoming: DataFrame): Unit = {
    val old = existing.schema.fields.map(f => f.name -> f.dataType).toMap
    val changed = incoming.schema.fields.filter(f => old.get(f.name).exists(_ != f.dataType))
    if (changed.nonEmpty)
      throw new IllegalArgumentException(
        s"Type change not allowed on append to $name: " +
          changed.map(f => s"${f.name}: ${old(f.name)} -> ${f.dataType}").mkString(", "))
  }

  /** Read-modify-write rewrite that cannot drop a concurrent commit:
    * derive the new state FROM a basis manifest, then commit conditional
    * on the manifest still being that basis — if another writer moved
    * the table (an append, a DV takedown), re-derive from the fresh
    * manifest and retry. Plain [[overwrite]] is deliberately last-wins
    * (its contract ignores prior state); everything that REWRITES the
    * current state (compact, predicate/key deletes, branch merges) must
    * come through here or a racing takedown could be silently
    * resurrected by the rewrite's stale snapshot. */
  private[table] def rewriteConditional(name: String, what: String)(
      derive: Seq[String] => Option[DataFrame]): Unit = {
    var attempt = 0
    while (attempt < 8) {
      attempt += 1
      val basis = readManifest(name)
      if (basis.isEmpty)
        throw new IllegalArgumentException(s"Table not found: $name")
      derive(basis) match {
        case None => return // nothing to do at this basis (e.g. compact under threshold)
        case Some(df) =>
          val snap = writeSnapshot(name, df)
          val committed = commitOwning(name, snap)(
            cur => if (cur == basis) Some(Seq(snap)) else None)
          if (committed) return
        // else: another writer landed between our read and claim —
        // loop re-derives against their manifest (orphan snap GCs)
      }
    }
    throw new IllegalStateException(
      s"$what of $name lost to concurrent writers 8 times — aborting")
  }

  /** Row-level delete: commit a NEW snapshot holding every current row
    * whose `pred` is NOT true (SQL DELETE semantics — null predicates
    * KEEP the row), atomic at the same commit point as any write, and
    * CONDITIONAL on the state it filtered: a concurrent append or DV
    * takedown makes the rewrite re-derive instead of silently dropping
    * it. The takedown/right-to-erasure primitive for corpus TABLES,
    * completing the delete lifecycle the persistent indexes already have
    * (BM25 tombstones, near-dup/vector index deletes): a crash mid-way
    * leaves the pre-delete state live, retained versions still time-
    * travel to it ([[scanAsOf]]), and the change feed shows the deletes
    * ([[diffVersions]] `op = 'delete'`).
    *
    * Cost is one filtered table rewrite — O(table), like BigQuery DELETE
    * or a Delta non-partition delete. At 100 TB use [[deleteByKeysDV]]
    * for O(deleted) commits, or route bulk erasure through key-clustered
    * layouts ([[overwriteClustered]]) so the filter prunes most files at
    * the scan, and batch takedowns rather than issuing per-row commits. */
  def deleteWhere(name: String, pred: org.apache.spark.sql.Column): Unit =
    rewriteConditional(name, "deleteWhere")(basis =>
      Some(readState(name, basis).where(!coalesce(pred, lit(false)))))

  /** Delete by key list: drop every current row whose `keys` tuple
    * appears in `toDelete` (extra columns there are ignored; the key set
    * is deduplicated and BROADCAST — takedown lists are dimension-sized,
    * so the table itself never shuffles for the anti join). Rows with a
    * null key component never match a list entry (SQL equality) and are
    * kept. Same atomicity/time-travel contract as [[deleteWhere]]. */
  def deleteByKeys(name: String, keys: Seq[String], toDelete: DataFrame): Unit = {
    require(keys.nonEmpty, "deleteByKeys: at least one key column")
    val keyList = toDelete.select(keys.map(col): _*).distinct()
    rewriteConditional(name, "deleteByKeys")(basis =>
      Some(readState(name, basis).join(broadcast(keyList), keys, "left_anti")))
  }

  /** Deletion-vector delete: same observable result as [[deleteByKeys]]
    * at O(deleted) commit cost instead of O(table). The deduplicated key
    * list lands as a `dv-` manifest entry — NO data file is rewritten —
    * and every read path replays it as a broadcast anti-join over the
    * snapshots that precede it ([[scan]]): rows re-appended after the
    * takedown are untouched, time travel and [[diffVersions]] see the
    * deletes, zone-map/Bloom file skipping composes (the residual DV
    * join still decides row membership). At 100 TB this is the takedown
    * primitive: a right-to-erasure batch commits in seconds regardless
    * of table size, and the accumulated vectors fold into a real rewrite
    * at the next [[compact]] — after which the manifest holds plain
    * snapshots again. Rows with a null key component never match (SQL
    * equality), like [[deleteByKeys]]. */
  def deleteByKeysDV(name: String, keys: Seq[String], toDelete: DataFrame): Unit = {
    require(keys.nonEmpty, "deleteByKeysDV: at least one key column")
    val current = scan(name) // also: table-exists check
    keys.foreach(k => require(current.columns.contains(k),
      s"deleteByKeysDV: no such column $k in $name"))
    val keyList = toDelete.select(keys.map(col): _*).distinct()
    val dv = writeDeletionVector(name, keyList)
    val done = commitOwning(name, dv)(cur => Some(cur :+ dv))
    assert(done, s"deleteByKeysDV on $name cannot abort")
  }

  /** EXACTLY-ONCE [[deleteByKeysDV]]: commit the vector with an
    * idempotency tag, or skip if a live `dv-` entry already carries it.
    * Re-running a takedown batch is NOT harmless without this — a key
    * legitimately re-appended between the original commit and the replay
    * would be erased by the replayed vector (it lands LATER in the
    * manifest). Same tag window as [[appendTagged]]: the live manifest —
    * once [[compact]] folds the vector away the tag is forgotten, which
    * covers streaming replays of the immediately preceding batch, not
    * arbitrarily delayed re-submission. Returns true iff committed. */
  def deleteByKeysDVTagged(name: String, keys: Seq[String],
      toDelete: DataFrame, tag: String): Boolean = {
    require(tag.nonEmpty &&
        tag.forall(c => c.isLetterOrDigit || c == '.' || c == '_'),
      s"tag must be [A-Za-z0-9._]+ (dashes delimit it in the name): '$tag'")
    require(keys.nonEmpty, "deleteByKeysDVTagged: at least one key column")
    val marker = s"-tag-$tag-"
    def tagged(cur: Seq[String]) =
      cur.exists(e => isDvEntry(e) && e.contains(marker))
    if (exists(name) && tagged(readManifest(name))) return false
    val current = scan(name)
    keys.foreach(k => require(current.columns.contains(k),
      s"deleteByKeysDVTagged: no such column $k in $name"))
    val keyList = toDelete.select(keys.map(col): _*).distinct()
    val dv = writeDeletionVector(name, keyList, s"tag-$tag-")
    commitOwning(name, dv)(cur =>
      if (tagged(cur)) None else Some(cur :+ dv))
  }

  /** Rewrite the manifest's chain into a single snapshot when it grows
    * past `maxSnapshots` entries (appends accumulate read-time union
    * branches, [[deleteByKeysDV]] accumulates anti-join branches;
    * compaction restores one columnar scan and FOLDS every deletion
    * vector into the rewrite — the O(table) cost deferred from each
    * O(deleted) takedown, paid once). Atomic like any commit; no-op
    * below the threshold. */
  def compact(name: String, maxSnapshots: Int = 16): Unit =
    rewriteConditional(name, "compact")(basis =>
      if (basis.size > maxSnapshots) Some(readState(name, basis)) else None)

  /** Schema-only clone — `CREATE TABLE … WHERE 1=0` (warehouse.py:148-151). */
  def createLike(name: String, df: DataFrame): Unit =
    if (!exists(name)) overwrite(name, df.where(lit(false)))

  def drop(name: String): Unit = {
    val d = tableDir(name)
    val filesystem = fs(d)
    if (filesystem.exists(d)) filesystem.delete(d, true)
  }

  /** `SELECT COALESCE(MAX(col),0)+1` — next row-number start; missing table
    * or column → 1, like the reference's fallback (warehouse.py:13-31). */
  def nextRowNumberStart(name: String, col: String = "_id"): Long =
    if (!exists(name)) 1L
    else {
      val df = scan(name)
      if (!df.columns.contains(col)) 1L
      else df.agg(coalesce(max(org.apache.spark.sql.functions.col(col)), lit(0L)))
        .first().getLong(0) + 1L
    }

  private[table] def writeSnapshot(name: String, df: DataFrame,
      tagPart: String = ""): String = {
    val snap = "snap-" + System.currentTimeMillis() + "-" + tagPart +
      java.util.UUID.randomUUID().toString.take(8)
    writeDataDir(name, snap, df)
  }

  /** A deletion vector's key list, written like a snapshot (the dv's
    * parquet columns ARE its key tuple); `tagPart` carries the
    * idempotency marker for [[deleteByKeysDVTagged]]. */
  private def writeDeletionVector(name: String, keyList: DataFrame,
      tagPart: String = ""): String =
    writeDataDir(name,
      "dv-" + System.currentTimeMillis() + "-" + tagPart +
        java.util.UUID.randomUUID().toString.take(8),
      keyList)

  /** Write a data dir and register it in-flight so a concurrent
    * committer's GC can't reap it before its own commit lands. Every
    * writer clears the mark when its commit attempt finishes (success,
    * abort, or exception — the mark must not outlive the attempt or the
    * registry grows unboundedly and orphans become un-GC-able for the
    * JVM's lifetime); a failed WRITE clears it here. */
  private def writeDataDir(name: String, entry: String, df: DataFrame): String = {
    val dir = tableDir(name)
    fs(dir).mkdirs(dir)
    val p = new Path(dir, entry)
    TableStore.markPending(pendingKey(name, entry))
    try df.write.mode("overwrite").parquet(p.toString)
    catch { case e: Throwable =>
      TableStore.unmarkPending(pendingKey(name, entry)); throw e
    }
    entry
  }

  /** Commit `compute` and ALWAYS clear `entry`'s in-flight mark when the
    * attempt finishes — committed entries are protected by manifest
    * liveness from then on, failed ones become ordinary GC fodder. */
  private def commitOwning(name: String, entry: String)(
      compute: Seq[String] => Option[Seq[String]]): Boolean =
    try commitManifestCasOpt(name, compute)
    finally TableStore.unmarkPending(pendingKey(name, entry))

  private def pendingKey(name: String, entry: String): String = {
    // qualified-absolute, because the GC side compares listStatus paths
    // (always qualified); a relative store root would otherwise make the
    // registry inert and let a racing commit's GC reap in-flight dirs
    val p = new Path(tableDir(name), entry)
    fs(p).makeQualified(p).toUri.getPath
  }

  /** EXACTLY-ONCE append: commit `df` as a new snapshot carrying an
    * idempotency tag, or skip if a live snapshot already carries `tag`.
    * Returns true iff this call committed.
    *
    * The tag is encoded in the snapshot DIRECTORY NAME, so it rides the
    * same atomic CURRENT flip that commits the data — there is no
    * separate commit marker that could desynchronize. A replay after a
    * crash lands in exactly two states: the flip happened (tag visible in
    * the manifest → skip) or it didn't (orphan snapshot dir, GC'd at the
    * next commit → rewrite). This upgrades a foreachBatch sink from
    * at-least-once to exactly-once: tag with the micro-batch id
    * ([[graft.streaming.StreamingIngest.exactlyOnceIngestAvailableNow]]).
    *
    * The idempotency window is the LIVE manifest: once a later overwrite
    * drops the tagged snapshot from CURRENT, the tag is forgotten — the
    * contract covers streaming replays (which re-run the immediately
    * preceding uncommitted batch), not arbitrarily delayed re-submission. */
  def appendTagged(name: String, df: DataFrame, tag: String): Boolean = {
    require(tag.nonEmpty &&
        tag.forall(c => c.isLetterOrDigit || c == '.' || c == '_'),
      s"tag must be [A-Za-z0-9._]+ (dashes delimit it in the name): '$tag'")
    val marker = s"-tag-$tag-"
    if (exists(name) && readManifest(name).exists(_.contains(marker))) false
    else {
      if (exists(name)) checkNoTypeChanges(name, scan(name), df)
      val snap = writeSnapshot(name, df, s"tag-$tag-")
      // the tag re-check runs INSIDE the commit against the manifest at
      // commit time, so two replays racing each other collapse to one
      // committed snapshot — the loser aborts and its orphan dir GCs
      commitOwning(name, snap)(cur =>
        if (cur.exists(_.contains(marker))) None else Some(cur :+ snap))
    }
  }

  // ------------------------------------------------------------------
  // Branches: zero-copy divergent lines of a table (the LakeFS/Nessie
  // pattern scaled down to path-table manifests). A branch is two extra
  // pointer files in the SAME table directory —
  //   BRANCH-<b>: the branch head (flipped atomically like CURRENT)
  //   BASE-<b>:   the fork-point manifest, frozen (the three-way base)
  // — so creating a branch moves zero data bytes, branch commits write
  // ordinary snapshots next to main's, and commitManifest's GC counts
  // every branch pointer among the live roots. Branch commits keep no
  // version history (the branch is a workspace, not an archive); orphan
  // snapshots from branch overwrites are reaped by the next main commit.
  // ------------------------------------------------------------------

  private def branchFile(name: String, b: String) =
    new Path(tableDir(name), s"BRANCH-$b")
  private def branchBaseFile(name: String, b: String) =
    new Path(tableDir(name), s"BASE-$b")
  private def requireBranchName(b: String): Unit =
    require(b.nonEmpty && b.forall(c => c.isLetterOrDigit || c == '.' || c == '_'),
      s"branch name must be [A-Za-z0-9._]+: '$b'")

  /** Fork `branch` off the table's current state — O(pointer), no data
    * copied. The base manifest freezes for the eventual three-way merge. */
  def createBranch(name: String, branch: String): Unit = {
    requireBranchName(branch)
    require(exists(name), s"Table not found: $name")
    require(!fs(tableDir(name)).exists(branchFile(name, branch)),
      s"Branch exists: $name@$branch")
    val snaps = readManifest(name)
    // base first: a crash between the writes leaves an inert BASE file
    // (extra GC root, no visible branch) rather than a branch with no base
    atomicWritePointer(tableDir(name), branchBaseFile(name, branch), snaps)
    atomicWritePointer(tableDir(name), branchFile(name, branch), snaps)
  }

  /** Live branches of `name`. */
  def branches(name: String): Seq[String] = {
    val dir = tableDir(name)
    val filesystem = fs(dir)
    if (!filesystem.exists(dir)) Nil
    else filesystem.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("BRANCH-") && !n.contains(".tmp-") =>
        n.stripPrefix("BRANCH-") }
      .toSeq.sorted
  }

  private def unionRead(name: String, snaps: Seq[String]): DataFrame = {
    require(snaps.nonEmpty, s"empty manifest for $name")
    readState(name, snaps)
  }

  /** Scan a branch head — same replay + schema evolution as [[scan]]
    * (a branch forked after a DV delete inherits the DV entry). */
  def scanBranch(name: String, branch: String): DataFrame = {
    val f = branchFile(name, branch)
    require(fs(tableDir(name)).exists(f), s"Branch not found: $name@$branch")
    unionRead(name, readManifestFile(f))
  }

  /** Append to a branch head (atomic branch-pointer flip; main untouched).
    * The read-modify-write of the head runs under the table's commit lock
    * so same-process racing branch appenders serialize instead of one
    * silently overwriting the other's flip (branch heads keep no version
    * files, so the main table's claim protocol doesn't apply; the branch
    * is a single-writer workspace across processes). */
  def appendBranch(name: String, branch: String, df: DataFrame): Unit = {
    val f = branchFile(name, branch)
    require(fs(tableDir(name)).exists(f), s"Branch not found: $name@$branch")
    checkNoTypeChanges(name, scanBranch(name, branch), df)
    val snap = writeSnapshot(name, df)
    try TableStore.commitLock(root, name).synchronized {
      atomicWritePointer(tableDir(name), f, readManifestFile(f) :+ snap)
    } finally TableStore.unmarkPending(pendingKey(name, snap))
  }

  /** Replace a branch head's content (atomic; main untouched). Last-wins
    * by contract (like [[overwrite]]); the lock only serializes the flip
    * against [[appendBranch]]'s read-modify-write so an append never
    * resurrects the pre-overwrite head. */
  def overwriteBranch(name: String, branch: String, df: DataFrame): Unit = {
    val f = branchFile(name, branch)
    require(fs(tableDir(name)).exists(f), s"Branch not found: $name@$branch")
    val snap = writeSnapshot(name, df)
    try TableStore.commitLock(root, name).synchronized {
      atomicWritePointer(tableDir(name), f, Seq(snap))
    } finally TableStore.unmarkPending(pendingKey(name, snap))
  }

  /** Delete a branch and its base pointer; snapshots referenced by
    * nothing else fall to the next main commit's GC. */
  def dropBranch(name: String, branch: String): Unit = {
    val filesystem = fs(tableDir(name))
    filesystem.delete(branchFile(name, branch), false)
    filesystem.delete(branchBaseFile(name, branch), false)
  }

  /** Row-level THREE-WAY merge of `branch` into main, keyed by `keys`
    * (unique per row on every side).
    *
    * Change sets are computed against the frozen fork base: a key is a
    * CONFLICT iff both sides changed it since the base AND their final
    * rows differ (both making the identical change is not a conflict —
    * the git contract). With zero conflicts the merge commits
    * atomically — main becomes (main minus branch-changed keys) ∪
    * (branch's rows for those keys), covering updates, inserts, and
    * deletes in one expression — and the branch drops. With conflicts
    * the store is left UNTOUCHED and the conflict report returns:
    * (keys..., op_main, op_branch) — op ∈ insert/update/delete from each
    * side's diff vs base. Callers resolve by writing the winning rows to
    * one side and re-merging.
    *
    * Scale shape: three manifest scans, two key-wise diffs (full-outer
    * joins on the key — the same shape as [[diffVersions]]), and the
    * commit path's anti/semi joins; nothing row-quadratic, no windows.
    * The conflict probe `count()` is a driver scalar, not a collect. */
  def mergeBranch(
      name: String,
      branch: String,
      keys: Seq[String],
      policy: TableStore.MergePolicy = TableStore.MergePolicy.Fail
  ): DataFrame = {
    val tw = threeWay(name, branch, keys)
    val resolvable = policy != TableStore.MergePolicy.Fail
    if (!tw.hasConflicts || resolvable) {
      // with a resolution policy the report outlives the commit, whose GC
      // can reap the snapshots the lazy frame reads — materialize first
      // (edit-sized by construction; localCheckpoint cuts the file lineage)
      val report =
        if (tw.hasConflicts) tw.conflicts.localCheckpoint(true)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          tw.conflicts.schema)
      val takeKeys = policy match {
        case TableStore.MergePolicy.OursWins =>
          tw.branchChangedKeys.join(tw.conflicts, keys, "left_anti")
            .select(keys.map(col): _*)
        case _ => tw.branchChangedKeys
      }
      val merged = tw.ours.join(takeKeys, keys, "left_anti")
        .unionByName(tw.theirs.join(takeKeys, keys, "left_semi"),
          allowMissingColumns = true)
      val snap = writeSnapshot(name, merged)
      // commit conditional on BOTH basis states: a concurrent main commit
      // or branch append since the three-way read means the merged
      // snapshot describes a state that no longer exists — fail loudly
      // (callers re-run the merge) instead of silently dropping it. The
      // in-flight mark clears on every exit (the failed snapshot becomes
      // ordinary GC fodder).
      try TableStore.commitLock(root, name).synchronized {
        val branchNow = readManifestFile(branchFile(name, branch))
        require(branchNow == tw.basisBranch,
          s"mergeBranch: $name@$branch moved during the merge — retry")
        val committed = commitOwning(name, snap)(
          cur => if (cur == tw.basisMain) Some(Seq(snap)) else None)
        require(committed,
          s"mergeBranch: $name moved during the merge — retry")
        dropBranch(name, branch)
      } finally TableStore.unmarkPending(pendingKey(name, snap))
      report
    } else tw.conflicts
  }

  /** REBASE `branch` onto main's current state: the branch head becomes
    * (main minus branch-changed keys) ∪ (branch's rows for them) — the
    * same three-way algebra as [[mergeBranch]] committed to the BRANCH —
    * and the fork base advances to main's manifest, so a later merge is
    * clean by construction. Conflicts follow `policy`: Fail refuses and
    * touches nothing; OursWins adopts main's rows; TheirsWins keeps the
    * branch's. Returns the conflict report ((keys..., op_main,
    * op_branch); empty under Fail when the rebase committed). */
  def rebaseBranch(
      name: String,
      branch: String,
      keys: Seq[String],
      policy: TableStore.MergePolicy = TableStore.MergePolicy.Fail
  ): DataFrame = {
    val tw = threeWay(name, branch, keys)
    val resolvable = policy != TableStore.MergePolicy.Fail
    if (!tw.hasConflicts || resolvable) {
      val report =
        if (tw.hasConflicts) tw.conflicts.localCheckpoint(true)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          tw.conflicts.schema)
      val takeKeys = policy match {
        case TableStore.MergePolicy.OursWins =>
          tw.branchChangedKeys.join(tw.conflicts, keys, "left_anti")
            .select(keys.map(col): _*)
        case _ => tw.branchChangedKeys
      }
      val rebased = tw.ours.join(takeKeys, keys, "left_anti")
        .unionByName(tw.theirs.join(takeKeys, keys, "left_semi"),
          allowMissingColumns = true)
      val snap = writeSnapshot(name, rebased)
      // head first, then base: a crash between the flips leaves a branch
      // whose base still predates the rebase — a later merge re-runs the
      // same three-way and converges (rows already match theirs). The
      // flips run under the table lock AND conditional on BOTH basis
      // manifests the three-way read: a racing appendBranch (or a main
      // commit) fails the rebase loudly. The new base is EXACTLY the
      // main manifest the rebased rows were derived from — advancing it
      // to a fresher manifest would poison the fork point (a later merge
      // would read main-side rows the branch never saw as branch
      // deletions and silently drop them from main).
      try TableStore.commitLock(root, name).synchronized {
        val branchNow = readManifestFile(branchFile(name, branch))
        require(branchNow == tw.basisBranch,
          s"rebaseBranch: $name@$branch moved during the rebase — retry")
        require(readManifest(name) == tw.basisMain,
          s"rebaseBranch: $name moved during the rebase — retry")
        atomicWritePointer(tableDir(name), branchFile(name, branch), Seq(snap))
        atomicWritePointer(tableDir(name), branchBaseFile(name, branch),
          tw.basisMain)
      } finally TableStore.unmarkPending(pendingKey(name, snap))
      report
    } else tw.conflicts
  }

  private case class ThreeWay(
      ours: DataFrame, theirs: DataFrame,
      branchChangedKeys: DataFrame, conflicts: DataFrame,
      hasConflicts: Boolean,
      basisMain: Seq[String], basisBranch: Seq[String])

  /** The shared three-way core: change sets vs the frozen fork base,
    * git-contract conflicts (both changed AND final rows differ). Change
    * sets persist — edit-sized, consumed by both the probe and the
    * commit's anti/semi keys. The probe is a driver scalar, not a
    * collect. */
  private def threeWay(
      name: String, branch: String, keys: Seq[String]): ThreeWay = {
    require(keys.nonEmpty, "three-way merge: at least one key column")
    val f = branchFile(name, branch)
    require(fs(tableDir(name)).exists(f), s"Branch not found: $name@$branch")
    val base = unionRead(name, readManifestFile(branchBaseFile(name, branch)))
    // basis manifests captured ONCE and frames built from them — the
    // commit is conditional on these exact states, so a concurrent main
    // or branch writer makes the merge fail loudly instead of silently
    // committing a merge of a state that no longer exists
    val basisMain = readManifest(name)
    val basisBranch = readManifestFile(f)
    val ours = readState(name, basisMain)
    val theirs = unionRead(name, basisBranch)

    val bd = diffFrames(base, theirs, keys)
      .select(keys.map(col) :+ col("op").as("op_branch"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val md = diffFrames(base, ours, keys)
      .select(keys.map(col) :+ col("op").as("op_main"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val both = bd.join(md, keys)
    // identical-change exemption: ours row null-safe-equals theirs row
    val nonKey = ours.columns.filter(c => !keys.contains(c))
    val o = ours.select(keys.map(col) :+
      struct(nonKey.sorted.map(col): _*).as("__orow"): _*)
    val t = theirs.select(keys.map(col) :+
      struct(nonKey.sorted.map(col): _*).as("__trow"): _*)
    val conflicts = both
      .join(o, keys, "left")
      .join(t, keys, "left")
      .where(!(col("__orow") <=> col("__trow")))
      .select(keys.map(col) :+ col("op_main") :+ col("op_branch"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ThreeWay(ours, theirs, bd.select(keys.map(col): _*), conflicts,
      conflicts.limit(1).count() > 0L, basisMain, basisBranch)
  }

  /** Atomic pointer flip (tmp write + rename, overwrite allowed) — branch
    * heads and the CURRENT cache. For branch heads the rename IS the
    * commit; for CURRENT the commit already happened at the version claim
    * and the flip only refreshes the cache. Entries the new pointer names
    * are referenced now, so their in-flight GC marks clear. */
  private def atomicWritePointer(
      dir: Path, pointer: Path, lines: Seq[String]): Unit = {
    val filesystem = fs(dir)
    val tmp = new Path(dir,
      s"${pointer.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = filesystem.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (filesystem.exists(pointer)) filesystem.delete(pointer, false)
    if (!filesystem.rename(tmp, pointer))
      throw new IllegalStateException(s"Failed to commit pointer $pointer")
    lines.filterNot(_.startsWith("#"))
      .foreach { e =>
        val p = new Path(dir, e)
        TableStore.unmarkPending(fs(p).makeQualified(p).toUri.getPath)
      }
  }

  private[table] def commitManifest(name: String, snaps: Seq[String]): Unit = {
    val committed = commitManifestCasOpt(name, _ => Some(snaps))
    assert(committed, s"unconditional commit of $name cannot abort")
  }

  private[table] def commitManifestCas(
      name: String, compute: Seq[String] => Seq[String]): Unit = {
    val committed = commitManifestCasOpt(name, cur => Some(compute(cur)))
    assert(committed, s"CAS commit of $name cannot abort")
  }

  /** Optimistic commit: `compute` maps the manifest AT COMMIT TIME to the
    * new manifest (None aborts — e.g. an idempotency tag already landed).
    * The COMMIT POINT is claiming `v-(max+1)` by no-overwrite rename of a
    * sealed tmp file (putIfAbsent); a writer that loses the claim re-runs
    * `compute` against the winner's manifest and tries the next slot, so
    * concurrent appenders all land. Post-claim work (CURRENT cache flip,
    * retention pruning, GC) is crash-tolerant: a death anywhere after the
    * claim leaves the committed state readable ([[readManifest]] prefers
    * the sealed head over a stale CURRENT). Returns true iff committed. */
  private[table] def commitManifestCasOpt(
      name: String, compute: Seq[String] => Option[Seq[String]]): Boolean = {
    val dir = tableDir(name)
    val filesystem = fs(dir)
    filesystem.mkdirs(dir)
    TableStore.commitLock(root, name).synchronized {
      var attempt = 0
      while (attempt < 64) {
        attempt += 1
        val (head, cur) = readHead(name)
        compute(cur) match {
          case None => return false
          case Some(snaps) =>
            // claim exactly head+1: a racer that committed since our read
            // holds this slot, so the rename fails and we re-derive
            val next = head + 1L
            // "vtmp-", not "v-…": versions() must never parse a claim tmp.
            // Written through FileContext, the same layer that renames it,
            // so no sidecar (e.g. local checksum) is ever stranded.
            val tmp = new Path(dir,
              s"vtmp-${java.util.UUID.randomUUID().toString.take(8)}")
            val out = fileContext(dir).create(
              filesystem.makeQualified(tmp),
              java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
                org.apache.hadoop.fs.CreateFlag.OVERWRITE))
            try out.write((snaps :+ SealLine).mkString("\n")
              .getBytes(StandardCharsets.UTF_8))
            finally out.close()
            if (claimRename(tmp, versionFile(name, next))) {
              finishCommit(name, snaps, next)
              return true
            } else filesystem.delete(tmp, false)
        }
      }
      throw new IllegalStateException(
        s"commit of $name lost the version race 64 times — aborting")
    }
  }

  /** putIfAbsent rename: must NOT overwrite an existing destination.
    * FileContext's rename without the OVERWRITE option fails on an
    * existing destination (atomic on HDFS; object stores map it to a
    * conditional put). Same-process claimants are additionally serialized
    * by the per-table commit lock. */
  private def fileContext(p: Path): org.apache.hadoop.fs.FileContext =
    org.apache.hadoop.fs.FileContext.getFileContext(
      fs(p).makeQualified(p).toUri, conf)

  private def claimRename(src: Path, dst: Path): Boolean = {
    val qualified = fs(dst).makeQualified(dst)
    try {
      fileContext(dst).rename(fs(src).makeQualified(src), qualified)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs(dst).exists(dst) => false
    }
  }

  /** Post-claim bookkeeping: CURRENT cache flip (tagged `#v:N`), version
    * retention pruning (never the head — takeRight includes it), then GC
    * of `snap-`/`dv-` dirs reachable from no pointer. GC spares dirs a
    * same-process writer has in flight (the pending registry) and dirs
    * younger than `gcGraceMs` (the cross-process guard); stale claim tmp
    * files reap on the same grace. */
  private def finishCommit(name: String, snaps: Seq[String], next: Long): Unit = {
    val dir = tableDir(name)
    val filesystem = fs(dir)
    // the CACHE flip is best-effort: the commit already sealed at the
    // version claim, and two processes' delete+rename flips can race —
    // the loser must not surface an error for an already-committed write
    // (readers prefer the higher of the tag and the sealed head anyway)
    try atomicWritePointer(dir, currentFile(name), s"#v:$next" +: snaps)
    catch { case _: IllegalStateException =>
      snaps.foreach(e => TableStore.unmarkPending(pendingKey(name, e)))
    }

    val known = versions(name)
    val retained = known.takeRight(retainVersions)
    known.filterNot(retained.contains)
      .foreach(v => filesystem.delete(versionFile(name, v), false))

    // GC must see every pointer that can reach an entry: the new head,
    // retained versions, AND all branch heads + their merge bases
    val branchRefs = filesystem.listStatus(dir)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("BRANCH-") ||
        p.getName.startsWith("BASE-"))
      .flatMap(readManifestFile)
    val live = snaps.toSet ++
      retained.flatMap(v => readManifestFile(versionFile(name, v))) ++
      branchRefs
    val now = System.currentTimeMillis()
    filesystem.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && (n.startsWith("snap-") || n.startsWith("dv-")) &&
          !live.contains(n) &&
          !TableStore.isPending(st.getPath.toUri.getPath) &&
          now - st.getModificationTime >= gcGraceMs)
        filesystem.delete(st.getPath, true)
      else if (!st.isDirectory && n.startsWith("vtmp-") &&
          now - st.getModificationTime >= math.max(gcGraceMs, 60000L))
        filesystem.delete(st.getPath, false)
    }
  }
}

object TableStore {
  /** Data dirs written but not yet referenced by any pointer — a
    * concurrent committer's GC must spare them or a commit racing an
    * in-flight snapshot write would reap the loser's data before its
    * retry lands. Keys are scheme-less absolute paths. Process-wide:
    * covers any number of stores/threads in one JVM; cross-process
    * writers rely on `gcGraceMs`. */
  private val pending =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[table] def markPending(p: String): Unit = { pending.add(p); () }
  private[table] def unmarkPending(p: String): Unit = { pending.remove(p); () }
  private[table] def isPending(p: String): Boolean = pending.contains(p)

  /** Per-(root, table) commit mutex — reentrant, so a compute closure
    * that itself commits (tests simulating racers) cannot deadlock. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[table] def commitLock(root: String, name: String): Object =
    locks.computeIfAbsent(root + "\u0000" + name, _ => new Object)

  /** Conflict handling for [[TableStore.mergeBranch]]/[[TableStore.rebaseBranch]]:
    * Fail refuses and commits nothing; OursWins keeps main's rows on
    * conflicted keys; TheirsWins keeps the branch's. Either resolving
    * policy still returns the conflict report for audit. */
  sealed trait MergePolicy
  object MergePolicy {
    case object Fail extends MergePolicy
    case object OursWins extends MergePolicy
    case object TheirsWins extends MergePolicy
  }
}
