package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned lake table — manifest-based snapshot isolation and time
  * travel over plain parquet files (the core mechanism of a table
  * format, sized to this engine's single-writer lake).
  *
  * Why: a plain parquet directory conflates "the files on disk" with
  * "the table". Readers racing a writer see half-written commits;
  * yesterday's table is gone after today's overwrite; a compaction
  * ([[DataLake.compact]]) that rewrites layout in place can lose data
  * on a mid-write crash. A MANIFEST fixes all three: each version `k`
  * is an immutable list of data files (`_manifest/v%05d.txt`), data
  * files are never mutated or deleted by commits, and a commit is one
  * atomic manifest rename — readers of any version never observe a
  * partial state.
  *
  * Capabilities: [[commit]] (append or replace — replace is how an
  * SCD rewrite, a compaction, or a GDPR purge publishes), [[read]] of
  * the latest or any historical version (time travel — "train on the
  * corpus exactly as it was when the run started"), [[latestVersion]].
  *
  * Scale notes: the manifest lists files, so reads cost O(files in
  * version) to plan with NO directory listing race; at 100 TB the same
  * design holds (production would use Iceberg/Delta, whose manifests
  * add column stats for file skipping — [[graft.ops.ScaleOps.zValue]]
  * clustering makes those stats selective). Single writer by design:
  * two concurrent committers could both read version k and race the
  * k+1 rename; a real deployment serializes commits (the rename's
  * failure on the loser is the conflict signal). Old versions
  * accumulate until a retention job deletes manifests AND their
  * now-unreferenced files — never data files alone.
  */
object Versioned {

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Int): Path =
    new Path(dir, f"_manifest/v$v%05d.txt")

  /** Highest committed version, or None for an empty/absent table. */
  def latestVersion(spark: SparkSession, dir: String): Option[Int] = {
    val fs = fileSystem(spark, dir)
    val mdir = new Path(dir, "_manifest")
    if (!fs.exists(mdir)) None
    else {
      val vs = fs.listStatus(mdir).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".txt"))
        .map(n => n.stripPrefix("v").stripSuffix(".txt").toInt)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readManifest(fs: FileSystem, dir: String, v: Int): Seq[String] = {
    val in = fs.open(manifestPath(dir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Commit `df` as the next version. `replace = false` appends to the
    * previous version's file set; `replace = true` publishes `df` as
    * the entire new table state (existing data files stay on disk —
    * still reachable through older manifests). Returns the new version.
    */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
      replace: Boolean = false): Int =
    commitImpl(spark, dir, df, replace, statCol = None)

  /** [[commit]] plus per-file min/max stats of `statCol` (an integral
    * column) recorded in the manifest — the file-skipping index
    * [[readPruned]] consumes (the mechanism Iceberg/Delta manifests
    * scale up; pair with a [[graft.ops.ScaleOps.zValue]]-clustered
    * write so file ranges are tight and stats selective). Files with
    * NO min/max (zero rows, or `statCol` all-NULL — rows a BETWEEN
    * read can never select) are recorded with an inverted sentinel
    * range and ALWAYS pruned.
    */
  def commitWithStats(spark: SparkSession, dir: String, df: DataFrame,
      statCol: String, replace: Boolean = false): Int =
    commitImpl(spark, dir, df, replace, statCol = Some(statCol))

  private def commitImpl(spark: SparkSession, dir: String, df: DataFrame,
      replace: Boolean, statCol: Option[String]): Int = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val fs = fileSystem(spark, dir)
    val prev = latestVersion(spark, dir)
    val next = prev.map(_ + 1).getOrElse(0)
    // data files are commit-scoped and immutable once the manifest lands
    val dataDir = new Path(dir, f"data/c$next%05d-${java.util.UUID.randomUUID()}")
    df.write.parquet(dataDir.toString)
    // per-file stats: ONE column-pruned scan of the just-written files,
    // grouped by their physical file (footer-only at production scale)
    val stats: Map[String, (Long, Long)] = statCol match {
      case None => Map.empty
      case Some(c) =>
        spark.read.parquet(dataDir.toString)
          .groupBy(input_file_name().as("__f"))
          .agg(min(col(c).cast("long")).as("__mn"),
            max(col(c).cast("long")).as("__mx"))
          .collect()
          .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
          .map(r => new Path(r.getString(0)).getName ->
            (r.getLong(1), r.getLong(2)))
          .toMap
    }
    val newFiles = fs.listStatus(dataDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val rel = s"data/${dataDir.getName}/${f.getPath.getName}"
        (stats.get(f.getPath.getName), statCol) match {
          case (Some((mn, mx)), Some(c)) => s"$rel\t$c\t$mn\t$mx"
          // a stats-tracked file with NO min/max has no matchable rows
          // (zero rows, or all-null stat column — which a BETWEEN can
          // never select): record the inverted sentinel range so every
          // pruned read skips it. Without this an empty commit (an
          // empty-partition pipeline run — fuzz gate) planned as an
          // unprunable file and broke the skipping guarantee.
          case (None, Some(c)) =>
            s"$rel\t$c\t${Long.MaxValue}\t${Long.MinValue}"
          case _ => rel
        }
      }
      .sorted.toSeq
    val carried =
      if (replace) Nil
      else prev.map(readManifest(fs, dir, _)).getOrElse(Nil)
    val lines = (carried ++ newFiles).mkString("", "\n", "\n")
    // write-then-rename: the manifest appears atomically or not at all
    val tmp = new Path(dir, f"_manifest/.v$next%05d.tmp")
    fs.mkdirs(new Path(dir, "_manifest"))
    val out = fs.create(tmp, false)
    try out.write(lines.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(fs.rename(tmp, manifestPath(dir, next)),
      s"concurrent commit detected publishing version $next of $dir")
    next
  }

  /** Manifest line → (relative path, optional (col, min, max) stats). */
  private def parseLine(line: String): (String, Option[(String, Long, Long)]) =
    line.split('\t') match {
      case Array(rel, c, mn, mx) => (rel, Some((c, mn.toLong, mx.toLong)))
      case parts => (parts(0), None)
    }

  /** Retention: keep the newest `keepLast` versions, drop older
    * manifests, then delete data files no surviving manifest references
    * — in that order, so a crash mid-expire leaves dangling FILES
    * (harmless, re-collectable) never dangling MANIFESTS (a readable
    * version with missing data). Returns (versions dropped, data files
    * deleted).
    */
  def expire(spark: SparkSession, dir: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val fs = fileSystem(spark, dir)
    latestVersion(spark, dir) match {
      case None => (0, 0)
      case Some(latest) =>
        val cut = latest - keepLast + 1
        val dropped = (0 until cut).filter(v =>
          fs.exists(manifestPath(dir, v)))
        val live: Set[String] = (cut to latest)
          .filter(v => fs.exists(manifestPath(dir, v)))
          .flatMap(v => readManifest(fs, dir, v)).map(parseLine(_)._1).toSet
        dropped.foreach(v => fs.delete(manifestPath(dir, v), false))
        val dataRoot = new Path(dir, "data")
        var deleted = 0
        if (fs.exists(dataRoot)) {
          fs.listStatus(dataRoot).filter(_.isDirectory).foreach { cdir =>
            fs.listStatus(cdir.getPath).filter(f => f.isFile &&
                f.getPath.getName.endsWith(".parquet")).foreach { f =>
              val rel = s"data/${cdir.getPath.getName}/${f.getPath.getName}"
              if (!live.contains(rel)) {
                fs.delete(f.getPath, false); deleted += 1
              }
            }
            // commit dir fully collected -> remove the (now fileless) dir
            if (fs.listStatus(cdir.getPath)
                .forall(s => !s.getPath.getName.endsWith(".parquet")))
              fs.delete(cdir.getPath, true)
          }
        }
        (dropped.size, deleted)
    }
  }

  /** Right-to-be-forgotten purge: publish a new version without the
    * rows matching `predicate`, then [[expire]] history down to
    * `keepVersions` so purged bytes actually leave disk (time travel
    * would otherwise keep serving them — a purge that forgets to
    * expire is a compliance bug, which is why this couples the two).
    * With `keepVersions = 1` the purged data is physically gone when
    * this returns; larger values trade a grace window for compliance
    * latency. Returns (new version, data files physically deleted).
    *
    * Scale shape: the rewrite is one filtered scan; at 100 TB the
    * refinement is file-level pruning — rewrite only files whose
    * min/max stats admit matching rows, carry the rest by reference
    * into the new manifest (the same manifest mechanics; the write
    * path then touches O(affected files)).
    */
  def purge(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column,
      keepVersions: Int = 1): (Int, Int) = {
    // null-safe: a predicate that evaluates to NULL (e.g. `col ===
    // "x"` on a null field) must KEEP the row — `filter(!predicate)`
    // alone would silently drop it (three-valued logic), deleting data
    // the caller never asked to purge
    val kept = read(spark, dir)
      .filter(!org.apache.spark.sql.functions.coalesce(predicate,
        org.apache.spark.sql.functions.lit(false)))
    val v = commit(spark, dir, kept, replace = true)
    val (_, deleted) = expire(spark, dir, keepVersions)
    (v, deleted)
  }

  /** Read a specific version (time travel), or the latest when
    * `version` is None. Immutable: committing later versions never
    * changes what this returns.
    */
  def read(spark: SparkSession, dir: String,
      version: Option[Int] = None): DataFrame = {
    val fs = fileSystem(spark, dir)
    val v = version.orElse(latestVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $dir"))
    require(fs.exists(manifestPath(dir, v)), s"version $v not found in $dir")
    val files = readManifest(fs, dir, v)
      .map(line => s"$dir/${parseLine(line)._1}")
    require(files.nonEmpty,
      s"version $v of $dir is empty (replaced with an empty frame); " +
        "parquet cannot infer a schema from zero files")
    spark.read.parquet(files: _*)
  }

  /** Stats-pruned read: plan only the files whose recorded
    * `[min, max]` of `statCol` intersects `[lo, hi]`, then apply the
    * row-level BETWEEN filter on what remains (pruning is an
    * optimization; the filter is still the semantics — a file without
    * stats, or stats on a different column, is always read). THE scale
    * lever of every table format: a selective predicate over a
    * well-clustered table plans O(matching files), not O(table).
    */
  def readPruned(spark: SparkSession, dir: String, statCol: String,
      lo: Long, hi: Long, version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(hi >= lo, s"need hi >= lo: [$lo, $hi]")
    val fs = fileSystem(spark, dir)
    val v = version.orElse(latestVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $dir"))
    require(fs.exists(manifestPath(dir, v)), s"version $v not found in $dir")
    val all = readManifest(fs, dir, v).map(parseLine)
    require(all.nonEmpty, s"version $v of $dir is empty")
    val kept = all.collect {
      case (rel, Some((c, mn, mx))) if c == statCol && (mx < lo || mn > hi) =>
        None // provably disjoint — skip
      case (rel, _) => Some(s"$dir/$rel")
    }.flatten
    val pred = col(statCol).between(lo, hi)
    if (kept.isEmpty)
      // every file pruned: one file supplies the schema, the always-
      // false residual filter supplies the (empty) rows
      spark.read.parquet(s"$dir/${all.head._1}").filter(lit(false) && pred)
    else spark.read.parquet(kept: _*).filter(pred)
  }
}
