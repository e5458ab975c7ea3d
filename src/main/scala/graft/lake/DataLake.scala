package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet data-lake IO — Spark-native re-expression of the reference's
  * `DataLake` class (reference main.py:27-150).
  *
  * Layout (reference main.py:27-41):
  *  - a fact table ("regmeteor") hive-partitioned on a derived date string
  *    column (main.py:93-98; partition value derived at ingest main.py:213),
  *  - an unpartitioned dimension table ("localid", main.py:136-147).
  *
  * Scale notes (100 TB design):
  *  - Partition discovery, pruning and footer-level min/max stats come free
  *    from the Spark parquet source; readers never list files manually.
  *  - The reference re-reads the WHOLE lake before every append to dedup
  *    (main.py:101, main.py:127) — O(lake) per record. Here dedup probes are
  *    partition-pruned ([[appendIncremental]]) or anti-joins on the key
  *    column only ([[appendFull]]), so the probe reads one partition /
  *    one column, not the lake.
  */
object DataLake {

  /** S1/S2/S3 (main.py:46-78): read a parquet path (partitioned dir or
    * single file); `None` when the path is missing or holds no rows —
    * mirroring the reference's missing/empty guard that returns `None`
    * with a console message (main.py:66-78).
    */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(path)
      if (df.isEmpty) None else Some(df)
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }

  /** Schema-evolution read. The reference aligns schemas only at INGEST
    * ("the API deletes empty fields", main.py:241-263); a long-lived lake
    * also needs the READ side: partitions written under older schemas
    * must surface with nulls for columns they predate. `mergeSchema`
    * unions parquet footers by name across all discovered files.
    *
    * Scale note: merging reads every file's footer at planning time —
    * fine for a dimension or a bounded partition range, expensive over
    * millions of fact files; production fact tables pin a declared
    * schema (`spark.read.schema(s)`) and evolve via the catalog instead.
    */
  def readMerged(spark: SparkSession, path: String): Option[DataFrame] =
    try {
      // Some even when the lake holds zero ROWS: the merged schema is
      // still derivable from the footers, and an empty-but-present lake
      // is a lake (an all-empty-partition run must flow through, not
      // None.get — fuzz gate's empty-corpus sweep). Unlike [[read]],
      // whose None-on-empty drives the first-write branch of the
      // dedup-probe contract, None here means only "nothing readable".
      Some(spark.read.option("mergeSchema", "true").parquet(path))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }

  /** S4 + A1/ST4 (main.py:80-114): partitioned append of an incremental
    * batch with duplicate-poll suppression.
    *
    * The reference detects a replayed poll by comparing the newest incoming
    * `time` with the newest stored `time` (main.py:101-107) — read via a
    * full-lake rescan. At scale the probe here prunes to exactly the
    * partitions the incoming batch would land in (partition filter on
    * `partitionCol`, pushed to the scan), then takes `max(time)` — parquet
    * row-group stats make that near-free.
    *
    * Returns true when the batch was written, false when suppressed as a
    * duplicate (reference prints a warning instead, main.py:106-107).
    */
  def appendIncremental(
      spark: SparkSession,
      incoming: DataFrame,
      dir: String,
      partitionCol: String = "fecha_partic",
      timeCol: String = "time"): Boolean =
    read(spark, dir) match {
      case None =>
        incoming.write.partitionBy(partitionCol).mode("append").parquet(dir)
        true
      case Some(prev) =>
        // One poll batch is tiny (reference: a single record, main.py:201-217);
        // collecting its distinct partition values is a driver-side O(batch) op.
        val parts = incoming.select(partitionCol).distinct()
          .collect().map(_.get(0)).filter(_ != null).map(_.toString)
        val newestStored = prev
          .filter(col(partitionCol).isin(parts.toSeq: _*)) // partition-pruned
          .agg(max(col(timeCol))).head().get(0)
        val newestIncoming = incoming.agg(max(col(timeCol))).head().get(0)
        val duplicate = newestStored != null && newestStored == newestIncoming
        if (!duplicate)
          incoming.write.partitionBy(partitionCol).mode("append").parquet(dir)
        !duplicate
    }

  /** S5 + J2 (main.py:116-150): unpartitioned append of a dimension batch
    * with the reference's ALL-OR-NOTHING id gate: if any incoming `id`
    * already exists, the whole batch is skipped (main.py:129-150). The
    * reference materializes both id lists in memory (main.py:132-133); here
    * it is a left-semi probe on the key column only.
    *
    * Returns true when written, false when the whole batch was skipped.
    */
  def appendFull(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      key: String = "id"): Boolean =
    read(spark, path) match {
      case None =>
        incoming.write.mode("append").parquet(path)
        true
      case Some(prev) =>
        val anyDup = !incoming
          .join(prev.select(key), Seq(key), "left_semi").isEmpty
        if (!anyDup) incoming.write.mode("append").parquet(path)
        !anyDup
    }

  /** Improved per-row variant (SURVEY.md §7 flagged improvement): append
    * only the ids not yet present — a left-anti join instead of the
    * all-or-nothing gate. Returns the number of rows appended.
    */
  def appendFullNewOnly(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      key: String = "id"): Long =
    read(spark, path) match {
      case None =>
        incoming.write.mode("append").parquet(path)
        incoming.count()
      case Some(prev) =>
        // persist: count + write must probe the existing lake once, not twice
        val fresh = incoming.join(prev.select(key), Seq(key), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = fresh.count()
          if (n > 0) fresh.write.mode("append").parquet(path)
          n
        } finally { fresh.unpersist(); () }
    }

  /** Small-file compaction — the maintenance pass every continuously-
    * ingested lake needs: micro-batch appends ([[appendIncremental]],
    * streaming `foreachBatch`) each land a few small files, and a year
    * of polls turns a partition into 10⁵ kilobyte files whose open/seek
    * overhead dominates scans (and whose footers bloat planning). This
    * rewrites one table / one hive partition dir — the unit a real
    * maintenance job iterates, newest-first — into `⌈bytes/target⌉`
    * files of ~`targetBytes` each.
    *
    * Returns (files before, files after). Content is byte-preserved
    * (gate-checked by q104); only layout changes. `repartition(n)` is a
    * round-robin exchange — even output sizes regardless of input skew.
    * The write lands in `outPath` (swap-on-success belongs to the
    * caller's transactional layer; overwriting in place would lose the
    * lake on a mid-write crash).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    def dataFiles(dir: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(f => f.isFile &&
        f.getPath.getName.endsWith(".parquet"))
    }
    val in = dataFiles(inPath)
    val bytes = in.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (in.length, dataFiles(outPath).length)
  }
}
