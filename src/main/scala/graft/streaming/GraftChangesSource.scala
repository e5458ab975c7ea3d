package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.lake.Versioned

/** `spark.readStream.format("graft-changes")` — a STREAMING SOURCE
  * over the versioned lake whose offsets are committed VERSION
  * NUMBERS, the missing read half of [[Streams.versionedIngest]]
  * (Delta's streaming-source shape: offsets are log versions, each
  * micro-batch plans the commit range's change feed). Until now a
  * downstream pipeline had to hand-roll the poll loop the q113
  * snapshot-diff demonstrates; with this, it is one `readStream`:
  *
  * {{{
  *   spark.readStream.format("graft-changes")
  *     .option("path", tableDir)
  *     .option("keyCols", "o_orderkey")
  *     .option("startingVersion", "0")      // or "latest"
  *     .load()                               // table cols + _change_type
  *                                           //            + _commit_version
  * }}}
  *
  * Scale shape: each micro-batch is planned by
  * [[Versioned.changesBetween]] over exactly the versions the batch
  * covers — O(delta) manifest reads and O(changed data) scan work per
  * batch, never O(table). Exactly-once on restart: offsets are
  * `(version, snapshotFileIdx)` pairs (Delta's (reservoirVersion,
  * index) shape) and `getBatch(start, end)` is deterministic replay.
  * The INITIAL SNAPSHOT of an explicit `startingVersion` pages
  * through `maxFilesPerTrigger` manifest-line slices (default 1000) —
  * at 100 TB the first batch must not be the whole table — and
  * `maxVersionsPerTrigger` bounds the incremental phase's version
  * span, so catch-up after downtime arrives in rate-limited chunks.
  * Retention interacts the usual way: the feed needs every manifest
  * in its window, so [[Versioned.pin]] the range if expiry runs
  * concurrently — an expired window fails loudly, never silently
  * skips commits.
  *
  * V1 `Source` deliberately (the shape Delta ships): `getBatch`
  * returns the change-feed DataFrame planned with the public batch
  * API — native vectorized parquet scans, file pruning, the works —
  * where a DSv2 `MicroBatchStream` would force hand-rolled partition
  * readers for no gain on this substrate.
  */
final class GraftChangesSource(
    sqlContext: SQLContext,
    parameters: Map[String, String],
    metadataPath: Option[String] = None) extends Source {

  private val spark = sqlContext.sparkSession
  private val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
  private val dir = opts.getOrElse("path", throw new IllegalArgumentException(
    "graft-changes needs option 'path' (the versioned table directory)"))
  private val keyCols: Seq[String] = opts.get("keycols")
    .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    .getOrElse(throw new IllegalArgumentException(
      "graft-changes needs option 'keyCols' (comma-separated row " +
        "identity for the change feed's update pairing)"))
  require(keyCols.nonEmpty, "graft-changes got an empty keyCols list")
  private val maxVersionsPerTrigger: Int =
    opts.get("maxversionspertrigger").map(_.toInt).getOrElse(Int.MaxValue)
  require(maxVersionsPerTrigger > 0,
    s"maxVersionsPerTrigger must be positive: $maxVersionsPerTrigger")

  private val headAtCreation: Int =
    Versioned.latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-changes: no committed version in $dir to stream from"))

  // resolved once at source creation: the feed speaks ONE schema for
  // the stream's lifetime (the streaming contract); commits that later
  // ADD columns render through alignment below, a replace that DROPS
  // a feed column null-fills it
  private val tableSchema: StructType =
    Versioned.read(spark, dir, Some(headAtCreation)).schema
  keyCols.foreach(k => require(tableSchema.fieldNames.contains(k),
    s"keyCols column '$k' is not a table column " +
      tableSchema.fieldNames.mkString("[", ", ", "]")))

  /** `"latest"` = only commits after source creation; an integer V =
    * version V's full content as the first batch's inserts, then the
    * change feed forward (Delta's `startingVersion` semantics). */
  private val startingVersion: Either[Int, Unit] =
    opts.getOrElse("startingversion", "0") match {
      case "latest" => Right(())
      case v => Left(v.toInt)
    }
  // the high-water mark "latest" anchors to (commits at or before it
  // never stream). The anchor is resolved ONCE — on first creation —
  // and persisted in the checkpoint's source-metadata slot, so a
  // restarted query keeps the original anchor instead of silently
  // re-anchoring past commits that landed while it was down.
  private val anchor: Int = startingVersion match {
    case Left(v) =>
      require(v >= 0 && v <= headAtCreation,
        s"startingVersion $v is not a committed version of $dir " +
          s"(head is $headAtCreation)")
      v
    case Right(()) =>
      val computed = headAtCreation
      metadataPath.fold(computed) { mp =>
        val p = new org.apache.hadoop.fs.Path(mp, "graft-changes-anchor")
        val fs = p.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) {
          try {
            val out = fs.create(p, false)
            try out.write(computed.toString.getBytes("UTF-8"))
            finally out.close()
          } catch { case _: java.io.IOException => () } // lost create race
        }
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim.toInt
        finally in.close()
      }
  }

  override val schema: StructType = StructType(
    tableSchema.fields.toSeq :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", IntegerType, nullable = false))

  // the initial-snapshot extent (explicit startingVersion only): the
  // anchor version's data-file count, paged through in
  // maxFilesPerTrigger slices — at 100 TB the first batch must NOT be
  // the whole table (Delta's (reservoirVersion, index) offsets; same
  // shape here). `latest` mode has no snapshot phase.
  private val snapTotal: Long =
    if (startingVersion.isLeft)
      Versioned.manifestLineCount(spark, dir, anchor).toLong
    else 0L
  private val maxFilesPerTrigger: Int =
    opts.get("maxfilespertrigger").map(_.toInt).getOrElse(1000)
  require(maxFilesPerTrigger > 0,
    s"maxFilesPerTrigger must be positive: $maxFilesPerTrigger")

  // rate limiting: getOffset advances at most maxVersionsPerTrigger /
  // maxFilesPerTrigger past what the last getBatch consumed (restart
  // replays refresh it via the engine's recovery getBatch call)
  @volatile private var lastSeen: (Long, Long) =
    (anchor.toLong, if (startingVersion.isRight) snapTotal else 0L)

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    Versioned.latestVersion(spark, dir).flatMap { head =>
      val (lv, li) = lastSeen
      if (li < snapTotal)
        // snapshot phase: advance through the anchor's files only
        Some(GraftChangesOffset(anchor.toLong,
          math.min(li + maxFilesPerTrigger, snapTotal)))
      else {
        val capped = math.min(head.toLong,
          math.max(lv, anchor.toLong) + maxVersionsPerTrigger)
        // "latest" mode with no new commits yet: nothing to stream
        if (capped <= anchor && startingVersion.isRight) None
        else Some(GraftChangesOffset(
          math.max(capped, anchor.toLong), snapTotal))
      }
    }

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val (endV, endIdx) = parseOffset(end)
    lastSeen = {
      val (lv, li) = lastSeen
      (math.max(lv, endV), math.max(li, endIdx))
    }
    val (fromV, fromIdx) =
      start.map(parseOffset).getOrElse((anchor.toLong, 0L))
    val tableCols = tableSchema.fields.map(_.name).toSeq
    // snapshot slice: anchor-version files [fromIdx, endIdx) as
    // inserts (explicit startingVersion's paged initial content)
    val snapshot: Option[DataFrame] =
      if (endIdx > fromIdx && startingVersion.isLeft)
        Some(Versioned.readSlice(spark, dir, anchor,
          fromIdx.toInt, endIdx.toInt).select(
          tableCols.map(col) :+
            lit("insert").as("_change_type") :+
            lit(anchor).as("_commit_version"): _*))
      else None
    // incremental feed over (fromV, endV]
    val changes: Option[DataFrame] =
      if (endV > fromV)
        Some(align(Versioned.changesBetween(spark, dir,
          fromV.toInt, endV.toInt, keyCols), tableCols))
      else None
    val batch = (snapshot, changes) match {
      case (Some(s), Some(c)) => s.unionByName(c)
      case (Some(s), None) => s
      case (None, Some(c)) => c
      case (None, None) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    org.apache.spark.sql.graft.GraftStreamingShim.asStreamingFrame(batch)
  }

  /** Render a feed window under the SOURCE's fixed schema: a column a
    * later commit added is dropped from this stream (it was not in
    * the contract), a column a replace dropped null-fills. */
  private def align(feed: DataFrame, tableCols: Seq[String]): DataFrame = {
    val present = feed.columns.toSet
    feed.select(tableCols.map { c =>
      if (present.contains(c)) col(c)
      else lit(null).cast(tableSchema(c).dataType).as(c)
    } :+ col("_change_type") :+ col("_commit_version"): _*)
  }

  /** `(version, snapshotFilesConsumed)` from any offset the engine
    * hands back: ours, its serialized twin, or a bare long from a
    * pre-chunking checkpoint (treated as snapshot-complete). */
  private def parseOffset(
      o: org.apache.spark.sql.execution.streaming.Offset): (Long, Long) =
    o match {
      case g: GraftChangesOffset => (g.version, g.idx)
      case l: LongOffset => (l.offset, snapTotal)
      case other => GraftChangesOffset.parse(other.json, snapTotal)
    }

  override def commit(
      end: org.apache.spark.sql.execution.streaming.Offset): Unit = ()

  override def stop(): Unit = ()
}

/** The source's composite offset: `version` = last table version
  * consumed, `idx` = anchor-snapshot files consumed (Delta's
  * (reservoirVersion, index) shape). JSON so checkpoints replay it
  * across restarts. */
final case class GraftChangesOffset(version: Long, idx: Long)
  extends org.apache.spark.sql.execution.streaming.Offset {
  override def json: String = s"""{"v":$version,"idx":$idx}"""
}

object GraftChangesOffset {
  /** Parse the json form; a bare long (a pre-chunking checkpoint)
    * reads as that version with the snapshot complete. */
  def parse(json: String, snapTotal: Long): (Long, Long) = {
    val t = json.trim
    if (t.startsWith("{")) {
      val m = """"v"\s*:\s*(-?\d+).*"idx"\s*:\s*(-?\d+)""".r
        .findFirstMatchIn(t).getOrElse(throw new IllegalArgumentException(
          s"unreadable graft-changes offset: $json"))
      (m.group(1).toLong, m.group(2).toLong)
    } else (t.toLong, snapTotal)
  }
}

/** `DataSourceRegister` so `.format("graft-changes")` resolves by
  * short name (META-INF/services registration). */
final class GraftChangesSourceProvider
  extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-changes derives its schema from the table; a user schema " +
        "is not accepted")
    (shortName(), new GraftChangesSource(sqlContext, parameters).schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftChangesSource(sqlContext, parameters, Some(metadataPath))
}
