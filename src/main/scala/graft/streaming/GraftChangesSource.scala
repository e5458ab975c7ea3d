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
  * batch, never O(table). Exactly-once on restart: the committed
  * offset in the checkpoint names the last version consumed, and
  * `getBatch(start, end)` over versions `(start, end]` is
  * deterministic replay — the same commits produce the same rows.
  * `maxVersionsPerTrigger` bounds a batch's version span (catch-up
  * after downtime arrives in rate-limited chunks instead of one giant
  * batch). Retention interacts the usual way: the feed needs every
  * manifest in its window, so [[Versioned.pin]] the range if expiry
  * runs concurrently — an expired window fails loudly, never silently
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

  // rate limiting: getOffset advances at most maxVersionsPerTrigger
  // past what the last getBatch consumed (restart replays refresh it)
  @volatile private var lastSeen: Long = anchor.toLong

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    Versioned.latestVersion(spark, dir).flatMap { head =>
      val capped = math.min(head.toLong,
        lastSeen + maxVersionsPerTrigger)
      // "latest" mode with no new commits yet: nothing to stream
      if (capped <= anchor && startingVersion.isRight) None
      else Some(LongOffset(math.max(capped, anchor.toLong)))
    }

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val endV = versionOf(end)
    lastSeen = math.max(lastSeen, endV)
    val fromV: Long = start.map(versionOf).getOrElse(anchor.toLong)
    val tableCols = tableSchema.fields.map(_.name).toSeq
    // the initial batch of an explicit startingVersion carries that
    // version's full content as inserts (the snapshot half); every
    // batch after — and the whole stream in "latest" mode — is the
    // incremental feed over (fromV, endV]
    val snapshot: Option[DataFrame] =
      if (start.isEmpty && startingVersion.isLeft)
        Some(Versioned.read(spark, dir, Some(anchor)).select(
          tableCols.map(col) :+
            lit("insert").as("_change_type") :+
            lit(anchor).as("_commit_version"): _*))
      else None
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

  private def versionOf(
      o: org.apache.spark.sql.execution.streaming.Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset on restart
  }

  override def commit(
      end: org.apache.spark.sql.execution.streaming.Offset): Unit = ()

  override def stop(): Unit = ()
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
