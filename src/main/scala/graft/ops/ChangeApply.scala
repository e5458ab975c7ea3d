package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC log replay — compact a change log into the latest snapshot.
  *
  * The consume side of change-data-capture: [[SnapshotDiff]] *produces* a
  * delta between two table versions; this *applies* an ordered stream of
  * upserts and deletes (a Debezium-style feed, an event log, an ingest
  * journal) to reconstruct "the current row per key". The reference's
  * SCD1 MERGE (transf.py:215-273) is the 2-version special case; this is
  * the N-version generalization where the full history arrives as one
  * append-only log.
  *
  * Semantics: per key, the entry with the highest `(seqCols...)` wins; if
  * that entry's `opCol` equals `deleteOp` the key is absent from the
  * snapshot, otherwise its payload columns are emitted. `seqCols` must be
  * a total order within each key (e.g. `(ts, event_id)` with a unique id
  * as tiebreak) — ties would fall through to payload comparison, which is
  * still deterministic but semantically arbitrary.
  *
  * Scale shape: ONE hash aggregate — `max(struct(seq..., op, payload...))`
  * per key. The struct max is map-side combinable (partial aggregation),
  * so a key with a million updates sends ONE candidate row per map task
  * across the shuffle, not a million: this is why the operator is an
  * aggregate and NOT the textbook `row_number() OVER (PARTITION BY key
  * ORDER BY seq DESC) = 1` window, which shuffles the entire log and
  * funnels every hot key through a single reducer's sort. At 100 TB the
  * log scans once, and only (key, winner-struct) pairs move.
  */
object ChangeApply {

  /** Reconstruct the latest snapshot from `log`.
    *
    * @param log         append-only change log
    * @param keyCol      entity key
    * @param seqCols     ordering columns, most significant first; must be
    *                    unique per key (last = winner)
    * @param opCol       operation column; rows whose final value equals
    *                    `deleteOp` remove the key
    * @param payloadCols state columns to emit
    * @param deleteOp    `opCol` value marking a delete (default "D")
    * @return one row per live key: keyCol, seqCols, payloadCols
    */
  def latestSnapshot(
      log: DataFrame,
      keyCol: String,
      seqCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String],
      deleteOp: String = "D"): DataFrame =
    compactLog(log, keyCol, seqCols, opCol, payloadCols)
      .filter(col(opCol) =!= lit(deleteOp))
      .drop(opCol)

  /** [[latestSnapshot]] WITHOUT the delete filter: one winner row per
    * key, tombstones retained (`opCol` kept in the output). This is the
    * state an INCREMENTAL consumer must store: keeping the winning
    * delete (rather than forgetting the key) makes compaction a pure
    * max-semilattice — associative and commutative — so applying the
    * log in any batch split yields byte-identical state:
    * `compactLog(compactLog(A) ∪ B) = compactLog(A ∪ B)`. Dropping
    * tombstones instead would let a late update older than an applied
    * delete resurrect the key. [[graft.streaming.Streams.cdcIngest]]
    * builds on exactly this property; tombstones are garbage-collected
    * only once the feed guarantees nothing older can arrive (a
    * watermark/retention decision, not a compaction one).
    */
  def compactLog(
      log: DataFrame,
      keyCol: String,
      seqCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty, "compactLog needs at least one seq column")
    val ordered = seqCols ++ (opCol +: payloadCols)
    val winner = max(struct(ordered.map(col): _*)).as("__w")
    log
      .groupBy(col(keyCol))
      .agg(winner)
      .select(col(keyCol) +:
        (seqCols ++ (opCol +: payloadCols)).map(c => col(s"__w.$c").as(c)): _*)
  }

  /** DuckDB twin of [[latestSnapshot]] (reference semantics as the
    * textbook window form — same result because `seqCols` is unique per
    * key; the Spark side is the aggregate scale path).
    */
  def latestSnapshotSql(
      logSql: String,
      keyCol: String,
      seqCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String],
      deleteOp: String = "D"): String = {
    val ord = seqCols.map(c => s"$c DESC").mkString(", ")
    val outCols = (keyCol +: (seqCols ++ payloadCols)).mkString(", ")
    s"""SELECT $outCols FROM ($logSql)
       |QUALIFY row_number() OVER (PARTITION BY $keyCol ORDER BY $ord) = 1
       |  AND $opCol <> '$deleteOp'""".stripMargin
  }
}
