package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.execution.streaming.runtime.StreamExecution

import graft.lake.Versioned

/** `df.writeStream.format("graft")` — the first-class STREAMING SINK
  * over the versioned lake, the write half of [[GraftChangesSource]].
  * Until now exactly-once streaming ingest required the
  * [[Streams.versionedIngest]] `foreachBatch` helper; with this it is
  * the standard Structured Streaming wiring:
  *
  * {{{
  *   df.writeStream.format("graft")
  *     .option("path", tableDir)          // or .toTable("graft.db.t")
  *     .option("checkpointLocation", cp)
  *     .start()
  * }}}
  *
  * Exactly-once: every micro-batch routes through
  * [[Versioned.idempotentCommit]], stamped `(appId, batchId)` in the
  * manifest it publishes (Delta's `txn` action on this substrate).
  * `appId` defaults to the STREAMING QUERY ID — the engine persists it
  * in the checkpoint's metadata and republishes it on every restart
  * (`sql.streaming.queryId` local property, the same identity
  * `DeltaSink` keys its transactions on) — so a crash anywhere
  * between staging and the offset-log commit resolves to exactly one
  * append on replay: Spark re-runs the failed batch with the SAME
  * batchId, a staged-but-unpublished attempt is invisible (expire's
  * orphan grace sweeps it), and a published-but-unacknowledged one is
  * recognized by its stamp and skipped. `txnAppId` overrides the
  * identity for writers that re-checkpoint but must keep their
  * idempotence key.
  *
  * Output modes: APPEND commits each batch as a new version
  * (`changesBetween` over the ingest history replays the stream as a
  * CDC feed); COMPLETE publishes the trigger's whole result as a
  * stamped REPLACE — the streaming-aggregate shape, every trigger a
  * time-travelable version of the rollup; UPDATE with
  * `.option("keyCols", "k1,k2")` routes each batch through
  * [[Versioned.idempotentMerge]] — the keyed streaming-UPSERT shape:
  * an Update-mode aggregation emits only the keys each trigger
  * changed, and each emitted row overwrites its key's previous state
  * (a CDC-consuming rollup materialized as a lake table, every
  * trigger a time-travelable version). Update WITHOUT keyCols is
  * refused loudly at query start — partial rows have no keyless
  * upsert semantics on this substrate.
  *
  * Update-mode CDC (round 18): `.option("opColumn", "_op")` +
  * `.option("seqColumn", "seq")` turns each batch row into an
  * upsert-or-DELETE of its key via
  * [[Versioned.idempotentMergeCdc]] — cdcIngest's max-semilattice
  * as one key-pruned merge per trigger: within-batch rows
  * pre-compact by `seqColumn` (multi-row keys are legal), a matched
  * key updates only when the incoming `(seq, op, payload)` struct
  * wins, and tombstones are retained by default so a late update
  * older than an applied delete cannot resurrect the key (read the
  * live view with `op <> deleteOp`; `deleteOp` defaults to "D").
  * `.option("tombstones", "drop")` is the live-table shape instead:
  * a winning delete removes the row — correct when the feed's seq is
  * per-key monotone across batches. `seqColumn` WITHOUT `opColumn`
  * declares within-batch last-writer-wins for plain upserts (the
  * multi-row-per-key `flatMapGroupsWithState` writer shape); without
  * it such a batch refuses loudly, naming this contract.
  *
  * Scale shape: the commit stages the batch's rows as parquet via one
  * distributed write action (no driver materialization), measures
  * stats/blooms per the TABLE's declared policy, and publishes one
  * O(changed files) delta manifest through the CAS loop — concurrent
  * batch writers and other streams interleave safely. The Update
  * merge rewrites O(files holding a matched key), not the table —
  * stats/bloom pruning applies to the upsert path exactly as to
  * batch MERGE INTO.
  */
final class GraftSink(sqlContext: SQLContext,
    parameters: Map[String, String], complete: Boolean = false,
    upsertKeys: Seq[String] = Nil)
  extends Sink {

  private val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
  private val dir = opts.getOrElse("path",
    throw new IllegalArgumentException(
      "graft sink needs option 'path' (the versioned table directory)" +
        " — writeStream.format(\"graft\").option(\"path\", dir) or" +
        " .toTable(\"graft.db.t\")"))
  private val appIdOverride = opts.get("txnappid")
  // CDC options (Update mode only — validated at createSink): an op
  // column turns each batch row into an upsert-or-delete of its key
  // under [[Versioned.idempotentMergeCdc]]'s max-semilattice; a seq
  // column alone declares within-batch last-writer-wins for plain
  // upserts (multi-row-per-key Update batches — the
  // flatMapGroupsWithState writer shape)
  private val opCol = opts.get("opcolumn")
  private val seqCol = opts.get("seqcolumn")
  private val deleteOp = opts.getOrElse("deleteop", "D")
  private val retainTombstones =
    !opts.get("tombstones").exists(_.equalsIgnoreCase("drop"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    // the stable exactly-once identity: the STREAMING QUERY ID, which
    // MicroBatchExecution publishes as a local property on the stream
    // execution thread that calls addBatch, and persists in the
    // checkpoint. A Spark-internal contract — so when it is absent
    // (a foreign thread, a future engine refactor) the sink fails
    // LOUDLY here rather than minting a fresh identity that would
    // silently forfeit replay protection; `txnAppId` is the escape
    // hatch that restores it.
    val appId = appIdOverride.orElse(
      Option(spark.sparkContext.getLocalProperty(
        StreamExecution.QUERY_ID_KEY)))
      .getOrElse(throw new IllegalStateException(
        "graft sink could not resolve an idempotence key: no " +
          "streaming query id on this thread and no txnAppId option"))
    // the incoming frame is bound to the engine's incremental
    // execution — re-wrap its physical result as a batch frame the
    // lake's write action can plan (the DeltaSink hop)
    val batch = org.apache.spark.sql.graft.GraftStreamingShim
      .asBatchFrame(data)
    // Update mode: each batch row upserts (or, with an op column,
    // deletes) its key. Complete mode: the batch is the WHOLE result
    // table — a stamped replace (every trigger a time-travelable
    // version of the aggregate). Append mode appends as usual.
    if (upsertKeys.nonEmpty) opCol match {
      case Some(oc) =>
        Seq(oc -> "opColumn", seqCol.get -> "seqColumn").foreach {
          case (c, o) => require(batch.columns.contains(c),
            s"graft sink $o names '$c', which is not in the stream's " +
              s"columns ${batch.columns.mkString("[", ", ", "]")}")
        }
        Versioned.idempotentMergeCdc(spark, dir, batch, upsertKeys,
          seqCol.get, oc, deleteOp, appId, batchId,
          retainTombstones = retainTombstones)
      case None =>
        val pre = seqCol match {
          case None => batch
          case Some(sc) =>
            // within-batch last-writer-wins by the declared ordering:
            // one winner row per key crosses into the merge (the
            // multi-row-per-key Update contract)
            require(batch.columns.contains(sc),
              s"graft sink seqColumn names '$sc', which is not in the " +
                s"stream's columns ${batch.columns.mkString("[", ", ", "]")}")
            val rest = batch.columns.toSeq.filterNot(c =>
              upsertKeys.contains(c) || c == sc)
            Versioned.compactByKey(batch, upsertKeys, sc +: rest)
        }
        try Versioned.idempotentMerge(spark, dir, pre, upsertKeys,
          appId, batchId)
        catch {
          case e: IllegalArgumentException
              if seqCol.isEmpty && Option(e.getMessage)
                .exists(_.contains("duplicate keys")) =>
            // the flatMapGroupsWithState shape fails PREDICTABLY:
            // name the contract and the knob that opts into it
            throw new IllegalArgumentException(e.getMessage +
              " — an Update-mode batch with several rows per key " +
              "needs an explicit ordering: declare " +
              ".option(\"seqColumn\", <col>) for last-writer-wins " +
              "within the batch, or aggregate upstream so each " +
              "trigger emits one row per key", e)
        }
    }
    else
      Versioned.idempotentCommit(spark, dir, batch, appId, batchId,
        replace = complete)
    ()
  }

  override def toString: String =
    s"GraftSink[$dir${
      if (complete) ", complete"
      else if (upsertKeys.nonEmpty) upsertKeys.mkString(", update on (", ", ", ")")
      else ""}]"
}
