package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff (change-data-capture between two versions of a table):
  * classify every key as `added` / `removed` / `changed` by comparing a
  * new snapshot against an old one on a key. The primitive an
  * incremental pipeline is built on — "what actually changed since the
  * last run?" feeds SCD upserts (`graft.warehouse.Merge`), incremental
  * dedup ([[graft.ext.Dedup.incrementalNearDuplicates]]'s admission
  * bookkeeping), and cache/index invalidation ("re-embed only changed
  * docs"), replacing full-table reprocessing with work proportional to
  * the delta.
  *
  * Semantics: one output row per key present in either snapshot whose
  * state differs — `added` (new only), `removed` (old only), `changed`
  * (both, any non-key column differs; null-safe, so null→value and
  * value→null both count). Unchanged keys are dropped: the output is
  * delta-sized, not table-sized.
  *
  * Scale shape: one full-outer sort-merge join keyed on `keys` — each
  * side shuffles once on the join key, non-key columns ride along ONLY
  * as a packed comparison struct. If both snapshots are stored bucketed
  * on the key ([[ScaleOps.writeBucketed]] — the natural layout for a
  * table diffed every run), the exchanges vanish entirely and the diff
  * is a zipper scan. For very wide rows, pre-reduce each side to
  * `(keys, fingerprint)` with a persisted row-hash column so only
  * key+8 bytes cross the wire; the struct comparison here is the exact
  * semantics any such fingerprint fast path must preserve.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `keys`. Both inputs must share the
    * schema; key columns must be non-null (a null key never equi-joins,
    * so a null-keyed row would misreport as an add+remove pair).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    // the output is keys + `change`; a KEY named `change` would emit two
    // columns with one name (value columns named `change` are fine —
    // they live inside the comparison struct and never surface)
    require(!keys.contains("change"),
      "diff emits a `change` column; a key of that name would collide")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String): DataFrame =
      if (valueCols.isEmpty)
        // key-only table: presence IS the state; a constant struct makes
        // every matched pair compare equal (added/removed only)
        df.select(keys.map(col) :+ struct(lit(true)).as(as): _*)
      else
        df.select(keys.map(col) :+
          struct(valueCols.map(col): _*).as(as): _*)
    val o = packed(oldDf, "__o")
    val n = packed(newDf, "__n")
    val change: Column =
      when(col("__o").isNull, lit("added"))
        .when(col("__n").isNull, lit("removed"))
        .when(!(col("__o") <=> col("__n")), lit("changed"))
        .otherwise(lit("unchanged"))
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+ change.as("change"): _*)
      .filter(col("change") =!= lit("unchanged"))
  }
}
