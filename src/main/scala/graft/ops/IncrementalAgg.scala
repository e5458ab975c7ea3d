package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable partial-aggregate rollups — incremental aggregation for a
  * continuously-ingested lake: each ingest slice (a day, an hour, one
  * micro-batch) reduces ONCE to tiny algebraic state per key, and totals
  * over any slice range merge the states instead of re-scanning raw
  * history. At 100 TB this is the difference between a dashboard query
  * that reads kilobytes of rollup and one that reads the lake: raw rows
  * are touched exactly once, at ingest time.
  *
  * The state is the classic commutative-monoid algebra — `cnt ⊕ = sum`,
  * `sum ⊕ = sum`, `min ⊕ = min`, `max ⊕ = max` — so merging is
  * associative AND re-entrant: the output of [[mergeTotals]] has the
  * same shape as its input, so yesterday's merged totals can themselves
  * be merged with today's partial (the fold-forward pattern;
  * spec-asserted). Averages are derived at read time (`sum/cnt`) and
  * never stored — an average does not merge.
  *
  * Exactness: the value should be pre-scaled to an integer (e.g. cents,
  * see `Q.centsSum`) so `sum` is BIGINT and the merge is bit-exact in
  * any engine; `avg` is then one double division on exact integers.
  *
  * Scale shape: both steps are map-side-combinable hash aggregates; the
  * partials frame is `|slices| × |keys|` rows (KBs), so the merge's
  * shuffle is negligible regardless of raw volume.
  */
object IncrementalAgg {

  /** Reduce one ingest slice (or a whole history, sliced) to per-
    * (slice, key) algebraic state. `value` must be integral (cents).
    */
  def partials(df: DataFrame, slice: Column, key: Column,
      value: Column): DataFrame = {
    val v = value.cast("long")
    df.groupBy(slice.as("slice"), key.as("key"))
      .agg(count(v).as("cnt"), sum(v).as("sum"),
        min(v).as("min"), max(v).as("max"))
  }

  /** Merge algebraic states to per-key totals + derived avg. Accepts
    * [[partials]] output OR its own output re-sliced (fold-forward):
    * any frame with `(key, cnt, sum, min, max)`.
    */
  def mergeTotals(state: DataFrame): DataFrame =
    state.groupBy("key")
      .agg(sum("cnt").as("cnt"), sum("sum").as("sum"),
        min("min").as("min"), max("max").as("max"))
      .withColumn("avg",
        col("sum").cast("double") / col("cnt").cast("double"))

  /** One-shot totals (merge of a single all-in-one slice) — the direct
    * form [[refreshByDiff]]'s incremental path must reproduce.
    */
  def totals(df: DataFrame, key: Column, value: Column): DataFrame =
    mergeTotals(partials(df, lit(0L), key, value))

  /** Incremental view maintenance: refresh per-key totals after a table
    * changed, touching ONLY the keys the change set names. cnt/sum are
    * invertible but min/max are not (removing the min row invalidates
    * the stored min), so the sound generic refresh is: carry untouched
    * keys' totals by reference, RE-AGGREGATE only affected keys from
    * the new snapshot — O(|untouched| map-side pass-through +
    * |affected keys' rows|), never a full re-aggregation of unchanged
    * groups' raw history. `affectedKeys` comes from
    * [[SnapshotDiff.diff]] (map its changed/added/removed rows to the
    * rollup's key — include removed rows' keys via the OLD snapshot, or
    * their groups keep stale totals).
    *
    * Keys present only in `oldTotals` and affected (all rows deleted)
    * drop out naturally: the re-aggregate finds no rows for them.
    */
  def refreshByDiff(oldTotals: DataFrame, newSnapshot: DataFrame,
      affectedKeys: DataFrame, key: Column, value: Column): DataFrame = {
    val affected = affectedKeys.select(col(affectedKeys.columns.head)
      .as("key")).distinct()
    val untouched = oldTotals.join(affected, Seq("key"), "left_anti")
    val recomputed = totals(
      newSnapshot.join(affected, key === affected("key"), "left_semi"),
      key, value)
    untouched.unionByName(recomputed)
  }

  /** DuckDB twin: totals computed directly from the raw table — the
    * ground truth the partial-merge decomposition must reproduce
    * exactly.
    */
  def totalsSql(table: String, keyE: String, valueE: String): String =
    s"""SELECT $keyE AS key, count($valueE) AS cnt,
       |  CAST(sum(CAST($valueE AS BIGINT)) AS BIGINT) AS sum,
       |  CAST(min(CAST($valueE AS BIGINT)) AS BIGINT) AS min,
       |  CAST(max(CAST($valueE AS BIGINT)) AS BIGINT) AS max,
       |  CAST(sum(CAST($valueE AS BIGINT)) AS DOUBLE)
       |    / CAST(count($valueE) AS DOUBLE) AS avg
       |FROM $table GROUP BY $keyE""".stripMargin
}
