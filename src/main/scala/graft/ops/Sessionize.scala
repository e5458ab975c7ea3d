package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the event-log → sessions operator: group a
  * user's events into sessions separated by inactivity gaps longer than
  * `gapSec`. The assembly step for conversation/interaction training data
  * (turn logs → dialogue episodes) and the classic clickstream rollup.
  *
  * Spark has no native SESSION_WINDOW for batch until 3.2's
  * `session_window`, but that emits window structs, not stable ordinal
  * session ids, and its output shape doesn't compose with downstream
  * joins — so this is the composed form (custom-operator preference (a)):
  * `lag` flags session starts, a running sum numbers them. ONE shuffle on
  * the user key; both windows share the same partitioning and sort, so
  * Catalyst plans a single Exchange + Sort pair.
  *
  * Cross-engine exactness: the gap test and session numbering are pure
  * integer arithmetic on microsecond epochs (`unix_micros` ≡ DuckDB
  * `epoch_us` on naive UTC timestamps); ordering ties break on the event
  * id, so session boundaries are bit-stable in any engine.
  *
  * Skew bound: windows partition per user, so one pathological user lands
  * on one reducer — the standard window bound. For hot-key logs, slice
  * time like [[AsOfJoin.asOfSliced]] / `Sampling.budgetPerKey`: number
  * sessions per (user, day) then offset by a per-user running day total —
  * same two-level decomposition, unchanged results when no session spans
  * a slice boundary (sessions never span a gap > `gapSec`, so slicing on
  * day boundaries ≥ `gapSec` apart is exact after stitching first/last).
  */
object Sessionize {

  /** Per-event session assignment: input columns + `session_idx`
    * (1-based ordinal per user, ascending by time).
    */
  def assign(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive: $gapSec")
    val tsUs = graft.functions.TimeCols.toMicros(
      df.schema(tsCol).dataType, col(tsCol))
    val order = Seq(col(tsCol), col(idCol))
    val lagW = Window.partitionBy(userCol).orderBy(order: _*)
    val runW = lagW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(tsUs, 1).over(lagW))
      .withColumn("__new",
        when(col("__prev").isNull ||
          tsUs - col("__prev") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("__new").over(runW))
      .drop("__prev", "__new")
  }

  /** Per-session rollup: event count, first/last timestamps, exact
    * microsecond duration. Runs [[assign]] then ONE more aggregate —
    * Catalyst reuses the assign shuffle's partitioning (`user` is a
    * prefix of the grouping key), so no second Exchange of the events.
    */
  def summary(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    val us = graft.functions.TimeCols.toMicros(
      df.schema(tsCol).dataType, _: org.apache.spark.sql.Column)
    assign(df, userCol, tsCol, idCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"),
        (us(max(col(tsCol))) - us(min(col(tsCol)))).as("duration_us"))
  }

  /** DuckDB twin of [[summary]] (same integer gap test and numbering). */
  /** Episode assembly — the step that turns a sessionized event log
    * into TRAINING EPISODES (conversation/interaction sequences): per
    * session, the events concatenated in exact `(ts, id)` order as one
    * sequence string, plus count and duration. The output row is the
    * unit a sequence model trains on.
    *
    * Scale shape: one shuffle on the user key (shared with [[assign]]'s
    * window via the same partitioning), then a per-session
    * `sort_array(collect_list(struct(...)))` — state is bounded by the
    * SESSION length (the gap bounds it in wall-time), never by a user's
    * full history, which is what makes collect_list admissible here
    * where it is banned for per-key corpus aggregation. Events carry
    * only the label column into the list, not the full row.
    */
  def episodes(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, labelCol: String, gapSec: Long): DataFrame = {
    val us = graft.functions.TimeCols.toMicros(
      df.schema(tsCol).dataType, _: org.apache.spark.sql.Column)
    assign(df, userCol, tsCol, idCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (us(max(col(tsCol))) - us(min(col(tsCol)))).as("duration_us"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              us(col(tsCol)).as("t"),
              col(idCol).as("i"),
              col(labelCol).cast("string").as("l")))),
            x => x.getField("l")),
          ",").as("episode"))
  }

  /** DuckDB twin of [[episodes]]. `list(x ORDER BY t, eid)` replays the
    * same (ts, id) total order as Spark's struct `array_sort` (struct
    * compare is field-order lexicographic, (t, i) lead and are unique).
    */
  def episodesSql(table: String, userE: String, tsE: String,
      idE: String, labelE: String, gapSec: Long): String =
    s"""WITH __l AS (
       |  SELECT $userE AS u, $tsE AS t, $idE AS eid, $labelE AS lbl,
       |    lag(epoch_us($tsE)) OVER (PARTITION BY $userE
       |      ORDER BY $tsE, $idE) AS prev
       |  FROM $table),
       |__s AS (
       |  SELECT u, t, eid, lbl,
       |    CAST(sum(CASE WHEN prev IS NULL
       |        OR epoch_us(t) - prev > ${gapSec * 1000000L}
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY u ORDER BY t, eid
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM __l)
       |SELECT u AS $userE, session_idx,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(epoch_us(max(t)) - epoch_us(min(t)) AS BIGINT) AS duration_us,
       |  array_to_string(
       |    list(CAST(lbl AS VARCHAR) ORDER BY t, eid), ',') AS episode
       |FROM __s GROUP BY u, session_idx""".stripMargin

  def summarySql(table: String, userE: String, tsE: String,
      idE: String, gapSec: Long): String =
    s"""WITH __l AS (
       |  SELECT $userE AS u, $tsE AS t, $idE AS eid,
       |    lag(epoch_us($tsE)) OVER (PARTITION BY $userE
       |      ORDER BY $tsE, $idE) AS prev
       |  FROM $table),
       |__s AS (
       |  SELECT u, t, eid,
       |    CAST(sum(CASE WHEN prev IS NULL
       |        OR epoch_us(t) - prev > ${gapSec * 1000000L}
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY u ORDER BY t, eid
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM __l)
       |SELECT u AS $userE, session_idx,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  min(t) AS t_start, max(t) AS t_end,
       |  CAST(epoch_us(max(t)) - epoch_us(min(t)) AS BIGINT) AS duration_us
       |FROM __s GROUP BY u, session_idx""".stripMargin
}
