package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with the
  * greatest `rightTime` ≤ `leftTime` in the same key group (ties at equal
  * time match, i.e. `>=` semantics like DuckDB's ASOF JOIN).
  *
  * Spark has no native as-of operator; per the custom-operator preference
  * order this is option (a): composed from built-ins. The union trick
  * turns the range join into ONE shuffle + sort per key group:
  * interleave both sides ordered by (time, side), then a running
  * `last(_, ignoreNulls)` carries each right payload forward to the left
  * rows that follow it. No per-row range probe, no cross product —
  * O(n log n) at any scale, AQE-skew-safe like any window.
  *
  * Requirements: `right` must be unique per (key, rightTime) — dedupe
  * first (a deterministic keeper, e.g. max id) or matches at duplicate
  * timestamps are order-dependent. Column names of the two sides must
  * not collide apart from `key` (rename before joining).
  *
  * Skew bound: the window partitions per KEY, so one pathological key
  * (a single user with 10⁹ events) lands on one reducer — standard
  * window behavior that AQE cannot split (round-3 review watchlist).
  * For hot-key distributions use [[asOfSliced]], which bounds any one
  * reducer's sort to a time slice of the key.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val leftPayload = left.columns.filterNot(_ == key)
    val rightPayload = right.columns.filterNot(_ == key)

    val lSel: Seq[Column] =
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__is_l")) ++
        leftPayload.map(col) ++
        rightPayload.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c))
    val rSel: Seq[Column] =
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__is_l")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col)

    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    // right rows (__is_l=0) sort BEFORE left rows at equal time → a right
    // row at exactly leftTime is visible to that left row (>= semantics)
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__is_l") === 1).drop("__t", "__is_l")
  }

  /** [[asOf]] for skewed keys: windows partition by (key, time-slice)
    * instead of key, so one reducer sorts at most one slice of one key —
    * a hot key's 10⁹ events spread over its slices. Rows carried across
    * slice boundaries come from a per-(key, slice) "latest right row"
    * spine: O(slices per key) rows, so ITS per-key window is bounded by
    * the time range ÷ `sliceSeconds`, never by event count. Same output
    * as [[asOf]], same requirements.
    *
    * `sliceSeconds` buckets `time.cast(long)` (epoch seconds for
    * timestamps, the raw value for numeric time columns); pick it so a
    * slice holds ~10⁵-10⁷ hot-key events (e.g. one hour for a
    * clickstream). The slice spine join lands on the same (key, slice)
    * distribution the window needs, so it adds no extra exchange of the
    * event stream.
    */
  def asOfSliced(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, sliceSeconds: Long): DataFrame = {
    require(sliceSeconds > 0, "sliceSeconds must be positive")
    val leftPayload = left.columns.filterNot(_ == key)
    val rightPayload = right.columns.filterNot(_ == key)

    // exact floor division (same overflow-safe idiom as Dedup.simHashPairs)
    // over NTZ-safe epoch seconds (TimeCols owns the dtype decision)
    def sliceOf(dt: org.apache.spark.sql.types.DataType, t: Column): Column = {
      val s = graft.functions.TimeCols.toSliceLong(dt, t)
      ((s - pmod(s, lit(sliceSeconds))) / lit(sliceSeconds)).cast("long")
    }

    val lSel: Seq[Column] =
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__is_l")) ++
        leftPayload.map(col) ++
        rightPayload.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c))
    val rSel: Seq[Column] =
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__is_l")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col)
    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
      .withColumn("__slice",
        sliceOf(left.schema(leftTime).dataType, col("__t")))

    // carry-in: the latest right row of each (key, slice), run forward
    // over the slice SPINE (distinct (key, slice) of both sides — a left
    // slice with no right rows still needs the carry), shifted one slice
    // back so slice s sees only strictly-earlier slices
    val bounds = right
      .select(col(key),
        sliceOf(right.schema(rightTime).dataType, col(rightTime))
          .as("__slice"),
        col(rightTime).as("__rt"),
        struct(rightPayload.map(col).toSeq: _*).as("__p"))
      .groupBy(key, "__slice").agg(max_by(col("__p"), col("__rt")).as("__p"))
    val spine = unioned.select(col(key), col("__slice")).distinct()
    val wCarry = Window.partitionBy(key).orderBy(col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(bounds, Seq(key, "__slice"), "left")
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(wCarry))
      .select(col(key), col("__slice"), col("__carry"))

    val w = Window.partitionBy(key, "__slice")
      .orderBy(col("__t").asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(
      unioned.join(carry, Seq(key, "__slice"), "left"))((d, c) =>
      d.withColumn(c, coalesce(last(col(c), ignoreNulls = true).over(w),
        col("__carry").getField(c))))
    filled.filter(col("__is_l") === 1)
      .drop("__t", "__is_l", "__slice", "__carry")
  }
}
