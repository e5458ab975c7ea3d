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
}
