package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, composed scalably (SURVEY custom-operator
  * preference (a)).
  *
  * A naive `p.ts BETWEEN i.start AND i.end` non-equi join plans as a
  * broadcast-nested-loop — O(|points|·|intervals|), hopeless at scale.
  * Bucket decomposition turns it into an equi-join: both sides map to
  * fixed-width time buckets (intervals explode to every bucket they
  * overlap), join on (key, bucket), then the exact BETWEEN filter. With
  * bucket width ≈ typical interval length each interval lands in O(1)
  * buckets, so the join is linear-ish and shuffles on (key, bucket) —
  * the standard interval-join topology (used by e.g. genomic and
  * telemetry engines).
  */
object RangeJoin {

  /** Join each point row to every interval (same `key`) containing its
    * `pointTime`: `start <= t <= end`. `bucketMicros` = bucket width;
    * choose ≈ the typical interval length.
    *
    * Column names of the two sides must not collide apart from `key`.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    import graft.functions.TimeCols.toMicros
    def us(df: DataFrame, c: String) = toMicros(df.schema(c).dataType, col(c))
    val p = points.withColumn("__bucket",
      floor(us(points, pointTime) / bucketMicros).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(us(intervals, startCol) / bucketMicros).cast("long"),
        floor(us(intervals, endCol) / bucketMicros).cast("long"))))
    p.join(i, Seq(key, "__bucket"))
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("__bucket")
  }
}
