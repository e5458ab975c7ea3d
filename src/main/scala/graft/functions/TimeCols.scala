package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared timestamp→integer coercions for time-keyed operators
  * (Sessionize, RangeJoin, AsOfJoin, ScaleOps). One place owns the
  * "which timestamp flavor is this" decision, so a schema drift at the
  * data boundary (the round-8 TIMESTAMP_NTZ regeneration of `events.ts`)
  * fails with a NAMED error at the operator boundary instead of a
  * DATATYPE_MISMATCH five operators deep — or, for NTZ, simply works:
  * wall-clock is cast to instant under the session zone (the engine pins
  * UTC at every entry point), which is exactly the instant DuckDB's
  * naive-timestamp read produces.
  *
  * All returned expressions stay inside whole-stage codegen (`Cast` +
  * `UnixMicros` are codegen'd); nothing here adds a shuffle or a UDF.
  */
object TimeCols {

  /** Integer microsecond epoch from a timestamp column of either flavor.
    * Rejects anything else at PLAN time with the offending type named —
    * an integer column reaching here means the caller skipped load-time
    * normalization, and silently treating it as seconds (what a blind
    * `cast("timestamp")` would do to a Long) is the bug class this
    * helper exists to kill.
    */
  def toMicros(dt: DataType, c: Column): Column = dt match {
    case TimestampType => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"time column must be TIMESTAMP or TIMESTAMP_NTZ, got ${other.sql}" +
        " — normalize at load (graft.queries.Q.normalizeTs) first")
  }

  /** The `cast(long)` used for coarse time slicing (AsOfJoin.asOfSliced):
    * epoch SECONDS for either timestamp flavor, the raw value for
    * integral columns (sliced as-of joins over numeric "time" axes are
    * legal there). Fails loudly on anything else.
    */
  def toSliceLong(dt: DataType, c: Column): Column = dt match {
    case TimestampType => c.cast(LongType)
    case TimestampNTZType => c.cast(TimestampType).cast(LongType)
    case LongType | IntegerType | ShortType | ByteType => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"slice column must be TIMESTAMP, TIMESTAMP_NTZ, or integral, " +
        s"got ${other.sql}")
  }
}
