package graft.schemas

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed schemas + schema-alignment ("conform") transform.
  *
  * The reference normalizes geocoding JSON to a canonical 20-column frame
  * because "the API deletes empty fields from the JSON" (main.py:241-263):
  * missing columns added as nulls, `admin*`/`admin*_id` force-cast to
  * string, columns reordered. [[Schemas.conformTo]] is that logic as one
  * reusable transform; with `spark.read.schema(...)` Spark does the same
  * natively at scan time (zero-cost at scale — no second pass).
  */
object Schemas {

  /** Locality canonical schema — the 20 columns of main.py:242-245, typed
    * per the warehouse DDL (transf.py:152-174) and FIXTURES.md A2.
    */
  val locality: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("elevation", DoubleType),
    StructField("feature_code", StringType),
    StructField("country_code", StringType),
    StructField("admin1_id", StringType),   // force-cast str, main.py:256-257
    StructField("admin2_id", StringType),
    StructField("admin3_id", StringType),
    StructField("admin4_id", StringType),
    StructField("timezone", StringType),
    StructField("population", DoubleType),
    StructField("postcodes", ArrayType(StringType)),
    StructField("country_id", LongType),
    StructField("country", StringType),
    StructField("admin1", StringType),      // force-cast str, main.py:259-260
    StructField("admin2", StringType),
    StructField("admin3", StringType),
    StructField("admin4", StringType)
  ))

  /** Weather "current" record as landed in the lake (FIXTURES.md A1;
    * columns from transf.py:286-305 + ingest-injected `api_loc_id`,
    * `fecha_partic` at main.py:213-215).
    */
  val weatherRecord: StructType = StructType(Seq(
    StructField("api_loc_id", LongType),
    StructField("fecha_partic", StringType), // "MM-dd-yy" partition value
    StructField("time", TimestampType),
    StructField("interval", IntegerType),
    StructField("temperature_2m", DoubleType),
    StructField("relativehumidity_2m", DoubleType),
    StructField("apparent_temperature", DoubleType),
    StructField("is_day", IntegerType),
    StructField("precipitation", DoubleType),
    StructField("rain", DoubleType),
    StructField("pressure_msl", DoubleType),
    StructField("windspeed_10m", DoubleType),
    StructField("winddirection_10m", DoubleType),
    StructField("windgusts_10m", DoubleType)
  ))

  /** P8 + M4 + P3 as one transform (main.py:242-263): add absent columns as
    * typed nulls, cast present ones to the canonical type, reorder to the
    * schema's column order. Pure projection — Catalyst collapses it into
    * the scan, so conforming is free at any scale.
    */
  def conformTo(schema: StructType)(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols = schema.fields.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }
}
