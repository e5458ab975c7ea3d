package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.config.GraftConfig
import graft.ingest.{Ingest, RestSource}
import graft.lake.DataLake
import graft.schemas.Schemas
import graft.transform.WeatherTransforms
import graft.warehouse.Warehouse

/** The reference's two driver scripts as library entry points — a user of
  * `tp_integ_data_pipeline` switches by pointing these at their config:
  *
  *  - [[Pipeline.extractAndStore]] ≙ `extrac_almac.py` (§3.1): geocode →
  *    lake full-append with dedup gate → weather record → lake
  *    incremental append with duplicate-poll suppression.
  *  - [[Pipeline.transformAndLoad]] ≙ `transf.py` (§3.3): read lake →
  *    weather + locality transforms → warehouse via MG1 insert-if-absent
  *    (facts) and MG2 SCD1 upsert (dims).
  *
  * Network-free by construction: the [[RestSource]] is injected (fixture
  * JSON in tests; a real HTTP fetcher in deployment). Both are driven
  * end-to-end in ExamplePipelineSpec.
  */
object Pipeline {

  /** JSON payload schema of the weather `current` object (time arrives as
    * a string; parsed on ingest).
    */
  val weatherPayload: StructType = StructType(
    Schemas.weatherRecord.fields
      .filterNot(f => f.name == "api_loc_id" || f.name == "fecha_partic")
      .map(f => if (f.name == "time") f.copy(dataType = StringType) else f))

  /** Entry point 1 (§3.1). The geocoding request carries the city search
    * params (main.py:227-229) and the weather request the first result's
    * lat/long (extrac_almac.py:20-23 → main.py:195-196). Returns
    * (localityBatchWritten, recordWritten).
    */
  def extractAndStore(spark: SparkSession, cfg: GraftConfig,
      geocoding: RestSource, weather: RestSource, apiLocId: Long,
      ciudad: String = "La Plata", nres: Int = 10): (Boolean, Boolean) = {
    val locs = Ingest.localities(spark, geocoding, Schemas.locality,
      Ingest.geocodingParams(ciudad, nres))
    val locWritten = DataLake.appendFull(spark, locs, cfg.lake.dimPath)
    // first-row probe (A2) — lat/long feed the weather endpoint params
    val latLong = Ingest.firstLatLong(locs)
    require(latLong.nonEmpty, "geocoding returned no results")
    val (lat, long) = latLong.get
    val record = Ingest.weatherRecord(spark, weather, apiLocId,
      weatherPayload, Ingest.weatherParams(lat, long))
    val recWritten = DataLake.appendIncremental(spark, record,
      cfg.lake.factDir, cfg.lake.partitionCol, cfg.lake.timeCol)
    (locWritten, recWritten)
  }

  /** Entry point 3 (§3.3). Audit date injectable for determinism (D6). */
  def transformAndLoad(spark: SparkSession, cfg: GraftConfig,
      auditDate: Column = current_date()): Unit = {
    val meteor = DataLake.read(spark, cfg.lake.factDir)
      .getOrElse(sys.error("empty lake: run extractAndStore first"))
    val locs = DataLake.read(spark, cfg.lake.dimPath)
      .getOrElse(sys.error("no localities in lake"))

    val meteorOut = meteor.transform(WeatherTransforms.weatherPipeline(locs))
    val locsOut = locs
      .transform(WeatherTransforms.localityPipeline(auditDate))
      .withColumn("fecha_actualizacion_origen", auditDate.cast("date"))

    val db = cfg.warehouse.database
    Warehouse.ensureDatabase(spark, db)
    val meteorTable = s"$db.${cfg.warehouse.meteorTable}"
    val locTable = s"$db.${cfg.warehouse.locTable}"
    Warehouse.ensureTable(spark, meteorTable, meteorOut.schema)
    Warehouse.ensureTable(spark, locTable, locsOut.schema)

    // MG1: idempotent fact load on the reference's (date,time) key
    Warehouse.insertIfAbsent(spark, meteorTable, meteorOut,
      Seq("date", "time"))
    // MG2: SCD1 dim upsert on id, audit columns maintained
    Warehouse.scd1Upsert(spark, locTable, locsOut, key = "id",
      auditDate = auditDate)
  }
}
