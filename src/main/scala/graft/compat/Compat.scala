package graft.compat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.GraftConfig
import graft.ingest.{Ingest, RestSource}
import graft.schemas.Schemas
import graft.warehouse.Warehouse

/** 1:1 facade over the reference's four classes — same class and method
  * names (Spanish, as in main.py), delegating to the graft modules, so a
  * reference user's call sites translate mechanically:
  *
  * | reference (main.py) | here |
  * |---|---|
  * | `DataLake.leer_parq(tabla)` (:46) | [[DataLake.leer_parq]] |
  * | `DataLake.a_parquet_inc(reg, partic)` (:80) | [[DataLake.a_parquet_inc]] |
  * | `DataLake.a_parquet_full(reg)` (:116) | [[DataLake.a_parquet_full]] |
  * | `Extrac.regist_tiempo_df()` (:201) | [[Extrac.regist_tiempo_df]] |
  * | `Extrac.ciudad_df(ciudad, nres)` (:219) | [[Extrac.ciudad_df]] |
  * | `Autom.lanzar_descarga(intervalo)` (:302) | [[Autom.lanzar_descarga]] |
  * | `PgSql.cargar_df(df, tabla)` (:392) | [[PgSql.cargar_df]] |
  * | `PgSql.crear_tabla(...)` (:363) | [[PgSql.crear_tabla]] |
  * | `PgSql.ejecutar_sql(sql)` (:418) | [[PgSql.ejecutar_sql]] |
  * | `PgSql.impr_tabla(tabla)` (:437) | [[PgSql.impr_tabla]] |
  */
final class DataLake(spark: SparkSession, cfg: GraftConfig = GraftConfig()) {

  /** S1-S3 (main.py:46-78): read a lake table; None when missing/empty. */
  def leer_parq(tabla: String): Option[DataFrame] = {
    val path =
      if (tabla == cfg.lake.factTable) cfg.lake.factDir else cfg.lake.dimPath
    graft.lake.DataLake.read(spark, path)
  }

  /** S4+A1 (main.py:80-114): partitioned incremental append with
    * duplicate-poll suppression. `adv` gates the duplicate-poll warning
    * exactly as in the reference (main.py:106); the boolean return
    * additionally carries the signal programmatically.
    */
  def a_parquet_inc(registro: DataFrame, partic: Seq[String],
      adv: Boolean = true): Boolean = {
    val appended = graft.lake.DataLake.appendIncremental(spark, registro,
      cfg.lake.factDir,
      partic.headOption.getOrElse(cfg.lake.partitionCol), cfg.lake.timeCol)
    if (!appended && adv)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn("a_parquet_inc: duplicate poll suppressed (no newer rows)")
    appended
  }

  /** S5+J2 (main.py:116-150): all-or-nothing dimension append. */
  def a_parquet_full(registro: DataFrame): Boolean =
    graft.lake.DataLake.appendFull(spark, registro, cfg.lake.dimPath)
}

/** main.py:190-199: the reference's `Extrac(id, latitud, longitud)` ctor
  * builds the weather endpoint from the locality's coordinates; here they
  * become the request params of every `regist_tiempo_df` fetch.
  */
final class Extrac(spark: SparkSession, source: RestSource,
    apiLocId: Long, latitud: Double, longitud: Double) {

  /** main.py:201-217: one weather record, partition date + loc id added. */
  def regist_tiempo_df(): DataFrame =
    Ingest.weatherRecord(spark, source, apiLocId,
      graft.examples.Pipeline.weatherPayload,
      Ingest.weatherParams(latitud, longitud))
}

object Extrac {
  /** main.py:219-263: geocoding search → canonical 20-column frame.
    * `ciudad`/`nres` shape the request exactly as main.py:227-229
    * (name/count/language=es/format=json; space→'+' in QueryString).
    */
  def ciudad_df(spark: SparkSession, source: RestSource, ciudad: String,
      nres: Int = 1): DataFrame =
    Ingest.localities(spark, source, Schemas.locality,
      Ingest.geocodingParams(ciudad, nres))
}

/** main.py:268-325: the polling daemon → a StreamingQuery. */
final class Autom(spark: SparkSession, stream: DataFrame,
    cfg: GraftConfig = GraftConfig(), checkpointDir: String) {

  /** main.py:302-311: start the background download loop. The returned
    * query's `stop()` actually works (the reference's console stop flag
    * was inert, main.py:313-325).
    */
  def lanzar_descarga(intervalo: Long = 900)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.Streams.ingestToLake(stream, cfg.lake.factDir,
      checkpointDir, intervalo, cfg.lake.partitionCol, cfg.lake.timeCol)
}

final class PgSql(spark: SparkSession, esquema: String = "warehouse") {
  Warehouse.ensureDatabase(spark, esquema) // main.py:353-360 (DD1)

  private def qualified(tabla: String) = s"$esquema.$tabla"

  /** DD2 (main.py:363-390): create-if-absent from a col→type mapping. */
  def crear_tabla(tabla: String,
      cols: Seq[(String, org.apache.spark.sql.types.DataType)]): Unit =
    Warehouse.ensureTable(spark, qualified(tabla),
      org.apache.spark.sql.types.StructType(cols.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t)
      }))

  /** S9 (main.py:392-416): bulk append (name-aligned). */
  def cargar_df(df: DataFrame, tabla: String): Unit =
    Warehouse.appendInto(spark, qualified(tabla), df)

  /** S11 (main.py:418-434): raw SQL channel. */
  def ejecutar_sql(sql: String): DataFrame = spark.sql(sql)

  /** S10+S12 (main.py:437-454): full-table verification print. */
  def impr_tabla(tabla: String, n: Int = 20): Unit =
    Warehouse.printTable(spark, qualified(tabla), n)
}
