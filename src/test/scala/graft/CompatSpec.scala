package graft

import org.apache.spark.sql.types._

import graft.compat.{Autom, DataLake, Extrac, PgSql}
import graft.config.{GraftConfig, LakeConfig}
import graft.ingest.FixtureSource

/** The compat facade drives the same flows through the reference's own
  * method names — the literal "a user of the reference could switch"
  * check.
  */
class CompatSpec extends SparkSuite {
  import spark.implicits._

  private val weatherJson =
    """{"current": {"time": "2023-11-30T14:00", "interval": 900,
      | "temperature_2m": 24.3, "relativehumidity_2m": 55.0,
      | "apparent_temperature": 24.9, "is_day": 1, "precipitation": 0.0,
      | "rain": 0.0, "pressure_msl": 1013.2, "windspeed_10m": 11.5,
      | "winddirection_10m": 135.0, "windgusts_10m": 21.2}}"""
      .stripMargin.replace("\n", " ")
  private val locJson =
    """{"results": [{"id": 1, "name": "X", "latitude": 1.0,
      | "longitude": 2.0, "country_id": 3, "country": "AR"}]}"""
      .stripMargin.replace("\n", " ")

  test("extrac_almac.py flow through reference method names") {
    val cfg = GraftConfig(lake = LakeConfig(root = tmpDir() + "/lake"))
    val lake = new DataLake(spark, cfg)

    val loc = Extrac.ciudad_df(spark, new FixtureSource(locJson), "X", 10)
    assert(lake.a_parquet_full(loc))
    assert(!lake.a_parquet_full(loc)) // duplicate-id gate

    val ex = new Extrac(spark, new FixtureSource(weatherJson), 1L,
      latitud = 1.0, longitud = 2.0)
    val reg = ex.regist_tiempo_df()
    assert(lake.a_parquet_inc(reg, Seq("fecha_partic")))
    assert(!lake.a_parquet_inc(reg, Seq("fecha_partic"))) // repeat poll

    assert(lake.leer_parq("regmeteor").get.count() == 1)
    assert(lake.leer_parq("localid").get.count() == 1)
  }

  test("PgSql surface through reference method names") {
    val pg = new PgSql(spark, "compat_wh")
    pg.crear_tabla("t1", Seq("id" -> LongType, "v" -> StringType))
    pg.cargar_df(Seq((1L, "a")).toDF("id", "v"), "t1")
    assert(pg.ejecutar_sql("SELECT count(*) AS n FROM compat_wh.t1")
      .head.getLong(0) == 1L)
    pg.impr_tabla("t1", 5) // console sink (S12) — smoke only
  }
}
