package graft

import org.apache.spark.sql.functions._

import graft.config.{GraftConfig, LakeConfig, WarehouseConfig}
import graft.examples.Pipeline
import graft.ingest.FixtureSource

/** End-to-end: both reference entry points over fixture JSON — extract →
  * lake → transform → warehouse, replayed to prove idempotence.
  */
class ExamplePipelineSpec extends SparkSuite {

  private val weatherJson =
    """{"current": {"time": "2023-11-30T14:00", "interval": 900,
      | "temperature_2m": 24.3, "relativehumidity_2m": 55.0,
      | "apparent_temperature": 24.9, "is_day": 1, "precipitation": 0.0,
      | "rain": 0.0, "pressure_msl": 1013.2, "windspeed_10m": 11.5,
      | "winddirection_10m": 135.0, "windgusts_10m": 21.2}}"""
      .stripMargin.replace("\n", " ")
  private val locJson =
    """{"results": [
      | {"id": 3432043, "name": "La Plata", "latitude": -34.92145,
      |  "longitude": -57.95453, "country_id": 3865483,
      |  "country": "Argentina", "admin1": "Buenos Aires",
      |  "postcodes": ["1900"]}]}""".stripMargin.replace("\n", " ")

  /** Fixture that records the request params each fetch received. */
  private final class RecordingSource(body: String)
      extends graft.ingest.RestSource {
    @volatile var lastParams: Map[String, String] = Map.empty
    def fetch(params: Map[String, String]): String = {
      lastParams = params; body
    }
  }

  test("extract → lake → transform → warehouse, idempotent on replay") {
    val root = tmpDir()
    val db = "ex" + root.hashCode.abs
    val cfg = GraftConfig(
      lake = LakeConfig(root = root + "/lake"),
      warehouse = WarehouseConfig(database = db))

    // ---- entry point 1: extract + store
    val geo = new RecordingSource(locJson)
    val wea = new RecordingSource(weatherJson)
    val (locW, recW) = Pipeline.extractAndStore(spark, cfg,
      geo, wea, 3432043L, ciudad = "La Plata", nres = 10)
    assert(locW && recW)
    // request params threaded end-to-end (extrac_almac.py:20-23 flow):
    // geocoding got the search, weather got the first result's lat/long
    assert(geo.lastParams == Map("name" -> "La Plata", "count" -> "10",
      "language" -> "es", "format" -> "json"))
    assert(wea.lastParams == Map("latitude" -> "-34.92145",
      "longitude" -> "-57.95453"))
    // replay: both gates must refuse (duplicate id / duplicate poll time)
    val (locW2, recW2) = Pipeline.extractAndStore(spark, cfg,
      new FixtureSource(locJson), new FixtureSource(weatherJson), 3432043L)
    assert(!locW2 && !recW2)
    assert(spark.read.parquet(cfg.lake.factDir).count() == 1)

    // ---- entry point 3: transform + load
    val audit = to_date(lit("2026-08-12"))
    Pipeline.transformAndLoad(spark, cfg, audit)
    val meteor = spark.table(s"$db.meteor_proc")
    val r = meteor.head
    assert(meteor.count() == 1)
    assert(r.getAs[String]("date") == "30/11/2023")
    assert(r.getAs[String]("time") == "11:00") // 14:00 GMT-0 → GMT-3
    assert(r.getAs[String]("city") == "La Plata")
    assert(r.getAs[String]("winddir_cardinal_10m") == "SE")

    // replay the load: MG1 keeps the fact table stable, MG2 converges
    Pipeline.transformAndLoad(spark, cfg, audit)
    assert(spark.table(s"$db.meteor_proc").count() == 1)
    val loc = spark.table(s"$db.loc_proc").head
    assert(loc.getAs[String]("postcodes") == "1900")
    assert(loc.getAs[java.sql.Date]("fecha_actualizacion").toString
      == "2026-08-12")
    assert(spark.table(s"$db.loc_proc").count() == 1)
  }
}
