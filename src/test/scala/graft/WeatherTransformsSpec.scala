package graft

import org.apache.spark.sql.functions._
import graft.transform.WeatherTransforms._

/** §2.5-2.7 scalar surface, incl. the reference's exact (compass-wrong)
  * cardinal branch table (transf.py:55-81) at every boundary.
  */
class WeatherTransformsSpec extends SparkSuite {
  import spark.implicits._

  test("windCardinal replicates the reference branch table exactly") {
    val expected = Map(
      0.0 -> "N", 45.0 -> "NO", 90.0 -> "W", 135.0 -> "SE", 180.0 -> "S",
      225.0 -> "SO", 270.0 -> "E", 315.0 -> "NE", 360.0 -> "N",
      45.5 -> "NO", 89.99 -> "NO", 90.01 -> "SE", 359.99 -> "NE")
    val got = expected.keys.toSeq.toDF("deg")
      .withColumn("card", windCardinal($"deg"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got == expected)
  }

  test("hPaToMmHg uses the reference constant (transf.py:85)") {
    val Array(v) = Seq(1013.2).toDF("p")
      .select(hPaToMmHg($"p")).as[Double].collect()
    assert(v == 1013.2 * 0.750064)
  }

  test("shiftToLocalTime is a fixed 3h offset; date/time split crosses midnight") {
    val df = Seq("2023-11-30T01:30:00").toDF("s")
      .select(to_timestamp($"s").as("time"))
      .withColumn("time", shiftToLocalTime($"time"))
      .transform(splitDateTime())
    val r = df.select("date", "time").head
    assert(r.getString(0) == "29/11/2023") // -3h crosses the date boundary
    assert(r.getString(1) == "22:30")
  }

  test("isDayBool and partition date format") {
    val r = Seq((1, "2023-01-05T04:07:00")).toDF("is_day", "s")
      .select(isDayBool($"is_day").as("b"),
        partitionDate(to_timestamp($"s")).as("p")).head
    assert(r.getBoolean(0) && r.getString(1) == "01-05-23")
  }

  test("formatPostcodes matches pandas str(list)-then-strip output") {
    val df = Seq(
      (1L, Seq("1900", "1901")), (2L, Seq("B7000")), (3L, null)
    ).toDF("id", "postcodes")
    val got = df.select($"id", formatPostcodes($"postcodes").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // pandas: str(['1900','1901']) == "[1900, 1901]" after strip chars
    assert(got(1L) == "1900, 1901" && got(2L) == "B7000" && got(3L) == null)
  }

  test("noneToNull nulls literal 'None' strings") {
    val got = Seq(("None", "x")).toDF("admin1", "admin2")
      .transform(noneToNull(Seq("admin1", "admin2"))).head
    assert(got.isNullAt(0) && got.getString(1) == "x")
  }

  test("full weather pipeline over fixture JSON (ingest → transform → enrich)") {
    import graft.ingest.{FixtureSource, Ingest}
    val weatherJson =
      """{"current": {"time": "2023-11-30T14:00", "interval": 900,
        | "temperature_2m": 24.3, "relativehumidity_2m": 55.0,
        | "apparent_temperature": 24.9, "is_day": 1, "precipitation": 0.0,
        | "rain": 0.0, "pressure_msl": 1013.2, "windspeed_10m": 11.5,
        | "winddirection_10m": 135.0, "windgusts_10m": 21.2}}"""
        .stripMargin.replace("\n", " ")
    val locJson =
      """{"results": [
        | {"id": 3432043, "name": "La Plata", "latitude": -34.92145,
        |  "longitude": -57.95453, "elevation": 16.0, "feature_code": "PPLA",
        |  "country_code": "AR", "admin1_id": 3435907,
        |  "timezone": "America/Argentina/Buenos_Aires", "population": 694167,
        |  "postcodes": ["1900"], "country_id": 3865483,
        |  "country": "Argentina", "admin1": "Buenos Aires"},
        | {"id": 3861445, "name": "La Plata", "latitude": -33.03016,
        |  "longitude": -68.54543, "feature_code": "PPL",
        |  "country_code": "AR", "country_id": 3865483,
        |  "country": "Argentina"}]}""".stripMargin.replace("\n", " ")

    // weather record schema for the JSON payload (time arrives as string)
    val payload = org.apache.spark.sql.types.StructType(
      graft.schemas.Schemas.weatherRecord.fields.filterNot(f =>
        f.name == "api_loc_id" || f.name == "fecha_partic")
        .map(f => if (f.name == "time")
          f.copy(dataType = org.apache.spark.sql.types.StringType) else f))

    val meteor = Ingest.weatherRecord(spark,
      new FixtureSource(weatherJson), apiLocId = 3432043L, payload)
    val locs = Ingest.localities(spark, new FixtureSource(locJson),
      graft.schemas.Schemas.locality)

    // schema alignment filled the dropped fields of the 2nd record
    assert(locs.columns.toSeq == graft.schemas.Schemas.locality.fieldNames.toSeq)
    assert(locs.count() == 2)
    assert(locs.filter($"id" === 3861445L).head.getAs[Any]("population") == null)

    val out = meteor.transform(weatherPipeline(locs))
    assert(out.columns.toSeq == canonicalMeteorCols)
    val r = out.head
    assert(r.getAs[String]("date") == "30/11/2023") // 14:00 GMT-0 → 11:00 GMT-3
    assert(r.getAs[String]("time") == "11:00")
    assert(r.getAs[String]("city") == "La Plata")
    assert(r.getAs[String]("country") == "Argentina")
    assert(r.getAs[String]("winddir_cardinal_10m") == "SE")
    assert(r.getAs[Double]("pressure_msl") == 1013.2 * 0.750064)
    assert(r.getAs[Boolean]("is_day"))
  }
}
