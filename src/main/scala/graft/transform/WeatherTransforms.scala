package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's transform stage (transf.py:40-134) as a library of
  * composable `DataFrame => DataFrame` transforms and pure `Column`
  * functions. Everything here is built-in Catalyst expressions — zero UDFs
  * (SURVEY.md §2.12) — so every transform stays inside whole-stage codegen
  * and never blocks predicate pushdown / column pruning.
  */
object WeatherTransforms {

  /** D2 (transf.py:46-47): GMT-0 → GMT-3 by FIXED 3-hour subtraction.
    * The reference subtracts a fixed offset, not a tz-database zone —
    * deliberately NOT `from_utc_timestamp(_, "America/Argentina/...")`,
    * which differs on historical dates.
    */
  def shiftToLocalTime(time: Column, hours: Int = 3): Column =
    time - expr(s"INTERVAL $hours HOURS")

  /** D3/D4 (transf.py:50-51): split a timestamp into `date` ("dd/MM/yyyy")
    * and `time` ("HH:mm") string columns, replacing `timeCol`.
    */
  def splitDateTime(timeCol: String = "time", dateCol: String = "date")(
      df: DataFrame): DataFrame =
    df.withColumn(dateCol, date_format(col(timeCol), "dd/MM/yyyy"))
      .withColumn(timeCol, date_format(col(timeCol), "HH:mm"))

  /** D5 (main.py:213): partition-date string "MM-dd-yy". */
  def partitionDate(time: Column): Column = date_format(time, "MM-dd-yy")

  /** M2 (transf.py:55-81): wind degrees → cardinal point, the reference's
    * EXACT 9-branch table — including its compass-incorrect labels
    * ((0,90)→"NO", 90→"W", (90,180)→"SE", 270→"E"): capability parity means
    * same input → same output (SURVEY.md §2.6 M2). A `CaseWhen` chain, not
    * a UDF — codegen-friendly and optimizer-transparent.
    */
  def windCardinal(deg: Column): Column =
    when(deg === 0 || deg === 360, "N")
      .when(deg > 0 && deg < 90, "NO")
      .when(deg === 90, "W")
      .when(deg > 90 && deg < 180, "SE")
      .when(deg === 180, "S")
      .when(deg > 180 && deg < 270, "SO")
      .when(deg === 270, "E")
      .otherwise("NE")

  /** M1 (transf.py:85-86): pressure hPa → mmHg. */
  val HPA_TO_MMHG = 0.750064
  def hPaToMmHg(p: Column): Column = p * lit(HPA_TO_MMHG)

  /** M3 (transf.py:89-91): int {0,1} → boolean. The reference lambda
    * `a == 1 if True else False` reduces to `a == 1`.
    */
  def isDayBool(c: Column): Column = c === 1

  /** T1 (transf.py:119-124): stringify the `postcodes` array exactly as
    * pandas `str(list)` + strip of `[`, `]`, `'`, `"` does: elements joined
    * by ", "; null array → null (transf.py:124 'None' → NaN).
    */
  def formatPostcodes(c: Column): Column = array_join(c, ", ")

  /** M5 (transf.py:127-128, main.py:251-253): literal 'None' strings →
    * null for the given columns.
    */
  def noneToNull(cols: Seq[String])(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c) === "None", lit(null)).otherwise(col(c))))

  /** P9/D6 (transf.py:132): audit date column. Parameterized for
    * deterministic tests (SURVEY.md §5.2) — pass `current_date()` in
    * production, a literal in tests.
    */
  def withAuditDate(df: DataFrame, name: String = "fecha_actualizacion",
      value: Column = current_date()): DataFrame =
    df.withColumn(name, value)

  /** J1 + P2 + P4 (transf.py:94-101): enrich weather rows with locality
    * name/country — left equi-join on `api_loc_id = id`, build side
    * projected to 3 columns (P5; Catalyst would prune anyway), then drop
    * the join key and rename `name` → `city`.
    *
    * The dimension is broadcast explicitly: at 100 TB the fact side never
    * shuffles for this join; the dim (geocoding results) is tiny by
    * construction (nres≤100, main.py:226-239).
    */
  def enrichWithLocality(locs: DataFrame)(meteor: DataFrame): DataFrame =
    meteor
      .join(broadcast(locs.select("id", "name", "country")),
        meteor("api_loc_id") === locs("id"), "left")
      .drop("id")
      .withColumnRenamed("name", "city")

  /** P3 (transf.py:104-108): canonical 17-column output order. */
  val canonicalMeteorCols: Seq[String] = Seq(
    "date", "time", "city", "country", "api_loc_id", "interval",
    "temperature_2m", "apparent_temperature", "relativehumidity_2m",
    "is_day", "precipitation", "rain", "pressure_msl", "windspeed_10m",
    "winddir_cardinal_10m", "winddirection_10m", "windgusts_10m")

  /** §3.3 step 2, the whole weather transform (transf.py:40-108) as one
    * lazy plan: drop partition col → local-time shift → date/time split →
    * cardinal CaseWhen → pressure scale → bool cast → broadcast-join
    * enrich → canonical order. Catalyst collapses this into a single
    * scan+project stage plus one broadcast join.
    */
  def weatherPipeline(locs: DataFrame)(meteor: DataFrame): DataFrame =
    meteor
      .drop("fecha_partic")                                     // P1, transf.py:43
      .withColumn("time", shiftToLocalTime(col("time")))        // D1/D2
      .transform(splitDateTime())                               // D3/D4
      .withColumn("winddir_cardinal_10m",
        windCardinal(col("winddirection_10m")))                 // M2
      .withColumn("pressure_msl", hPaToMmHg(col("pressure_msl"))) // M1
      .withColumn("is_day", isDayBool(col("is_day")))           // M3
      .transform(enrichWithLocality(locs))                      // J1/P2/P4
      .select(canonicalMeteorCols.map(col): _*)                 // P3

  /** §3.3 step 3 (transf.py:112-132): locality transform — postcodes
    * stringify (T1/M4), 'None' → null (M5), audit date (P9).
    */
  def localityPipeline(auditDate: Column = current_date())(
      locs: DataFrame): DataFrame =
    locs
      .withColumn("postcodes", formatPostcodes(col("postcodes")))
      .transform(noneToNull(Seq("admin1", "admin2", "admin3", "admin4")))
      .transform(withAuditDate(_, "fecha_actualizacion", auditDate))
}
