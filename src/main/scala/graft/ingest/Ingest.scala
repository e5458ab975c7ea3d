package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion — the reference's `Extrac` class (main.py:152-265) re-shaped
  * for Spark. The HTTP fetch itself is driver-side and hidden behind
  * [[RestSource]] so tests run network-free (zero-egress env) against
  * fixture JSON; at scale the same trait would front a DataSource V2 or a
  * `foreachBatch` puller (SURVEY.md §2.1 S6).
  */
trait RestSource {
  /** One raw JSON response body (S6/S7: main.py:168-188, 226-239). */
  def fetch(params: Map[String, String]): String
}

/** Network-free source: serves a fixed JSON body (fixture-driven tests). */
final class FixtureSource(body: String) extends RestSource {
  def fetch(params: Map[String, String]): String = body
}

/** T2 (main.py:196-199, 226-239): URL/query-string building. The
  * reference concatenates `latitude=...&longitude=...` fragments onto a
  * configured base URL and hand-encodes city names with
  * `ciudad.replace(" ", "+")`; this is the same
  * application/x-www-form-urlencoded convention (space → '+'), done
  * properly for every reserved character via `URLEncoder`.
  */
object QueryString {
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** `k1=v1&k2=v2` with both sides form-encoded (space → '+'). */
  def encode(params: Seq[(String, String)]): String =
    params.map { case (k, v) =>
      java.net.URLEncoder.encode(k, Utf8) + "=" +
        java.net.URLEncoder.encode(v, Utf8)
    }.mkString("&")

  /** Append params to a base URL, reusing an existing `?` if present
    * (the reference's config bases already end mid-query).
    */
  def url(base: String, params: Seq[(String, String)]): String =
    if (params.isEmpty) base
    else {
      val sep =
        if (!base.contains('?')) "?"
        else if (base.endsWith("?") || base.endsWith("&")) ""
        else "&"
      base + sep + encode(params)
    }
}

/** Connection failure — the reference's bare
  * `Exception("Error de conexión...")` (main.py:177-180, 231-235) typed.
  */
final class RestConnectionException(url: String, cause: Throwable)
  extends RuntimeException(s"REST connection error: $url", cause)

/** API-level failure — the reference's `"error" in dic.keys()` check
  * (main.py:184-185), plus non-2xx statuses (hardening the reference,
  * which would ingest a 5xx error page as data).
  */
final class RestApiException(url: String,
    detail: String = "error payload in response")
  extends RuntimeException(s"REST API failure ($detail): $url")

/** S6/S7 real implementation: driver-side `java.net.http` GET with the
  * reference's semantics (main.py:168-188) — connection errors wrapped,
  * response parsed as JSON, a top-level `"error"` key rejected. Tests
  * stay network-free (loopback fixture server); production points `base`
  * at the configured endpoint. Jackson (already on Spark's classpath)
  * does the error-key probe.
  */
final class HttpSource(base: String,
    timeout: java.time.Duration = java.time.Duration.ofSeconds(30))
  extends RestSource {

  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(timeout)
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  def fetch(params: Map[String, String]): String = {
    val url = QueryString.url(base, params.toSeq.sortBy(_._1))
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(timeout).GET().build()
    val resp =
      try client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException => throw new RestConnectionException(url, e)
        case e: InterruptedException =>
          // restore the flag: Spark task/driver cancellation is cooperative
          Thread.currentThread().interrupt()
          throw new RestConnectionException(url, e)
      }
    if (resp.statusCode() / 100 != 2)
      throw new RestApiException(url, s"HTTP ${resp.statusCode()}")
    val body = resp.body()
    if (HttpSource.hasErrorKey(body)) throw new RestApiException(url)
    body
  }
}

object HttpSource {
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The reference's `"error" in list(dic.keys())` (main.py:184): true iff
    * the body is a JSON object with a top-level `error` field.
    */
  private[ingest] def hasErrorKey(body: String): Boolean =
    try {
      val node = mapper.readTree(body)
      node != null && node.isObject && node.has("error")
    } catch { case _: java.io.IOException => false }
}

object Ingest {

  /** Weather endpoint location params (main.py:195-196:
    * `ubic = f"latitude={lat}&longitude={long}"`; the variable-selection
    * fragment rides on the configured base URL, as in config.ini).
    */
  def weatherParams(latitude: Double, longitude: Double): Map[String, String] =
    Map("latitude" -> latitude.toString, "longitude" -> longitude.toString)

  /** Geocoding search params (main.py:227-229:
    * `name={ciudad}&count={nres}&language=es&format=json`; space→'+'
    * form-encoding happens in [[QueryString.encode]]).
    */
  def geocodingParams(ciudad: String, nres: Int = 1,
      language: String = "es"): Map[String, String] =
    Map("name" -> ciudad, "count" -> nres.toString,
      "language" -> language, "format" -> "json")

  /** S8 (main.py:210,239): nested JSON object → flat columns.
    * `json_normalize(dic["current"])` ≡ parse + `select("current.*")` —
    * a Catalyst `JsonToStructs`, fully codegen'd.
    */
  def flattenJson(spark: SparkSession, body: String, field: String,
      schema: StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(new StructType().add(field, schema))
      .json(Seq(body).toDS())
      .select(col(field + ".*"))
  }

  /** Same for a JSON array field (geocoding `results`, main.py:239):
    * explode the array then flatten.
    */
  def flattenJsonArray(spark: SparkSession, body: String, field: String,
      elem: StructType): DataFrame = {
    import spark.implicits._
    spark.read
      .schema(new StructType().add(field,
        org.apache.spark.sql.types.ArrayType(elem)))
      .json(Seq(body).toDS())
      .select(explode(col(field)).as("r"))
      .select(col("r.*"))
  }

  /** Weather record ingest (main.py:201-217): flatten the `current`
    * object, parse `time`, inject the partition date (D5, "MM-dd-yy") and
    * the locality id (P6). `params` carries the request's lat/long
    * ([[weatherParams]]) to the source.
    */
  def weatherRecord(spark: SparkSession, source: RestSource, apiLocId: Long,
      schema: StructType,
      params: Map[String, String] = Map.empty): DataFrame =
    flattenJson(spark, source.fetch(params), "current", schema)
      .withColumn("time", to_timestamp(col("time")))
      .withColumn("fecha_partic", date_format(col("time"), "MM-dd-yy"))
      .withColumn("api_loc_id", lit(apiLocId))

  /** Locality ingest (main.py:226-263): flatten `results`, then conform to
    * the canonical 20-column schema (adds dropped fields as nulls, casts,
    * reorders — graft.schemas.Schemas.conformTo). `params` carries the
    * search's name/count/language ([[geocodingParams]]).
    */
  def localities(spark: SparkSession, source: RestSource,
      elem: StructType,
      params: Map[String, String] = Map.empty): DataFrame = {
    val raw = flattenJsonArray(spark, source.fetch(params), "results", elem)
    graft.schemas.Schemas.conformTo(graft.schemas.Schemas.locality)(raw)
  }

  /** A2 (extrac_almac.py:21-23): first-row probe — lat/long of the top
    * geocoding result (the API returns relevance-ordered rows).
    */
  def firstLatLong(locs: DataFrame): Option[(Double, Double)] =
    locs.select("latitude", "longitude").head(1).headOption
      .map(r => (r.getDouble(0), r.getDouble(1)))
}
