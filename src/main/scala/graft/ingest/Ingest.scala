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

object Ingest {

  /** S8 (main.py:210,239): nested JSON object → flat columns.
    * `json_normalize(dic["current"])` ≡ parse + `select("current.*")` —
    * a Catalyst `JsonToStructs`, fully codegen'd.
    */
  def flattenJson(spark: SparkSession, body: String, field: String,
      schema: StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(new StructType().add(field, schema))
      .json(Seq(body).toDS)
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
      .json(Seq(body).toDS)
      .select(explode(col(field)).as("r"))
      .select(col("r.*"))
  }

  /** Weather record ingest (main.py:201-217): flatten the `current`
    * object, parse `time`, inject the partition date (D5, "MM-dd-yy") and
    * the locality id (P6).
    */
  def weatherRecord(spark: SparkSession, source: RestSource, apiLocId: Long,
      schema: StructType): DataFrame =
    flattenJson(spark, source.fetch(Map.empty), "current", schema)
      .withColumn("time", to_timestamp(col("time")))
      .withColumn("fecha_partic", date_format(col("time"), "MM-dd-yy"))
      .withColumn("api_loc_id", lit(apiLocId))

  /** Locality ingest (main.py:226-263): flatten `results`, then conform to
    * the canonical 20-column schema (adds dropped fields as nulls, casts,
    * reorders — graft.schemas.Schemas.conformTo).
    */
  def localities(spark: SparkSession, source: RestSource,
      elem: StructType): DataFrame = {
    val raw = flattenJsonArray(spark, source.fetch(Map.empty), "results", elem)
    graft.schemas.Schemas.conformTo(graft.schemas.Schemas.locality)(raw)
  }

  /** A2 (extrac_almac.py:21-23): first-row probe — lat/long of the top
    * geocoding result (the API returns relevance-ordered rows).
    */
  def firstLatLong(locs: DataFrame): Option[(Double, Double)] =
    locs.select("latitude", "longitude").head(1).headOption
      .map(r => (r.getDouble(0), r.getDouble(1)))
}
