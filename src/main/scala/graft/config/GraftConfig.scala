package graft.config

/** Typed configuration — the Spark-native replacement for the reference's
  * `config.ini` + ConfigParser (S13, main.py:164-166, 338-345). Case
  * classes with defaults; secrets come from the environment, never from
  * source (the reference keeps DB credentials in an ini file —
  * deliberately not replicated).
  */
final case class LakeConfig(
    root: String = "data_lake",
    factTable: String = "regmeteor",
    dimTable: String = "localid",
    partitionCol: String = "fecha_partic",
    timeCol: String = "time") {
  def factDir: String = s"$root/$factTable"
  def dimPath: String = s"$root/$dimTable/localidades.parquet"
}

final case class SourceConfig(
    weatherEndpoint: String = "",
    geocodingEndpoint: String = "",
    pollIntervalSec: Long = 900, // API model cadence, README.md:57
    geocodingBatch: Int = 10)

final case class WarehouseConfig(
    database: String = "warehouse",
    meteorTable: String = "meteor_proc",
    locTable: String = "loc_proc",
    stageSuffix: String = "_stg")

final case class GraftConfig(
    lake: LakeConfig = LakeConfig(),
    source: SourceConfig = SourceConfig(),
    warehouse: WarehouseConfig = WarehouseConfig())

object GraftConfig {
  /** Environment-variable overrides (GRAFT_LAKE_ROOT, GRAFT_WH_DB). */
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig =
    GraftConfig(
      lake = LakeConfig(root = env.getOrElse("GRAFT_LAKE_ROOT", "data_lake")),
      source = SourceConfig(
        weatherEndpoint = env.getOrElse("GRAFT_WEATHER_URL", ""),
        geocodingEndpoint = env.getOrElse("GRAFT_GEOCODING_URL", "")),
      warehouse = WarehouseConfig(
        database = env.getOrElse("GRAFT_WH_DB", "warehouse")))
}
