package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; each has a DuckDB oracle twin.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference transform pipeline (SURVEY.md §3.3) mapped onto
    * events ⟕ customer.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_flagship_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.all ++ graft.queries.ExtQueries.all ++
      graft.queries.ScaleQueries.all ++ graft.queries.PrepQueries.all ++
      graft.queries.GraphQueries.all ++ graft.queries.DeltaQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++ graft.queries.ExtQueries.oracles ++
      graft.queries.ScaleQueries.oracles ++ graft.queries.PrepQueries.oracles ++
      graft.queries.GraphQueries.oracles ++ graft.queries.DeltaQueries.oracles
}
