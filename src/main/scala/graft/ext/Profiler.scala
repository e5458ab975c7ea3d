package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality gate a corpus passes
  * before a training run (null rates, cardinalities, value ranges per
  * column, to catch schema drift / degenerate fields early).
  *
  * Every statistic for every column is computed in ONE aggregate over
  * ONE scan: the per-column results land in a single wide row, which is
  * then unpivoted to `(col_name, stats...)` rows by a per-row
  * `explode(array(struct...))` — no second scan, no shuffle beyond the
  * aggregate's partial-merge (bytes ∝ #columns, not #rows).
  *
  * Two cardinality modes:
  *  - [[profile]] uses exact `countDistinct`: Spark plans ONE scan with
  *    an Expand (each row duplicated per distinct-column) — fine for
  *    verification and modest column counts.
  *  - [[approxProfile]] uses HLL `approx_count_distinct`: genuinely
  *    single-pass, no Expand — the 100 TB default.
  *
  * min/max are cast to string for a uniform output schema; callers
  * profiling float/timestamp columns should note engine string formats
  * differ — the oracle-checked q54 profiles integer/string columns.
  */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    run(df, columns, c => countDistinct(col(c)))

  def approxProfile(df: DataFrame, columns: Seq[String],
      rsd: Double = 0.05): DataFrame =
    run(df, columns, c => approx_count_distinct(col(c), rsd))

  private def run(df: DataFrame, columns: Seq[String],
      distinct: String => Column): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        distinct(c).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(columns.map(c => struct(
          lit(c).as("col_name"),
          col(s"__cnt_$c").as("n_nonnull"),
          coalesce(col(s"__null_$c"), lit(0L)).as("n_nulls"),
          col(s"__dist_$c").as("n_distinct"),
          col(s"__min_$c").as("min_value"),
          col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** DuckDB twin of [[profile]] for one column (UNION ALL per column). */
  def profileColSql(table: String, c: String): String =
    s"""SELECT '$c' AS col_name,
       |  count($c) AS n_nonnull,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_value,
       |  CAST(max($c) AS VARCHAR) AS max_value
       |FROM $table""".stripMargin

  def profileSql(table: String, columns: Seq[String]): String =
    columns.map(profileColSql(table, _)).mkString("", "\nUNION ALL\n", "")
}
