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

  /** Join-key skew report — the pre-flight check before a big join or
    * aggregation: the exact top-`topK` heaviest keys, each with its row
    * count, exact ppm share of the table, a skew verdict (count exceeds
    * `factor`× the mean key load, decided by integer cross-product —
    * `cnt·n_keys > factor·total` — so no float touches the verdict), and
    * the salt fan-out that would level it (`ceil(cnt/mean)` buckets,
    * i.e. the explode factor [[graft.queries.ScaleQueries]]'s salted
    * join q31 would need). This is how a 100 TB pipeline *decides* to
    * salt: measure first, pay the build-side explode only on keys that
    * need it.
    *
    * Scale shape: one map-side-combined count per key (the only
    * table-sized shuffle, carrying (key, long) pairs), a 1-row total
    * broadcast back over the counts, and a TakeOrdered top-K — the
    * counts table never globally sorts. All arithmetic is guarded
    * BIGINT: Spark raises on the (astronomically distant) overflow
    * instead of wrapping, mirroring DuckDB's native overflow error.
    */
  def skewAdvisor(df: DataFrame, key: Column, topK: Int = 20,
      factor: Long = 2L): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(factor > 0, s"factor must be positive: $factor")
    val counts = df.groupBy(key.cast("string").as("key_value"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("tot"), count(lit(1)).as("n_keys"))
    // exact integer bounds (Column `/` is double division — lossy at
    // Long.MaxValue scale, so divide in Scala / with DIV instead)
    val fits = col("cnt") <= lit(Long.MaxValue / 1000000L) &&
      col("cnt") <= expr(s"${Long.MaxValue}L DIV n_keys") &&
      col("tot") <= lit(Long.MaxValue / factor)
    counts.crossJoin(broadcast(totals))
      .select(col("key_value"), col("cnt"),
        when(fits, expr("cnt * 1000000 DIV tot")).otherwise(raise_error(
            lit("skewAdvisor: BIGINT overflow — table too large")))
          .as("ppm_share"),
        (col("cnt") * col("n_keys") > lit(factor) * col("tot"))
          .as("is_skewed"),
        expr("(cnt * n_keys + tot - 1) DIV tot").as("salt_buckets"))
      .orderBy(col("cnt").desc, col("key_value"))
      .limit(topK)
  }

  /** DuckDB twin of [[skewAdvisor]]. `sum(cnt)` is HUGEINT there — cast
    * back to BIGINT so the dtype (and the driver's hash) matches Spark.
    */
  def skewAdvisorSql(table: String, keyE: String, topK: Int = 20,
      factor: Long = 2L): String =
    s"""WITH counts AS MATERIALIZED (
       |  SELECT CAST($keyE AS VARCHAR) AS key_value, count(*) AS cnt
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot,
       |  count(*) AS n_keys FROM counts)
       |SELECT key_value, cnt,
       |  cnt * 1000000 // tot AS ppm_share,
       |  cnt * n_keys > $factor * tot AS is_skewed,
       |  (cnt * n_keys + tot - 1) // tot AS salt_buckets
       |FROM counts, tot
       |ORDER BY cnt DESC, key_value LIMIT $topK""".stripMargin

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
