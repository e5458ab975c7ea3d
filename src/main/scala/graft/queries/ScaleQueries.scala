package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.ops.ScaleOps
import Q.t

/** Scale-technique queries: each runs a 100 TB-shaped plan (salting,
  * two-phase agg, sketch-based distinct, mapPartitions batch decode) whose
  * RESULT is still exactly oracle-checkable — the point being that the
  * scale path must not change answers.
  */
object ScaleQueries {

  // ---------------------------------------------------------------- q30
  // Salted two-phase aggregation: hot keys spread over 16 salted partial
  // groups before the final combine. sum/count of integral doubles are
  // order-independent → identical to the plain GROUP BY oracle.
  private def q30(s: SparkSession, dir: String): DataFrame =
    ScaleOps.saltedSum(t(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_quantity", salts = 16, saltSource = Seq("l_orderkey"))
      .orderBy("l_returnflag")

  private val q30Sql =
    """SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q31
  // Salted equi-join: skewed probe side salted, build side replicated per
  // salt. Join multiplicity unchanged → same aggregate as the plain join.
  private def q31(s: SparkSession, dir: String): DataFrame =
    ScaleOps.saltedJoin(
        t(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
        t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
          col("o_orderstatus")),
        Seq("l_orderkey"), salts = 8)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("o_orderstatus")

  private val q31Sql =
    """SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q32
  // Sketch-based distinct counting (HLL++). Estimates are engine-specific
  // → NO oracle entry (driver records the weaker rows-only check); the
  // exact-distinct twin q14 is the hash-checked ground truth.
  private def q32(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02)
        .as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02)
          .as("approx_orders"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q33
  // Multimodal batch decode via mapPartitions (the stubbed-codec
  // pipeline): deterministic fake features, so even this is
  // oracle-checkable — brightness = mean byte value, dims from length.
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeFromText(t(s, dir, "documents"))
    Multimodal.decodeFeatures(media).toDF()
      .withColumn("n_bytes", col("n_bytes").cast("long"))
      .withColumn("resized_w", col("resized_w").cast("long"))
      .withColumn("resized_h", col("resized_h").cast("long"))
      .orderBy("media_id")
  }

  private val q33Sql =
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |  length(text) AS n_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split_regex(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
      |    (a, v) -> a + v) / length(text) AS brightness,
      |  least(64 + length(text) % 512, 224) AS resized_w,
      |  least(48 + length(text) % 384, 224) AS resized_h
      |FROM documents ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q34
  // Scan hygiene: selective filter + narrow projection. The physical plan
  // (graft.Explain) shows PushedFilters on l_shipdate/l_quantity and a
  // 3-column ReadSchema — the scan does the pruning, not the executor.
  private def q34(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01") && col("l_quantity") < 10)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")

  private val q34Sql =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity < 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_salted_agg" -> (q30 _),
    "q31_salted_join" -> (q31 _),
    "q32_approx_distinct_hll" -> (q32 _),
    "q33_multimodal_decode" -> (q33 _),
    "q34_pushdown_scan" -> (q34 _))

  /** q32 intentionally absent: HLL sketches are engine-specific. */
  val oracles: Map[String, String] = Map(
    "q30_salted_agg" -> q30Sql,
    "q31_salted_join" -> q31Sql,
    "q33_multimodal_decode" -> q33Sql,
    "q34_pushdown_scan" -> q34Sql)
}
