package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, Text}
import Q.t

/** Round-7 corpus-preparation queries: the quality/budget/incremental
  * stages a continuously-ingesting training-data pipeline runs on top of
  * the round-5/6 surface. Each emits exact, cross-engine-deterministic
  * values (integer counts, single double divisions, portable hashes) so
  * the scale-shaped Spark plan hash-matches a plain-SQL DuckDB oracle.
  */
object PrepQueries {

  // ---------------------------------------------------------------- q64
  // Gopher-style top-bigram concentration: per doc, the most frequent
  // word 2-gram and the fraction of 2-gram occurrences it accounts for.
  // Spark computes the argmax as one min(struct(-cnt, gram)) aggregate
  // (two-level, map-side combined, keys include the doc — no hot-key
  // funnel); the oracle uses the equivalent row_number() formulation.
  private def q64(s: SparkSession, dir: String): DataFrame =
    Text.topNgramStats(t(s, dir, "documents"), "doc_id", "text", n = 2)
      .orderBy("doc_id")

  private val q64Sql = {
    val grams = Dedup.wordShinglesSql("text", 2)
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id, unnest($grams) AS gram FROM documents),
       |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g
       |  GROUP BY doc_id, gram),
       |t AS (SELECT doc_id, gram, cnt,
       |  row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cnt DESC, gram) AS rn,
       |  sum(cnt) OVER (PARTITION BY doc_id) AS n_ngrams FROM c),
       |top AS (SELECT * FROM t WHERE rn = 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(top.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       |  coalesce(top.gram, '') AS top_gram,
       |  CAST(coalesce(top.cnt, 0) AS BIGINT) AS top_count,
       |  coalesce(CAST(top.cnt AS DOUBLE) / CAST(top.n_ngrams AS DOUBLE),
       |    0.0) AS top_frac
       |FROM documents d LEFT JOIN top ON d.doc_id = top.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q65
  // CCNet-style familiarity scoring (LM-perplexity stand-in, integer
  // exact): top-16 corpus vocabulary with counts, then per doc the mean
  // corpus frequency of its tokens + OOV count + head/middle/tail
  // bucket. Spark scores with a zero-shuffle literal-map fold; the
  // oracle recomputes the vocabulary in a CTE and joins. Thresholds
  // (550/466 ≈ the sf0.01 quartiles) make all three buckets non-empty.
  private def q65(s: SparkSession, dir: String): DataFrame =
    Text.familiarity(t(s, dir, "documents"), "doc_id", "text",
        topK = 16, headMin = 550.0, tailMax = 466.0)
      .orderBy("doc_id")

  private val q65Sql =
    """WITH tok AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tk
      |  FROM documents),
      |vocab AS MATERIALIZED (
      |  SELECT tk, count(*) AS cnt FROM tok GROUP BY tk
      |  ORDER BY count(*) DESC, tk LIMIT 16),
      |sc AS (SELECT t.doc_id,
      |  count(*) AS n_tokens,
      |  sum(coalesce(v.cnt, 0)) AS mass,
      |  count(*) FILTER (v.cnt IS NULL) AS n_oov
      |  FROM tok t LEFT JOIN vocab v USING (tk) GROUP BY t.doc_id)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(mass AS BIGINT) AS familiarity_mass,
      |  CAST(n_oov AS BIGINT) AS n_oov,
      |  CAST(mass AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |    AS mean_familiarity,
      |  CASE
      |    WHEN CAST(mass AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 550.0
      |      THEN 'head'
      |    WHEN CAST(mass AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 466.0
      |      THEN 'tail'
      |    ELSE 'middle' END AS bucket
      |FROM sc ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q66
  // Token-budget cap per source (quota in TOKENS, not doc counts):
  // admit docs per source in deterministic hash order until 600 tokens
  // are spent. Spark runs the SLICED running sum (per-(key,slice)
  // windows + per-key offsets — a hot source spreads over `slices`
  // reducers); the oracle is the single-window formulation the
  // decomposition must reproduce exactly.
  private def q66(s: SparkSession, dir: String): DataFrame =
    Sampling.budgetPerKey(t(s, dir, "documents"), col("source"), "doc_id",
        Text.tokenCount(col("text")), budget = 600L, slices = 8)
      .orderBy("doc_id")

  private val q66Sql =
    Sampling.budgetPerKeySql("documents", "source", "doc_id",
      "len(string_split(text, ' '))", budget = 600L) +
      "\nORDER BY doc_id"

  // ---------------------------------------------------------------- q67
  // Incremental near-dup: the new batch (doc_id % 3 <> 0) LSH-matched
  // against the already-accepted corpus (doc_id % 3 = 0) — band join is
  // new×seen only, then exact Jaccard verify at 0.2 (same two-phase
  // semantics as q24, restricted to cross-side pairs).
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.incrementalNearDuplicates(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", threshold = 0.2)
      .orderBy("id_new", "id_seen")
  }

  private val q67Sql = {
    val sig = Dedup.minHashSignatureSql("text")
    val bucket = graft.functions.PortableHash.combineSql(
      "sig[band*4+1:band*4+4]")
    s"""WITH seen AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % 3 = 0 AND len(string_split(text, ' ')) >= 3),
       |newb AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % 3 <> 0 AND len(string_split(text, ' ')) >= 3),
       |sig_s AS MATERIALIZED (SELECT doc_id, $sig AS sig FROM seen),
       |sig_n AS MATERIALIZED (SELECT doc_id, $sig AS sig FROM newb),
       |band_s AS MATERIALIZED (SELECT doc_id, band, $bucket AS bucket
       |  FROM sig_s, range(4) t(band)),
       |band_n AS MATERIALIZED (SELECT doc_id, band, $bucket AS bucket
       |  FROM sig_n, range(4) t(band)),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT n.doc_id AS id_new, s.doc_id AS id_seen
       |  FROM band_n n JOIN band_s s USING (band, bucket))
       |SELECT id_new, id_seen,
       |  ${Dedup.ngramJaccardSql("dn.text", "ds.text")} AS jaccard
       |FROM pairs
       |JOIN documents dn ON dn.doc_id = id_new
       |JOIN documents ds ON ds.doc_id = id_seen
       |WHERE ${Dedup.ngramJaccardSql("dn.text", "ds.text")} >= 0.2
       |ORDER BY id_new, id_seen""".stripMargin
  }

  // ----------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_top_ngram_frac" -> (q64 _),
    "q65_familiarity" -> (q65 _),
    "q66_token_budget_cap" -> (q66 _),
    "q67_incremental_neardup" -> (q67 _))

  val oracles: Map[String, String] = Map(
    "q64_top_ngram_frac" -> q64Sql,
    "q65_familiarity" -> q65Sql,
    "q66_token_budget_cap" -> q66Sql,
    "q67_incremental_neardup" -> q67Sql)
}
