package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.ops.{RankProp, Sessionize}
import Q.t

/** Round-8 queries: event sessionization, quantized-code retrieval, and
  * integer rank propagation over the near-dup graph — the episode-
  * assembly / serving / graph-curation stages on top of the existing
  * surface. All three are exact: integer microsecond gaps, BIGINT code
  * dots, and ppm fixed-point propagation — no float near any decision.
  */
object GraphQueries {

  // ---------------------------------------------------------------- q85
  // Gap-based sessionization of the event log (6 h inactivity gap):
  // per-session event count, bounds, and exact microsecond duration.
  // One shuffle on user_id; the rollup reuses the window's partitioning.
  private def q85(s: SparkSession, dir: String): DataFrame =
    Sessionize.summary(t(s, dir, "events"), "user_id", "ts", "event_id",
        gapSec = 21600L)
      .orderBy("user_id", "session_idx")

  private val q85Sql =
    Sessionize.summarySql("events", "user_id", "ts", "event_id", 21600L) +
      "\nORDER BY user_id, session_idx"

  // ---------------------------------------------------------------- q86
  // Int8-quantized top-k retrieval: 8 probes ranked against the corpus
  // by EXACT integer code dots (the 4×-bandwidth first stage of the
  // quantize→shortlist→re-rank ANN layout; q51 verifies the codes
  // themselves, this verifies retrieval on them). Probes broadcast, the
  // corpus never shuffles, ≤ k-entry heaps cross the wire.
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.quantizedTopK(emb.filter(col("vec_id") < 8), emb, k = 5)
      .orderBy("probe_id", "rank")
  }

  private val q86Sql = {
    val q = Similarity.quantizeInt8Sql("embedding")
    val idot = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, len(pq)), i -> pq[i] * cq[i])), " +
      "(acc, v) -> acc + v)"
    s"""WITH qe AS MATERIALIZED (
       |  SELECT vec_id, $q AS code FROM embeddings),
       |scored AS MATERIALIZED (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |    (SELECT $idot FROM (SELECT p.code AS pq, c.code AS cq)) AS score
       |  FROM qe p, qe c WHERE p.vec_id < 8),
       |ranked AS (
       |  SELECT probe_id, cand_id, CAST(score AS BIGINT) AS score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY score DESC, cand_id ASC) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, cand_id, score FROM ranked WHERE rank <= 5
       |ORDER BY probe_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q88
  // Two-stage ANN: integer-code shortlist (k·4 candidates) then exact
  // cosine re-rank of the shortlist only — the production quantize →
  // shortlist → re-rank layout end-to-end. Both stages deterministic
  // (integer dots; index-order cosine folds), so the composed ranking
  // replays exactly in the oracle.
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.twoStageTopK(emb.filter(col("vec_id") < 8), emb, k = 5,
        expand = 4)
      .orderBy("probe_id", "rank")
  }

  private val q88Sql = {
    val q = Similarity.quantizeInt8Sql("embedding")
    val idot = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, len(pq)), i -> pq[i] * cq[i])), " +
      "(acc, v) -> acc + v)"
    s"""WITH qe AS MATERIALIZED (
       |  SELECT vec_id, $q AS code FROM embeddings),
       |s1 AS MATERIALIZED (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |    (SELECT $idot FROM (SELECT p.code AS pq, c.code AS cq)) AS qs
       |  FROM qe p, qe c WHERE p.vec_id < 8),
       |short AS (
       |  SELECT probe_id, cand_id FROM (
       |    SELECT probe_id, cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY probe_id
       |        ORDER BY qs DESC, cand_id ASC) AS rn
       |    FROM s1) WHERE rn <= 20),
       |e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |scored AS (
       |  SELECT s.probe_id, s.cand_id,
       |    ${Similarity.cosineSql("p.emb", "c.emb")} AS score
       |  FROM short s JOIN e p ON s.probe_id = p.vec_id
       |    JOIN e c ON s.cand_id = c.vec_id),
       |ranked AS (
       |  SELECT probe_id, cand_id, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY score DESC, cand_id ASC) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, cand_id, score FROM ranked WHERE rank <= 5
       |ORDER BY probe_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q87
  // Rank propagation over the embedding near-dup graph: nodes = vectors,
  // edges = same-LSH-bucket pairs, 3 iterations of ppm fixed-point
  // PageRank — cluster-authority scores for keeper election, exact
  // BIGINT end-to-end. Per iteration one node-keyed shuffle; the edge
  // list and degrees are localCheckpointed once.
  private val RP_PLANES = 8

  private def q87(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val buck = emb.select(col("vec_id"),
      graft.functions.NativeVector.lshBucket(
        Similarity.toDouble(col("embedding")), RP_PLANES).as("bucket"))
    val pairs = buck.as("a").join(buck.as("b"), "bucket")
      .where(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    RankProp.propagate(pairs, "id_a", "id_b", emb, "vec_id", iters = 3)
      .orderBy("vec_id")
  }

  private val q87Sql = {
    val pairsInner =
      s"""SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM (SELECT vec_id, ${Similarity.lshBucketSql(
               "embedding::DOUBLE[]", RP_PLANES)} AS bucket FROM embeddings) a
         |  JOIN (SELECT vec_id, ${Similarity.lshBucketSql(
               "embedding::DOUBLE[]", RP_PLANES)} AS bucket FROM embeddings) b
         |  USING (bucket) WHERE a.vec_id < b.vec_id""".stripMargin
    RankProp.propagateSql(pairsInner, "SELECT vec_id FROM embeddings",
      "vec_id", iters = 3) + "\nORDER BY vec_id"
  }

  // ---------------------------------------------------------------- q89
  // Within-doc repetition filter (Gopher-style): fraction of bigrams /
  // trigrams that repeat inside the same document, plus the keep/drop
  // verdict. Zero shuffle — one codegen'd pass per row on the portable
  // n-gram hashes.
  private def q89(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.repetition(t(s, dir, "documents"), "doc_id", "text",
        dupBigramMax = 0.30, dupTrigramMax = 0.20)
      .orderBy("doc_id")

  private val q89Sql =
    graft.ext.Text.repetitionSql("documents", "doc_id", "text",
      0.30, 0.20) + "\nORDER BY doc_id"

  // ---------------------------------------------------------------- q90
  // Weighted priority sampling: 30 docs per source, inclusion odds ∝
  // doc length (Efraimidis-Spirakis with a deterministic hash draw).
  // Bounded heaps per stratum — only ≤ k entries cross the shuffle.
  private def q90(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sampling.weightedPriority(t(s, dir, "documents"),
        col("source"), "doc_id", col("n_chars"), k = 30)
      .orderBy("stratum", "rank")

  private val q90Sql =
    graft.ext.Sampling.weightedPrioritySql("documents", "source",
      "doc_id", "n_chars", 30) + "\nORDER BY stratum, rank"

  // ---------------------------------------------------------------- q91
  // Corpus-wide kNN graph (SemDeDup building block): every vector's 5
  // nearest same-LSH-bucket neighbors by cosine. Bucket sizes broadcast,
  // candidates equi-join on bucket, ≤ k-entry heaps cross the shuffle.
  //
  // `planes` is left at the PlanesAuto default (round 11): the shipped
  // query carries the occupancy-constant sizing, so the stress probe's
  // scaled corpora no longer hit the pinned-constant truncation cliff.
  // The STATIC oracle must pin a constant, so it uses 4 — which is
  // exactly what autoPlanes resolves to on EVERY gate corpus (counts
  // 0..2,011, all ≤ the 2,048 crossover; next crossover 4→5 planes at
  // 2,049 vectors). A regenerated-bigger testdata would surface as a
  // loud gate hash-mismatch here, not a silent drift.
  private def q91(s: SparkSession, dir: String): DataFrame =
    Similarity.knnGraph(t(s, dir, "embeddings"), k = 5)
      .orderBy("vec_id", "rank")

  private val q91Sql =
    Similarity.knnGraphSql("embeddings", k = 5, planes = 4) +
      "\nORDER BY vec_id, rank"

  // ---------------------------------------------------------------- q92
  // PMI collocation mining: top-30 adjacent word pairs by lift (the
  // monotone inside of PMI), exact BIGINT counts, fixed two-step IEEE
  // division sequence — no engine log anywhere near the ranking.
  private def q92(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.collocations(t(s, dir, "documents"), "text",
        topK = 30, minCount = 5L)
      .orderBy(col("lift").desc, col("gram"))

  private val q92Sql =
    graft.ext.Text.collocationsSql("documents", "text", 30, 5L)
    // collocationsSql already ends in the deterministic ORDER BY + LIMIT

  // ---------------------------------------------------------------- q94
  // Blocked fuzzy key matching over the DISTINCT key dictionary: part
  // names collapse to (name, min partkey) first — the corpus-sized
  // stage, map-side combined — then the Zipf-bounded dictionary is
  // blocked on its last token and paired at Levenshtein ≤ 3. Pure
  // integer DP in both engines; matching rows instead of the dictionary
  // would re-find every exact-dup pair n² times.
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val dict = t(s, dir, "part").groupBy("p_name")
      .agg(min("p_partkey").as("pk"))
    graft.ext.Dedup.fuzzyKeyPairs(dict, "pk", "p_name",
        substring_index(col("p_name"), " ", -1), maxDist = 3)
      .orderBy("id_a", "id_b")
  }

  private val q94Sql =
    graft.ext.Dedup.fuzzyKeyPairsSql(
      "(SELECT p_name, min(p_partkey) AS pk FROM part GROUP BY p_name)",
      "pk", "p_name", "string_split(p_name, ' ')[-1]", maxDist = 3) +
      "\nORDER BY id_a, id_b"

  // ---------------------------------------------------------------- q95
  // Misra–Gries heavy-hitter sketch audit: capacity 16 < the 31-token
  // vocabulary, so partial-map trimming genuinely runs; the surface is
  // the exact top-20 tokens with the three sketch guarantees as derived
  // facts (theorems for ANY partition/merge order — raw est values are
  // order-dependent and never cross the gate).
  private def q95(s: SparkSession, dir: String): DataFrame =
    graft.ext.Freq.heavyHittersAudit(
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token")),
      "token", capacity = 16, topK = 20)

  private val q95Sql =
    graft.ext.Freq.heavyHittersAuditSql(
      "(SELECT unnest(string_split(text, ' ')) AS token FROM documents)",
      "token", 20)

  // ---------------------------------------------------------------- q96
  // GK rank-sketch audit: approx_percentile estimates at five probes
  // over the event values, each checked against its exact rank window
  // (ε = 1/accuracy) — the third sketch family (HLL=distinct, MG=
  // frequent, GK=rank), all gated by guarantee-derived facts.
  private def q96(s: SparkSession, dir: String): DataFrame =
    graft.ext.Freq.quantileAudit(t(s, dir, "events"), "value",
      ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99), accuracy = 100)

  private val q96Sql =
    graft.ext.Freq.quantileAuditSql("events", "value",
      Seq(0.01, 0.25, 0.5, 0.75, 0.99))

  // ---------------------------------------------------------------- q97
  // SemDeDup capstone: kNN graph → cosine-thresholded edges →
  // transitive components (Spark: label propagation; oracle: recursive
  // min-reachable-id — different algorithms, identical clusters) →
  // min-id canonical election with drop counts.
  // planes: PlanesAuto default, same oracle coupling as q91 (the SQL
  // twin pins 4 = what auto resolves to on every gate corpus)
  private def q97(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(t(s, dir, "embeddings"), threshold = 0.35,
        k = 5)
      .orderBy("component")

  private val q97Sql =
    Similarity.semanticDedupSql("embeddings", threshold = 0.35,
      k = 5, planes = 4) + "\nORDER BY component"

  // ---------------------------------------------------------------- q98
  // Streaming trending items: the Misra–Gries sketch as a WINDOWED
  // aggregate inside a real StreamingQuery (complete mode, AvailableNow)
  // — per-hour top event types with fixed-size state per window instead
  // of a per-key count state that grows with cardinality. Capacity 4 <
  // the 5 event types, so eviction genuinely runs inside the state
  // store. Gated like q95: the surface is the exact per-window top-3
  // with the sketch guarantees as derived facts (est values are
  // batch/partition-order-dependent; the guarantees are theorems).
  private def q98(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val cap = 4
    val tmp = Files.createTempDirectory("graft-stream-src")
    try {
      Q.copyTableFiles(Paths.get(s"$dir/events.parquet"), tmp)
      val stream = Q.streamTable(s, tmp.toString)
      val agg = stream
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(graft.functions.FreqSketch.misraGries(col("event_type"), cap)
          .as("sk"))
        .select(col("w.start").as("window_start"), col("sk"))
      // same scoped state-partition floor as q37 (each shuffle partition
      // is a checkpointed state store; 4 is the probed optimum)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Q.streamParts)
      val q =
        try agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName("q98_stream")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      try { q.processAllAvailable() } finally q.stop()
    } finally Q.deleteRecursively(tmp)
    val sketch = s.table("q98_stream")
      .select(col("window_start"), explode(col("sk")))
      .select(col("window_start"), col("col.item").as("event_type"),
        col("col.est").as("est"))
    // exact side (batch) + guarantee facts, over the exact top-3 per
    // window — a deterministic row set whatever the sketch state did
    val exact = t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"))
    val totals = exact.groupBy("window_start")
      .agg(sum("cnt").as("nw"))
    val top3 = exact
      .groupBy("window_start")
      .agg(graft.functions.TopK.topKByScore(col("cnt").cast("double"),
        col("event_type"), 3).as("__top"))
      .select(col("window_start"), explode(col("__top.item"))
        .as("event_type"))
    top3
      .join(exact, Seq("window_start", "event_type"))
      .join(sketch, Seq("window_start", "event_type"), "left")
      .join(totals, Seq("window_start"))
      .select(col("window_start"), col("event_type"), col("cnt"),
        (coalesce(col("est"), lit(0L)) <= col("cnt")).as("no_overcount"),
        ((col("cnt") - coalesce(col("est"), lit(0L)))
          * lit(cap + 1L) <= col("nw")).as("err_bounded"),
        (col("est").isNotNull || col("cnt") * lit(cap + 1L) <= col("nw"))
          .as("covered"))
      .orderBy("window_start", "event_type")
  }

  private val q98Sql =
    """WITH w AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
      |    event_type FROM events),
      |c AS (SELECT ws, event_type, count(*) AS cnt FROM w GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY ws
      |    ORDER BY cnt DESC, event_type) AS rn FROM c)
      |SELECT ws AS window_start, event_type, CAST(cnt AS BIGINT) AS cnt,
      |  TRUE AS no_overcount, TRUE AS err_bounded, TRUE AS covered
      |FROM r WHERE rn <= 3
      |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q99
  // Cross-source vocabulary overlap matrix: per source pair, exact
  // vocab sizes + intersection + Jaccard. Corpus collapses to the
  // distinct (source, token) vocab before anything joins.
  private def q99(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.sourceOverlap(t(s, dir, "documents"))
      .orderBy("src_a", "src_b")

  private val q99Sql =
    graft.ext.Text.sourceOverlapSql("documents", "source", "text") +
      "\nORDER BY src_a, src_b"

  // --------------------------------------------------------------- q100
  // Scale-safe exact per-key ranking: every event ranked within its
  // event type by value (rank + PERCENT_RANK), via the sliced
  // decomposition — a hot type spreads over 16 reducers; the oracle is
  // the single-window formulation the slices must reproduce exactly.
  private def q100(s: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.rankSliced(t(s, dir, "events"), col("event_type"),
        "event_id", col("value"), slices = 16, lo = 0.0, hi = 500.0)
      .orderBy("key", "rank")

  private val q100Sql =
    graft.ops.ScaleOps.rankSlicedSql("events", "event_type", "event_id",
      "value") + "\nORDER BY key, rank"

  // ---------------------------------------------------------------- q93
  // Token-budget water-filling across sources: the fair per-source cap
  // such that Σ min(tokens_s, level) = budget. Integer closed form over
  // the per-source aggregate; windows run on ≤ #sources rows.
  private def q93(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sampling.waterfill(t(s, dir, "documents"), col("source"),
        graft.ext.Text.tokenCount(col("text")).cast("long"),
        budget = 10000L)
      .orderBy("source")

  private val q93Sql =
    graft.ext.Sampling.waterfillSql("documents", "source",
      "len(string_split(text, ' '))", 10000L) + "\nORDER BY source"

  // ---------------------------------------------------------------- q116
  // Episode assembly on q85's sessions: each session's events
  // concatenated in exact (ts, event_id) order into one training
  // sequence — the conversation/interaction-data assembly step.
  // collect_list is admissible HERE because the 6h gap bounds a
  // session; it stays banned for per-key corpus aggregation.
  private def q116(s: SparkSession, dir: String): DataFrame =
    Sessionize.episodes(t(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type", gapSec = 21600L)
      .orderBy("user_id", "session_idx")

  private val q116Sql =
    Sessionize.episodesSql("events", "user_id", "ts", "event_id",
      "event_type", 21600L) + "\nORDER BY user_id, session_idx"

  // ----------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_sessionize" -> (q85 _),
    "q116_episode_assembly" -> (q116 _),
    "q86_quantized_ann" -> (q86 _),
    "q87_rank_propagation" -> (q87 _),
    "q88_twostage_ann" -> (q88 _),
    "q89_repetition_filter" -> (q89 _),
    "q90_weighted_sample" -> (q90 _),
    "q91_knn_graph" -> (q91 _),
    "q92_collocations" -> (q92 _),
    "q93_waterfill_budget" -> (q93 _),
    "q94_fuzzy_key_match" -> (q94 _),
    "q95_heavy_hitters" -> (q95 _),
    "q96_quantile_audit" -> (q96 _),
    "q97_semantic_dedup" -> (q97 _),
    "q98_streaming_trending" -> (q98 _),
    "q99_source_overlap" -> (q99 _),
    "q100_rank_sliced" -> (q100 _))

  val oracles: Map[String, String] = Map(
    "q85_sessionize" -> q85Sql,
    "q116_episode_assembly" -> q116Sql,
    "q86_quantized_ann" -> q86Sql,
    "q87_rank_propagation" -> q87Sql,
    "q88_twostage_ann" -> q88Sql,
    "q89_repetition_filter" -> q89Sql,
    "q90_weighted_sample" -> q90Sql,
    "q91_knn_graph" -> q91Sql,
    "q92_collocations" -> q92Sql,
    "q93_waterfill_budget" -> q93Sql,
    "q94_fuzzy_key_match" -> q94Sql,
    "q95_heavy_hitters" -> q95Sql,
    "q96_quantile_audit" -> q96Sql,
    "q97_semantic_dedup" -> q97Sql,
    "q98_streaming_trending" -> q98Sql,
    "q99_source_overlap" -> q99Sql,
    "q100_rank_sliced" -> q100Sql)
}
