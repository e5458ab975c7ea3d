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
  // Sketch-based distinct counting (HLL++). Raw estimates are
  // engine-specific, so the query emits engine-independent DERIVED facts
  // instead: the exact distinct counts plus a boolean per sketch asserting
  // |approx−exact|/exact ≤ 2·rsd. The oracle computes the same exact
  // counts and literal TRUEs — a sketch outside its advertised error bound
  // fails the hash compare.
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val rsd = 0.02
    val est = t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), rsd).as("approx_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
    def ok(approx: String, exact: String) =
      abs(col(approx).cast("double") - col(exact).cast("double")) /
        col(exact).cast("double") <= lit(2 * rsd)
    est.select(col("l_returnflag"),
        col("exact_parts"), col("exact_orders"),
        ok("approx_parts", "exact_parts").as("parts_within_tol"),
        ok("approx_orders", "exact_orders").as("orders_within_tol"))
      .orderBy("l_returnflag")
  }

  private val q32Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  true AS parts_within_tol,
      |  true AS orders_within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q33
  // Multimodal batch decode via mapPartitions — REAL end-to-end: each doc
  // id becomes a genuine PNG/BMP payload (JDK ImageIO encode of a
  // deterministic gray pattern), decoded back with ImageIO.read; decoded
  // width/height/mean-pixel and a true nearest-neighbor resize are
  // oracle-checked arithmetically (both formats are lossless, so decoded
  // samples equal the synthesis formula exactly).
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeImages(t(s, dir, "documents"))
    // target 4×3: smaller than most synthesized dims, so the resample
    // path is genuinely exercised, not an identity copy
    Multimodal.decodeImages(media, targetW = 4, targetH = 3).toDF()
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .withColumn("resized_w", col("resized_w").cast("long"))
      .withColumn("resized_h", col("resized_h").cast("long"))
      .orderBy("media_id")
  }

  private val q33Sql =
    """WITH dims AS MATERIALIZED (
      |  SELECT doc_id, doc_id % 7 + 2 AS w, doc_id % 5 + 2 AS h,
      |    least(doc_id % 7 + 2, 4) AS rw, least(doc_id % 5 + 2, 3) AS rh
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
      |  w AS width, h AS height, w * h AS n_pixels,
      |  list_sum(flatten(list_transform(generate_series(0, h-1), y ->
      |    list_transform(generate_series(0, w-1), x ->
      |      (doc_id*31 + x*7 + y*13) % 256)))) / (w * h) AS brightness,
      |  rw AS resized_w, rh AS resized_h,
      |  list_sum(flatten(list_transform(generate_series(0, rh-1), y ->
      |    list_transform(generate_series(0, rw-1), x ->
      |      (doc_id*31 + ((x*w)//rw)*7 + ((y*h)//rh)*13) % 256)))) / (rw * rh)
      |    AS resized_brightness
      |FROM dims ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q125
  // Multimodal retrieval capstone: REAL image decode (ImageIO over
  // genuine PNG/BMP payloads) → 2×2 quadrant-brightness embedding →
  // exact cosine top-5 per probe. The oracle recomputes the features
  // ARITHMETICALLY from the synthesis formula, so a decode error
  // anywhere in the pipeline breaks the hash — the decode path is
  // verified through the retrieval geometry, not just summary stats.
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeImages(t(s, dir, "documents"))
    val feats = Multimodal.imageFeatures(media)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    graft.ext.Similarity.bruteForceTopK(
        feats.filter(col("vec_id") < 3), feats, k = 5)
      .orderBy("probe_id", "rank")
  }

  private val q125Sql = {
    def qSum(xlo: String, xhi: String, ylo: String, yhi: String) =
      s"CAST(coalesce(list_sum(flatten(list_transform(" +
        s"generate_series($ylo, $yhi), y -> list_transform(" +
        s"generate_series($xlo, $xhi), x -> " +
        s"(doc_id*31 + x*7 + y*13) % 256)))), 0) AS DOUBLE)"
    val cos = graft.ext.Similarity.cosineSql("p.emb", "c.emb")
    s"""WITH dims AS MATERIALIZED (
       |  SELECT doc_id, doc_id % 7 + 2 AS w, doc_id % 5 + 2 AS h
       |  FROM documents),
       |f AS MATERIALIZED (
       |  SELECT doc_id AS vec_id,
       |    [${qSum("0", "w//2 - 1", "0", "h//2 - 1")},
       |     ${qSum("w//2", "w - 1", "0", "h//2 - 1")},
       |     ${qSum("0", "w//2 - 1", "h//2", "h - 1")},
       |     ${qSum("w//2", "w - 1", "h//2", "h - 1")}] AS emb
       |  FROM dims),
       |scored AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, $cos AS score
       |  FROM f p, f c WHERE p.vec_id < 3),
       |ranked AS (
       |  SELECT probe_id, cand_id, score,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY score DESC, cand_id ASC) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, cand_id, score FROM ranked WHERE rank <= 5
       |ORDER BY probe_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q127
  // Rolling time-RANGE aggregate: per user, the exact-cents sum and
  // count of their events in the trailing 48 h at every event (velocity
  // / exposure features). RANGE peers aggregate identically however
  // ties sort — which is what makes the window deterministic enough to
  // hash-compare.
  private def q127(s: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.rollingTimeAgg(t(s, dir, "events"),
        col("user_id"), col("ts"), col("value"), windowSec = 172800L)
      .orderBy("key", "t_us")

  private val q127Sql =
    s"""${graft.ops.ScaleOps.rollingTimeAggSql("events", "user_id", "ts",
          "value", 172800L)}
       |ORDER BY key, t_us""".stripMargin

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

  // ---------------------------------------------------------------- q35
  // Corpus token frequencies: explode → two-level hash agg, top-50 by
  // occurrence (full tiebreak on token).
  private def q35(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.tokenFrequencies(t(s, dir, "documents"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(50)

  private val q35Sql =
    """WITH tok AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents)
      |SELECT token, count(*) AS n_occurrences,
      |  count(DISTINCT doc_id) AS n_docs
      |FROM tok GROUP BY token
      |ORDER BY n_occurrences DESC, token ASC LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q36
  // TF-IDF top-3 tokens per doc (linear idf keeps it bit-exact: no ln()).
  private def q36(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.tfidfTopK(t(s, dir, "documents"), k = 3)
      .orderBy("doc_id", "rank")

  private val q36Sql =
    """WITH tok AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |n AS MATERIALIZED (SELECT count(*) AS n_docs_total FROM documents),
      |tf AS MATERIALIZED (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS MATERIALIZED (
      |  SELECT token, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
      |scored AS MATERIALIZED (
      |  SELECT doc_id, token, tf, df,
      |    CAST(tf AS DOUBLE) * (CAST(n_docs_total AS DOUBLE) / CAST(df AS DOUBLE)) AS score
      |  FROM tf JOIN dfreq USING (token), n),
      |ranked AS MATERIALIZED (
      |  SELECT doc_id, token, tf, df, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, token ASC) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, token, tf, df, score FROM ranked
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- q37
  // Structured Streaming, verified: the events file replayed through a
  // real StreamingQuery (complete-mode windowed aggregate, AvailableNow
  // trigger) must equal the batch oracle — streaming and batch semantics
  // coincide on bounded input.
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft-stream-src")
    try {
      Q.copyTableFiles(Paths.get(s"$dir/events.parquet"), tmp)
      val stream = Q.streamTable(s, tmp.toString)
      val agg = stream
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(Q.centsSafe(col("value"))).as("value_cents"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("value_cents"))
      // a handful of state partitions is plenty for this stream; each
      // shuffle partition becomes a checkpointed state store (init+fsync
      // dominates small streams). Scoped: restored right after start.
      // Floor probed (sf0.1, reps=5 minima): 4 partitions+HDFS store
      // 1.39 s, 1 partition 2.53 s (replay loses parallelism), RocksDB
      // provider 2.34 s (JNI store init per partition) — the current
      // shape IS the floor; the ~1.4 s is checkpoint/state lifecycle,
      // the price of verifying a real StreamingQuery, not plan cost.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Q.streamParts)
      val q =
        try agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName("q37_stream")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      try { q.processAllAvailable() } finally q.stop()
    } finally Q.deleteRecursively(tmp)
    // the memory sink holds the complete-mode result in the session —
    // reading it no longer touches the (deleted) source copy
    s.table("q37_stream").orderBy("window_start", "event_type")
  }

  private val q37Sql =
    s"""SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(${Q.centsSafeSql("value")}) AS BIGINT) AS value_cents
      |FROM events GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q39
  // Custom-state sessionization (flatMapGroupsWithState) verified against
  // a declarative SQL twin (lag → gap flag → running session id → group):
  // the imperative state machine and the window algebra must agree row
  // for row. 30-minute gap; totals in integer cents for exactness.
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("value"))
      .as[graft.streaming.Streams.Ev]
    graft.streaming.Streams.sessionizeBatch(evs, gapMs = 30 * 60 * 1000L)
      .toDF()
      .orderBy("user_id", "session_id")
  }

  private val q39Sql =
    s"""WITH e AS MATERIALIZED (
      |  SELECT user_id, ts,
      |    coalesce(${Q.centsSafeSql("value")}, 0) AS cents
      |  FROM events),
      |flags AS MATERIALIZED (
      |  SELECT user_id, ts, cents,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
      |        ORDER BY ts ASC, cents ASC) > INTERVAL 30 MINUTES
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |sess AS MATERIALIZED (
      |  SELECT user_id, cents,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, cents ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM flags)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q38
  // IVF ANN: k-means cells + nProbe cell search + exact re-rank, against
  // a session-cached prebuilt index (IvfIndex.cached — the build is one
  // KMeans job per corpus, not per query). K-means isn't
  // SQL-reproducible, so the query emits engine-independent DERIVED
  // facts: per probe, recall@10 of the IVF search against the in-Spark
  // brute-force ground truth (q26's exact path) plus the self-hit
  // invariant (rank-1 must be the probe itself, cosine 1). The oracle is
  // the expected-facts row: 10 true neighbors, self-hit, recall above
  // threshold.
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    // applicationId can't alias a stopped context (identity hashes can be
    // reused after GC); blocks are app-scoped so the key matches their life
    val idx = graft.ext.Similarity.IvfIndex.cached(
      s"${s.sparkContext.applicationId}:$dir/embeddings", emb)
    // nProbe=6/16 cells: measured recall@10 ∈ [0.7, 1.0] per probe at
    // sf0.01 and sf0.1 (deterministic — seeded k-means) → 0.5 threshold
    // has a two-neighbor margin.
    val ivf = idx.search(probes, k = 10, nProbe = 6)
    val brute = graft.ext.Similarity.bruteForceTopK(probes, emb, k = 10)
    val retrieved = ivf.select(col("probe_id"), col("cand_id"),
      (col("rank") === 1L && col("cand_id") === col("probe_id"))
        .as("self_hit"))
    brute.select(col("probe_id"), col("cand_id"))
      .join(retrieved, Seq("probe_id", "cand_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_true"),
        (sum(when(col("self_hit").isNotNull, 1L).otherwise(0L)) /
          count(lit(1))).as("recall"),
        max(coalesce(col("self_hit"), lit(false))).as("self_hit"))
      .select(col("probe_id"), col("n_true"),
        (col("recall") >= lit(0.5)).as("recall_ok"), col("self_hit"))
      .orderBy("probe_id")
  }

  // self_hit replays the engine's exact tie-break (score DESC, cand_id
  // ASC): the probe holds rank 1 unless some OTHER vector beats its
  // self-cosine, or ties it with a smaller id. On a well-separated
  // corpus that reduces to plain "self wins"; on a duplicate-heavy one
  // (the all-identical `dup` gate; the fuzz corpus's exact scaled copy,
  // whose cosine is BIT-equal to the self-cosine — sqrt(4x) = 2*sqrt(x)
  // and the fold scales exactly) the smallest-id member of the
  // cosine-tied class wins, and the oracle must predict that, not
  // assert a self-hit that tie-breaking genuinely denies.
  private val q38Sql = {
    val cosAP = graft.ext.Similarity.cosineSql("a.ae", "p.pe")
    val cosPP = graft.ext.Similarity.cosineSql("p.pe", "p.pe")
    // scores materialize through a join (not a correlated EXISTS):
    // DuckDB lambdas cannot capture correlated outer columns
    s"""WITH p AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pe
       |  FROM embeddings WHERE vec_id < 5),
       |a AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ae
       |  FROM embeddings),
       |sc AS (SELECT p.vec_id AS pid, a.vec_id AS aid,
       |    $cosAP AS s, $cosPP AS cs
       |  FROM p CROSS JOIN a)
       |SELECT pid AS probe_id,
       |  least(CAST(10 AS BIGINT),
       |    (SELECT count(*) FROM embeddings)) AS n_true,
       |  true AS recall_ok,
       |  count(*) FILTER (WHERE aid <> pid AND
       |    (s > cs OR (s = cs AND aid < pid))) = 0 AS self_hit
       |FROM sc GROUP BY pid ORDER BY probe_id""".stripMargin
  }

  // ---------------------------------------------------------------- q40
  // As-of join (composed, SURVEY-preference (a)): each purchase event
  // matched to the user's latest click at-or-before it. Oracle = DuckDB's
  // native ASOF LEFT JOIN — two entirely different formulations must
  // agree row for row.
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max("event_id").as("click_event_id")) // unique per (key, time)
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    graft.ops.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "click_ts")
      .select("event_id", "user_id", "ts", "click_ts", "click_event_id")
      .orderBy("event_id")
  }

  private val q40Sql =
    """WITH clicks AS MATERIALIZED (
      |  SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |purch AS MATERIALIZED (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_event_id
      |FROM purch p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q41
  // Range join (bucket-decomposed): purchases inside any [click,
  // click+10min] window of the same user. Oracle = the plain BETWEEN
  // non-equi join — the scalable bucket plan must produce identical
  // pairs.
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val windows = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_event_id"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("win_end"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    graft.ops.RangeJoin.pointInInterval(purchases, windows, "user_id",
        "ts", "win_start", "win_end", bucketMicros = 10L * 60 * 1000000)
      .select("event_id", "click_event_id", "user_id")
      .orderBy("event_id", "click_event_id")
  }

  private val q41Sql =
    """WITH w AS MATERIALIZED (
      |  SELECT user_id, event_id AS click_event_id, ts AS win_start,
      |    ts + INTERVAL 10 MINUTES AS win_end
      |  FROM events WHERE event_type = 'click'),
      |p AS MATERIALIZED (
      |  SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, w.click_event_id, p.user_id
      |FROM p JOIN w ON p.user_id = w.user_id
      |  AND p.ts >= w.win_start AND p.ts <= w.win_end
      |ORDER BY p.event_id, w.click_event_id""".stripMargin

  // ---------------------------------------------------------------- q44
  // Skew-safe as-of join: the q40 semantics through AsOfJoin.asOfSliced
  // (windows partitioned by (key, 1-hour time slice) + slice-spine carry,
  // so one hot user cannot funnel onto one reducer). Same DuckDB ASOF
  // oracle as q40 — the sliced plan must not change a single match.
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max("event_id").as("click_event_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    graft.ops.AsOfJoin.asOfSliced(purchases, clicks, "user_id", "ts",
        "click_ts", sliceSeconds = 3600L)
      .select("event_id", "user_id", "ts", "click_ts", "click_event_id")
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q45
  // Lake schema evolution on read: two generations of a dimension are
  // written under one lake dir — the old generation predates n_regionkey
  // — and DataLake.readMerged (mergeSchema) surfaces old rows with null
  // for the missing column. Oracle computes the same union from the
  // source table directly.
  // NOTE on the bench number: the two fixture writes below run inside the
  // query body, so q45's measured time is ~2/3 write side-effect, not
  // read-path cost — it benchmarks the end-to-end evolution round-trip,
  // not readMerged alone.
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation")
    val lakeDir = java.nio.file.Files.createTempDirectory("graft_q45_lake")
    val lake = lakeDir.toString
    try {
      nation.select("n_nationkey", "n_name")
        .write.parquet(lake + "/gen=old")
      nation.select("n_nationkey", "n_name", "n_regionkey")
        .write.parquet(lake + "/gen=new")
      graft.lake.DataLake.readMerged(s, lake).get
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
          col("gen"))
        .orderBy("gen", "n_nationkey")
        // materialize (eager) so the fixture lake can be deleted before
        // returning — the result must not depend on the temp dir
        .localCheckpoint(true)
    } finally Q.deleteRecursively(lakeDir)
  }

  private val q45Sql =
    """SELECT n_nationkey, n_name, n_regionkey, 'new' AS gen FROM nation
      |UNION ALL
      |SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey,
      |  'old' AS gen FROM nation
      |ORDER BY gen, n_nationkey""".stripMargin

  // ---------------------------------------------------------------- q46
  // Bloom-prefiltered exact anti join — the incremental-dedup gate
  // ("drop rows whose key is in the seen set") with the 100 TB shuffle
  // fix: rows failing the distributed-built bloom skip the anti join
  // entirely; only mightContain hits (matches + fpp noise) shuffle. The
  // result is exact, so the oracle is the plain NOT EXISTS.
  // expectedItems ~2x the sf0.1 seen-set: oversizing costs real time
  // (bitmap bytes scale with it, and 32 partition bitmaps merge at the
  // driver) — 1<<21 measured 1.79 s vs 0.86 s at 1<<18.
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val seen = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    graft.ops.BloomJoin.antiJoin(
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
        seen, "l_orderkey", expectedItems = 1L << 18, fpp = 0.01)
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q46Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q47
  // Deterministic stratified sampling — the training-data mixer stage.
  // Keep-decision is a portable per-row hash predicate (zero shuffle,
  // reproducible across engines/runs/cluster sizes), so the DuckDB
  // oracle selects the IDENTICAL rows, not just the same count.
  private val q47Rates = Map("en" -> 0.8, "de" -> 0.5, "zh" -> 0.25)

  private def q47(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sampling.stratified(
        t(s, dir, "documents").select("doc_id", "lang", "source", "n_chars"),
        key = col("doc_id"), strata = col("lang"),
        rates = q47Rates, defaultRate = 0.1)
      .orderBy("doc_id")

  private val q47Sql =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE ${graft.ext.Sampling.stratifiedSql("doc_id", "lang", q47Rates, 0.1)}
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q48
  // Context-window chunking: every doc becomes overlapping 32-token
  // windows (stride 24) — the sequence-prep stage before training or
  // embedding. Pure per-row explode + array slicing, zero shuffle; the
  // oracle re-derives every chunk string byte-for-byte.
  private def q48(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.chunkTokens(t(s, dir, "documents"),
        size = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id")

  private val q48Sql =
    graft.ext.Text.chunkTokensSql("documents", "doc_id", "text", 32, 8) +
      "\nORDER BY doc_id, chunk_id"

  // ---------------------------------------------------------------- q50
  // Greedy sequence packing: documents hash-sharded 16 ways, each shard
  // packed into ≤256-token bins in doc_id order — Spark runs the
  // secondary-sort mapPartitions fold; the oracle replays the identical
  // sequential semantics with a recursive CTE. Deterministic bin ids,
  // any cluster size.
  private def q50(s: SparkSession, dir: String): DataFrame =
    graft.ext.Packing.packGreedy(
        t(s, dir, "documents")
          .select(pmod(col("doc_id"), lit(16)).as("shard"),
            col("doc_id"),
            graft.ext.Text.tokenCount(col("text")).as("n_tok")),
        "shard", "doc_id", "n_tok", budget = 256L)
      .toDF()
      .orderBy("shard", "id")

  private val q50Sql =
    graft.ext.Packing.packGreedySql(
      """SELECT doc_id % 16 AS shard, doc_id AS id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents""".stripMargin, budget = 256L) +
      "\nORDER BY shard, id"

  // ---------------------------------------------------------------- q52
  // Multimodal audio, REAL end-to-end: each doc id becomes a complete
  // valid WAV file (RIFF header + 8-bit PCM — pure byte math, no codec
  // needed), and decodeAudio genuinely parses the container (magic
  // validation + chunk walk) before extracting all-integer features the
  // oracle reproduces arithmetically, incl. the every-4th-sample
  // decimation (audio downsampling op).
  private def q52(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudio(
        Multimodal.synthesizeAudio(t(s, dir, "documents")))
      .toDF()
      .withColumn("sample_rate", col("sample_rate").cast("long"))
      .withColumn("bits_per_sample", col("bits_per_sample").cast("long"))
      .withColumn("max_sample", col("max_sample").cast("long"))
      .orderBy("media_id")

  private val q52Sql =
    """WITH a AS MATERIALIZED (
      |  SELECT doc_id, doc_id % 50 + 10 AS n FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(8 AS BIGINT) AS bits_per_sample,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(list_sum(list_transform(generate_series(0, n-1), i ->
      |    (doc_id*17 + i*29) % 256)) AS BIGINT) AS sum_samples,
      |  list_max(list_transform(generate_series(0, n-1), i ->
      |    (doc_id*17 + i*29) % 256)) AS max_sample,
      |  CAST(n AS BIGINT) * 1000000 // 8000 AS duration_us,
      |  CAST(list_sum(list_transform(generate_series(0, n-1, 4), i ->
      |    (doc_id*17 + i*29) % 256)) AS BIGINT) AS decim_sum
      |FROM a ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q53
  // Multimodal video, REAL end-to-end: each doc id becomes a genuine
  // YUV4MPEG2 stream (text header + raw mono luma frames — codec-free),
  // decodeVideo parses header tags and walks FRAME markers, and the
  // sampled_luma column is the frame-sampling op (every 2nd frame).
  // All-integer features, pure-arithmetic oracle.
  private def q53(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeVideo(
        Multimodal.synthesizeVideo(t(s, dir, "documents")), frameStride = 2)
      .toDF()
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .orderBy("media_id")

  private val q53Sql =
    """WITH v AS MATERIALIZED (
      |  SELECT doc_id, doc_id % 4 * 2 + 2 AS w, doc_id % 3 * 2 + 2 AS h,
      |    doc_id % 5 + 2 AS nf
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, w, h, nf, unnest(generate_series(0, nf-1)) AS fr
      |  FROM v),
      |fl AS MATERIALIZED (
      |  SELECT doc_id, w, h, nf, fr,
      |    list_sum(flatten(list_transform(generate_series(0, h-1), y ->
      |      list_transform(generate_series(0, w-1), x ->
      |        (doc_id*7 + fr*11 + x*3 + y*5) % 256)))) AS luma
      |  FROM f)
      |SELECT doc_id AS media_id,
      |  CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
      |  CAST(max(nf) AS BIGINT) AS n_frames,
      |  CAST(max(nf) AS BIGINT) * 1000000 // 25 AS duration_us,
      |  CAST(sum(luma) AS BIGINT) AS total_luma,
      |  CAST(sum(CASE WHEN fr % 2 = 0 THEN luma ELSE 0 END) AS BIGINT)
      |    AS sampled_luma
      |FROM fl GROUP BY doc_id ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q54
  // One-pass column profiling (the pre-training data-quality gate):
  // counts, null counts, exact cardinalities and min/max for four
  // columns of orders from a single aggregate over a single scan,
  // unpivoted per-row. Oracle recomputes the same stats per column.
  private val q54Cols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  private def q54(s: SparkSession, dir: String): DataFrame =
    graft.ext.Profiler.profile(t(s, dir, "orders"), q54Cols)
      .orderBy("col_name")

  private val q54Sql =
    graft.ext.Profiler.profileSql("orders", q54Cols) +
      "\nORDER BY col_name"

  // ---------------------------------------------------------------- q55
  // Benchmark decontamination: docs with doc_id % 97 == 0 play the eval
  // set; any corpus doc sharing a 4-token n-gram with them is dropped.
  // Benchmark grams broadcast; no corpus byte shuffles (the only
  // exchange is the distinct over contaminated ids).
  private def q55(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(s, dir, "documents")
    graft.ext.Dedup.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 4)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  private val q55Sql = {
    val grams = graft.ext.Dedup.wordShinglesSql("text", 4)
    s"""WITH bench AS (SELECT * FROM documents WHERE doc_id % 97 = 0),
       |bg AS (SELECT DISTINCT unnest($grams) AS gram FROM bench),
       |corpus AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
       |cg AS (SELECT doc_id, unnest($grams) AS gram FROM corpus),
       |bad AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram))
       |SELECT doc_id, lang, source, n_chars
       |FROM corpus ANTI JOIN bad USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q56
  // Temperature-flattened mixture resampling over `lang` (en is 3× the
  // other languages in the testdata): the head language keeps the base
  // rate, rare ones keep sqrt(n_max/n_s)× more. Rates derive in-plan
  // from exact counts + IEEE sqrt — bit-identical across engines.
  private def q56(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.ext.Sampling.temperatureMix(
        t(s, dir, "documents"), col("doc_id"), col("lang"), baseRate = 0.3)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  private val q56Sql = {
    import graft.ext.Sampling
    import graft.functions.PortableHash.P
    val rate = Sampling.temperatureRateSql(0.3, "n_s", "n_max")
    val h = Sampling.sampleHashSql("CAST(doc_id AS VARCHAR)")
    s"""WITH n AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
       |m AS (SELECT max(n_s) AS n_max FROM n),
       |r AS (SELECT lang, $rate AS rate FROM n, m)
       |SELECT doc_id, lang, source, n_chars
       |FROM documents JOIN r USING (lang)
       |WHERE CAST($h AS DOUBLE) < rate * CAST($P AS DOUBLE)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q57
  // Repetition-aware quality gate: per-doc structural metrics + one
  // boolean per rule + overall keep decision (exact integer counts, one
  // double division per ratio).
  private def q57(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.qualityRules(t(s, dir, "documents"))
      .orderBy("doc_id")

  private val q57Sql = {
    val grams3 = graft.ext.Dedup.wordShinglesSql("text", 3)
    s"""WITH m AS MATERIALIZED (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  (CAST(length(text) AS DOUBLE) -
       |    (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1.0)) /
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS unique_ratio,
       |  coalesce(1.0 - CAST(len(list_distinct($grams3)) AS DOUBLE) /
       |    NULLIF(CAST(len($grams3) AS DOUBLE), 0.0), 0.0) AS dup_3gram_ratio
       |FROM documents)
       |SELECT doc_id, n_tokens, mean_token_len, unique_ratio,
       |  dup_3gram_ratio,
       |  n_tokens >= 30 AND n_tokens <= 10000 AS len_ok,
       |  mean_token_len >= 2.0 AND mean_token_len <= 10.0 AS mean_len_ok,
       |  unique_ratio >= 0.3 AS unique_ok,
       |  dup_3gram_ratio <= 0.2 AS rep_ok,
       |  (n_tokens >= 30 AND n_tokens <= 10000)
       |    AND (mean_token_len >= 2.0 AND mean_token_len <= 10.0)
       |    AND unique_ratio >= 0.3 AND dup_3gram_ratio <= 0.2 AS passes
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q58
  // PII redaction: the corpus text is augmented in-plan with synthetic
  // contact strings derived from doc_id (the testdata has no organic
  // PII), then scrubbed; the mask count is recomputed from the result.
  // Both engines build and redact the identical string.
  private def q58(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val id = col("doc_id").cast("string")
    val augmented = concat(col("text"),
      lit(" reach user"), id, lit("@mail.example.org or https://example.org/u/"),
      id, lit(" call +1 415 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ref "), (col("doc_id") + 1000000).cast("string"))
    val red = graft.ext.Text.redact(augmented)
    t(s, dir, "documents")
      .select(col("doc_id"), red.as("redacted"),
        (length(red) - length(regexp_replace(red, "<", "")))
          .cast("long").as("n_masks"))
      .orderBy("doc_id")
  }

  private val q58Sql = {
    val augmented = "concat(text, ' reach user', CAST(doc_id AS VARCHAR), " +
      "'@mail.example.org or https://example.org/u/', CAST(doc_id AS VARCHAR), " +
      "' call +1 415 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), " +
      "' ref ', CAST(doc_id + 1000000 AS VARCHAR))"
    val red = graft.ext.Text.redactSql(augmented)
    s"""SELECT doc_id, $red AS redacted,
       |  CAST(length($red) - length(replace($red, '<', '')) AS BIGINT)
       |    AS n_masks
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q59
  // Per-source cap (web-curation "max N docs per domain"): the 15
  // highest-hash docs of each of the 20 sources survive. Runs through the
  // bounded-heap TopKByScore aggregate — only ≤15 ids per source cross
  // the shuffle, never the corpus — and the oracle reproduces the exact
  // same winners with a row_number window (fine at oracle scale).
  private def q59(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sampling.capPerKey(
        t(s, dir, "documents"), col("source"), "doc_id", n = 15)
      .select("doc_id", "source", "lang", "n_chars")
      .orderBy("doc_id")

  private val q59Sql = {
    val h = graft.ext.Sampling.sampleHashSql("CAST(doc_id AS VARCHAR)")
    s"""WITH r AS (
       |  SELECT doc_id, source, lang, n_chars,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ($h) DESC, doc_id) AS rn
       |  FROM documents)
       |SELECT doc_id, source, lang, n_chars FROM r
       |WHERE rn <= 15 ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q60
  // Deterministic training-order shuffle + shard assignment: pos = hash
  // of the doc id (a global permutation), shard = pos mod 8. Assignment
  // is pure per-row arithmetic (zero shuffle); the physical clustering
  // for a sharded write is ONE repartitionByRange(shard, pos) +
  // sortWithinPartitions, exercised here without changing rows.
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val assigned = graft.ext.Sampling.shardAssign(
      t(s, dir, "documents").select("doc_id", "source"),
      col("doc_id"), numShards = 8)
    assigned
      .repartitionByRange(8, col("shard"), col("pos"))
      .sortWithinPartitions("shard", "pos")
      .select("doc_id", "source", "pos", "shard")
      .orderBy("doc_id")
  }

  private val q60Sql = {
    val (pos, shard) = graft.ext.Sampling.shardAssignSql("doc_id", 8)
    s"""SELECT doc_id, source, $pos AS pos, $shard AS shard
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q61
  // Random-projection dimensionality reduction 64→16 (JL transform with
  // a hash-derived ±1 matrix that is never materialized). Fold order is
  // fixed left-to-right in both engines → reduced vectors compare
  // bit-exactly, double for double. The verification surface unnests to
  // (vec_id, dim, value) scalar rows — the driver harness cannot hash
  // array cells — so every component is individually gated.
  private def q61(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(graft.ext.Similarity.randomProject(col("embedding"), 16)))
      .select(col("vec_id"), col("pos").cast("int").as("dim"),
        col("col").as("value"))
      .orderBy("vec_id", "dim")

  private val q61Sql =
    s"""WITH __p AS (SELECT vec_id,
       |  ${graft.ext.Similarity.randomProjectSql("embedding", 16)} AS proj
       |FROM embeddings)
       |SELECT vec_id, CAST(j AS INT) AS dim, proj[CAST(j AS INT) + 1] AS value
       |FROM __p, generate_series(0, 15) AS t(j)
       |ORDER BY vec_id, dim""".stripMargin

  // ---------------------------------------------------------------- q62
  // Vocabulary-coverage quality stats: top-256 corpus vocabulary, then
  // per-doc in-vocab occurrence count + OOV ratio. Spark scores with a
  // zero-shuffle literal-membership filter; the oracle recomputes the
  // same vocab in a CTE and counts via a join — same semantics, both
  // deterministic under the (count DESC, token ASC) tie-break.
  private def q62(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.vocabCoverage(
        t(s, dir, "documents"), "doc_id", "text", topK = 256)
      .orderBy("doc_id")

  private val q62Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tk
      |  FROM documents),
      |vocab AS (
      |  SELECT tk FROM tok GROUP BY tk
      |  ORDER BY count(*) DESC, tk LIMIT 256),
      |cov AS (
      |  SELECT doc_id, count(*) AS n_invocab
      |  FROM tok JOIN vocab USING (tk) GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(c.n_invocab, 0) AS BIGINT) AS n_invocab,
      |  1.0 - CAST(coalesce(c.n_invocab, 0) AS DOUBLE) /
      |    CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS oov_ratio
      |FROM documents d LEFT JOIN cov c USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q63
  // The training-data preparation capstone: quality gate → exact dedup →
  // benchmark decontamination → per-source cap → temperature mix →
  // shard assignment, one composed pipeline (Curation.prepareTrainingData)
  // checked end to end against a single CTE-chain oracle. Every stage is
  // deterministic (hash predicates + exact arithmetic), so the FULL
  // composition hash-matches, not just each stage in isolation.
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.ext.Curation.prepareTrainingData(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0))
      .select("doc_id", "lang", "source", "n_chars", "pos", "shard")
      .orderBy("doc_id")
  }

  private val q63Sql = {
    import graft.ext.{Dedup, Sampling, Text}
    import graft.functions.PortableHash
    val grams3 = Dedup.wordShinglesSql("text", 3)
    val grams4 = Dedup.wordShinglesSql("text", 4)
    val norm = "array_to_string(list_sort(list_filter(" +
      s"string_split_regex(regexp_replace(lower(text), '${Text.punctClass}', '', 'g'), ' +'), " +
      "x -> x <> '')), ' ')"
    val h7 = Sampling.seededHashSql(7)("CAST(doc_id AS VARCHAR)")
    val h13 = Sampling.seededHashSql(13)("CAST(doc_id AS VARCHAR)")
    val h19 = Sampling.seededHashSql(19)("CAST(doc_id AS VARCHAR)")
    val rate = Sampling.temperatureRateSql(0.5, "n_s", "n_max")
    val nTok = "len(string_split(text, ' '))"
    s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
       |bench AS (SELECT * FROM documents WHERE doc_id % 97 = 0),
       |m AS MATERIALIZED (SELECT doc_id,
       |  CAST($nTok AS BIGINT) AS n_tokens,
       |  (CAST(length(text) AS DOUBLE) - (CAST($nTok AS DOUBLE) - 1.0)) /
       |    CAST($nTok AS DOUBLE) AS mean_token_len,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
       |    CAST($nTok AS DOUBLE) AS unique_ratio,
       |  coalesce(1.0 - CAST(len(list_distinct($grams3)) AS DOUBLE) /
       |    NULLIF(CAST(len($grams3) AS DOUBLE), 0.0), 0.0) AS dup3
       |FROM corpus),
       |g AS MATERIALIZED (SELECT corpus.* FROM corpus JOIN m USING (doc_id)
       |  WHERE m.n_tokens BETWEEN 30 AND 10000
       |    AND m.mean_token_len BETWEEN 2.0 AND 10.0
       |    AND m.unique_ratio >= 0.3 AND m.dup3 <= 0.2),
       |fp AS (SELECT min(doc_id) AS doc_id FROM
       |  (SELECT doc_id, ${PortableHash.polyHashSql(norm)} AS f FROM g)
       |  GROUP BY f),
       |d AS MATERIALIZED (SELECT g.* FROM g JOIN fp USING (doc_id)),
       |bg AS (SELECT DISTINCT unnest($grams4) AS gram FROM bench),
       |cg AS (SELECT doc_id, unnest($grams4) AS gram FROM d),
       |bad AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)),
       |cl AS MATERIALIZED (SELECT * FROM d ANTI JOIN bad USING (doc_id)),
       |r AS (SELECT cl.*, row_number() OVER (PARTITION BY source
       |  ORDER BY ($h7) DESC, doc_id) AS rn FROM cl),
       |cap AS MATERIALIZED (
       |  SELECT doc_id, lang, source, n_chars FROM r WHERE rn <= 15),
       |n AS (SELECT lang, count(*) AS n_s FROM cap GROUP BY lang),
       |mx AS (SELECT max(n_s) AS n_max FROM n),
       |rt AS (SELECT lang, $rate AS rate FROM n, mx),
       |mixed AS (SELECT cap.* FROM cap JOIN rt USING (lang)
       |  WHERE CAST($h13 AS DOUBLE) < rate * CAST(${PortableHash.P} AS DOUBLE))
       |SELECT doc_id, lang, source, n_chars,
       |  $h19 AS pos, CAST(($h19) % 4 AS INTEGER) AS shard
       |FROM mixed ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q102
  // Incremental mergeable rollups: per-(day, key) algebraic partials
  // (count/sum/min/max in exact cents) merged to per-key totals — the
  // never-rescan-history aggregation pattern. The oracle computes the
  // totals directly from raw events; the partial-merge decomposition
  // must reproduce them exactly.
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val parts = graft.ops.IncrementalAgg.partials(t(s, dir, "events"),
      to_date(col("ts")), col("event_type"), Q.centsSafe(col("value")))
    graft.ops.IncrementalAgg.mergeTotals(parts).orderBy("key")
  }

  private val q102Sql =
    graft.ops.IncrementalAgg.totalsSql("events", "event_type",
      s"(${Q.centsSafeSql("value")})") + "\nORDER BY key"

  // --------------------------------------------------------------- q103
  // Exact equi-depth binning per event type (8 bins over value) via the
  // sliced-ranking decomposition — quantile discretization where a hot
  // key spreads over 16 reducers instead of one window funnel; depths
  // balanced to ±1 row, edges bit-equal to the single-window oracle.
  private def q103(s: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.equiDepthBins(t(s, dir, "events"),
        col("event_type"), "event_id", col("value"), nBins = 8,
        slices = 16, lo = 0.0, hi = 500.0)
      .orderBy("key", "bin")

  private val q103Sql =
    graft.ops.ScaleOps.equiDepthBinsSql("events", "event_type",
      "event_id", "value", 8) + "\nORDER BY key, bin"

  // --------------------------------------------------------------- q104
  // Lake small-file compaction AS A VERSIONED COMMIT (round-11 review
  // item #7): 64 micro-batch-sized files land as version 0, then
  // Versioned.compactCommit rewrites them to ~1 MB targets and
  // publishes the rewrite as a replace-commit — so unlike an in-place
  // rewrite, the pre-compaction version remains time-travel readable
  // (asserted in-query) until retention expires it. The gate checks
  // content is byte-preserved across the rewrite; the in-query requires
  // check the layout actually shrank and v0 survived.
  private def q104(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft_q104_lake")
    try {
      val vt = tmp.resolve("vtable").toString
      Versioned.commit(s, vt, t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .repartition(64))
      val v0 = Versioned.read(s, vt, Some(0))
      val nSmall = v0.inputFiles.length
      val v1 = Versioned.compactCommit(s, vt, targetBytes = 1L << 20)
      require(v1 == 1, s"compaction published unexpected version $v1")
      val compacted = Versioned.read(s, vt, Some(v1))
      // an EMPTY corpus (empty-gate sweep) lands as one zero-row file
      // that compaction can only rewrite 1 -> 1; the shrink assertion
      // is about the 64-small-file layout, so it gates on having one
      require(compacted.inputFiles.length < nSmall || nSmall <= 1,
        s"compaction did not shrink the layout: $nSmall -> " +
          s"${compacted.inputFiles.length}")
      // time travel preserved: the pre-compaction version still reads
      // its original 64-file state, row-complete (one count per side —
      // the v0 plan is immutable, re-reading it would just re-list)
      require(v0.count() == compacted.count(),
        "pre-compaction version no longer readable in full")
      compacted
        .orderBy("event_id")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q104Sql =
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY event_id""".stripMargin

  // ----------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_incremental_rollup" -> (q102 _),
    "q103_equidepth_bins" -> (q103 _),
    "q104_lake_compaction" -> (q104 _),
    "q44_asof_sliced" -> (q44 _),
    "q45_schema_evolution" -> (q45 _),
    "q46_bloom_anti_join" -> (q46 _),
    "q47_stratified_sample" -> (q47 _),
    "q48_doc_chunking" -> (q48 _),
    "q50_sequence_packing" -> (q50 _),
    "q52_audio_decode" -> (q52 _),
    "q53_video_decode" -> (q53 _),
    "q54_column_profile" -> (q54 _),
    "q55_decontaminate" -> (q55 _),
    "q56_temperature_mix" -> (q56 _),
    "q57_quality_rules" -> (q57 _),
    "q58_pii_redaction" -> (q58 _),
    "q59_per_source_cap" -> (q59 _),
    "q60_shard_assign" -> (q60 _),
    "q61_random_projection" -> (q61 _),
    "q62_vocab_coverage" -> (q62 _),
    "q63_training_pipeline" -> (q63 _),
    "q30_salted_agg" -> (q30 _),
    "q31_salted_join" -> (q31 _),
    "q32_approx_distinct_hll" -> (q32 _),
    "q33_multimodal_decode" -> (q33 _),
    "q125_image_retrieval" -> (q125 _),
    "q127_rolling_window" -> (q127 _),
    "q34_pushdown_scan" -> (q34 _),
    "q35_token_frequencies" -> (q35 _),
    "q36_tfidf_topk" -> (q36 _),
    "q37_streaming_window" -> (q37 _),
    "q38_ivf_topk" -> (q38 _),
    "q39_sessionize_state" -> (q39 _),
    "q40_asof_join" -> (q40 _),
    "q41_range_join" -> (q41 _))

  /** q32/q38 emit derived facts (tolerance/recall booleans + exact
    * counts) precisely so the sketch/k-means paths stay oracle-checkable.
    */
  val oracles: Map[String, String] = Map(
    "q102_incremental_rollup" -> q102Sql,
    "q103_equidepth_bins" -> q103Sql,
    "q104_lake_compaction" -> q104Sql,
    "q44_asof_sliced" -> q40Sql, // identical semantics to q40 by design
    "q45_schema_evolution" -> q45Sql,
    "q46_bloom_anti_join" -> q46Sql,
    "q47_stratified_sample" -> q47Sql,
    "q48_doc_chunking" -> q48Sql,
    "q50_sequence_packing" -> q50Sql,
    "q52_audio_decode" -> q52Sql,
    "q53_video_decode" -> q53Sql,
    "q54_column_profile" -> q54Sql,
    "q55_decontaminate" -> q55Sql,
    "q56_temperature_mix" -> q56Sql,
    "q57_quality_rules" -> q57Sql,
    "q58_pii_redaction" -> q58Sql,
    "q59_per_source_cap" -> q59Sql,
    "q60_shard_assign" -> q60Sql,
    "q61_random_projection" -> q61Sql,
    "q62_vocab_coverage" -> q62Sql,
    "q63_training_pipeline" -> q63Sql,
    "q30_salted_agg" -> q30Sql,
    "q31_salted_join" -> q31Sql,
    "q32_approx_distinct_hll" -> q32Sql,
    "q38_ivf_topk" -> q38Sql,
    "q33_multimodal_decode" -> q33Sql,
    "q125_image_retrieval" -> q125Sql,
    "q127_rolling_window" -> q127Sql,
    "q34_pushdown_scan" -> q34Sql,
    "q35_token_frequencies" -> q35Sql,
    "q36_tfidf_topk" -> q36Sql,
    "q37_streaming_window" -> q37Sql,
    "q39_sessionize_state" -> q39Sql,
    "q40_asof_join" -> q40Sql,
    "q41_range_join" -> q41Sql)
}
