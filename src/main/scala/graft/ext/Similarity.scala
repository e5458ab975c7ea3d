package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — SURVEY.md
  * §2.11. Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. O(|probes|·|corpus|) — the
  *    correctness baseline, viable when one side broadcasts.
  *  - [[annTopK]]: LSH-bucketed ANN (random-hyperplane signs). At 100 TB
  *    the corpus is scanned once to bucket ids (per-row arithmetic, no
  *    shuffle), and probes join only their bucket — candidate sets shrink
  *    by ~2^planes, at the cost of recall. Deterministic integer-derived
  *    hyperplanes keep it oracle-verifiable.
  *
  * All scoring is higher-order-function arithmetic (zip_with/aggregate),
  * codegen'd, sequential-association so DuckDB's `list_reduce` twin is
  * bit-identical.
  */
object Similarity {

  /** Widen a float array to double (exact). */
  def toDouble(emb: Column): Column = transform(emb, _.cast("double"))

  /** Sequential dot product (left-to-right fold — same association as the
    * oracle's list_reduce). HOF reference form; the native expression
    * (graft.functions.NativeVector) computes identical doubles in one
    * JIT pass.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def dot(a: Column, b: Column): Column =
    graft.functions.NativeVector.dot(a, b)

  def dotSql(aE: String, bE: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($aE)), i -> ($aE)[i] * ($bE)[i])), " +
      s"(acc, v) -> acc + v)"

  def cosine(a: Column, b: Column): Column =
    graft.functions.NativeVector.cosine(a, b)

  def cosineHof(a: Column, b: Column): Column = {
    // zero-norm side ⇒ cosine DEFINED as 0.0 (see NativeVector.cosineData
    // — the native twin this must stay bit-identical to)
    val den = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(den === 0.0, lit(0.0)).otherwise(dotHof(a, b) / den)
  }

  def cosineSql(aE: String, bE: String): String = {
    val den = s"(sqrt(${dotSql(aE, aE)}) * sqrt(${dotSql(bE, bE)}))"
    s"CASE WHEN $den = 0.0 THEN 0.0 ELSE ${dotSql(aE, bE)} / $den END"
  }

  // -------------------------------------------------- int8 quantization

  /** Symmetric int8 scalar quantization: `q_i = clamp(⌊v_i·s + 0.5⌋)`
    * with `s = 127 / max|v|` — the standard 4× memory cut for
    * ANN-at-scale (an int8 corpus index holds 4× the vectors per
    * executor; dequantized scores then re-rank the short list).
    *
    * Engine-portable by construction: rounding is the explicit
    * `floor(x + 0.5)` (half-up) — never the engine's `round()`, whose
    * half-way tie-breaking differs across engines — and every step is
    * deterministic IEEE double arithmetic, so the DuckDB twin
    * reproduces the quantized codes EXACTLY, not approximately.
    * An all-zero vector quantizes to all-zero codes with scale null
    * (nothing to scale).
    */
  def quantizeInt8(emb: Column): Column =
    graft.functions.NativeVector.quantizeInt8(toDouble(emb))

  /** HOF reference form of [[quantizeInt8]] — the executable contract
    * the native expression is spec-checked against (and the shape the
    * DuckDB twin mirrors). NOT the production path: `s` re-evaluates
    * `array_max` inside the per-element lambda (O(d²) interpreted).
    */
  def quantizeInt8Hof(emb: Column): Column = {
    val maxAbs = array_max(transform(toDouble(emb), abs(_)))
    val s = lit(127.0) / nullif(maxAbs, lit(0.0))
    // the zero-vector branch must be an EXPLICIT when: least/greatest
    // SKIP nulls (in Spark and DuckDB both), so clamp(null·v) would
    // silently resolve to 127, not propagate null to a coalesce
    transform(toDouble(emb), v =>
      when(s.isNull, lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L),
          floor(v * s + lit(0.5)).cast("long")))))
  }

  /** The quantization scale (127 / max|v|), null for all-zero vectors. */
  def quantScale(emb: Column): Column =
    lit(127.0) / nullif(array_max(transform(toDouble(emb), abs(_))), lit(0.0))

  def quantizeInt8Sql(e: String): String = {
    val mx = s"list_max(list_transform($e, v -> abs(CAST(v AS DOUBLE))))"
    val s = s"(127.0 / NULLIF($mx, 0.0))"
    s"list_transform($e, v -> CASE WHEN $s IS NULL THEN CAST(0 AS BIGINT) " +
      s"ELSE greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), " +
      s"CAST(floor(CAST(v AS DOUBLE) * $s + 0.5) AS BIGINT))) END)"
  }

  def quantScaleSql(e: String): String =
    s"(127.0 / NULLIF(list_max(list_transform($e, v -> abs(CAST(v AS DOUBLE)))), 0.0))"

  /** Per-probe exact top-k over a scored candidate frame
    * (`probe_id, cand_id, score`) WITHOUT a global window. The
    * `row_number().over(partitionBy(probe_id))` idiom funnels every scored
    * candidate of one probe onto a single reducer before discarding all
    * but k — the 100 TB scale-killer flagged in round 2. Here
    * [[graft.functions.TopK.topKByScore]] (a bounded-heap
    * TypedImperativeAggregate) runs as a two-phase ObjectHashAggregate:
    * partitions keep k-bounded heaps map-side and only ≤k-entry heaps
    * shuffle. Top-k is monotone under union → identical rows and ranks
    * (score desc, cand_id asc tiebreak) to the window formulation —
    * for non-null scores: TopKByScore drops null-score/null-item
    * candidates, where the window idiom would rank them NULLS LAST, so a
    * probe with fewer than k non-null-scored candidates returns only the
    * non-null ones here. Cosine yields null exactly when an embedding is
    * null/empty — a row that MUST not count as a "nearest neighbor" —
    * so dropping is the intended semantics (and what the oracle SQL
    * computes); divergence documented rather than papered over.
    */
  private[graft] def topKPerProbe(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("probe_id")
      .agg(graft.functions.TopK.topKByScore(col("score"), col("cand_id"), k)
        .as("__top"))
      .select(col("probe_id"), posexplode(col("__top")).as(Seq("__i", "__e")))
      .select(col("probe_id"), (col("__i") + 1).cast("long").as("rank"),
        col("__e.item").as("cand_id"), col("__e.score").as("score"))

  /** Exact cosine top-k: every probe against every corpus row, ranked per
    * probe. The cross join is explicitly broadcast on the probe side —
    * the corpus never shuffles, so the plan scales linearly with corpus
    * size (the realistic "small probe set × huge corpus" shape).
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      toDouble(col(embCol)).as("probe_emb"))
    val c = corpus.select(col(idCol).as("cand_id"),
      toDouble(col(embCol)).as("cand_emb"))
    val scored = c.crossJoin(broadcast(p))
      .withColumn("score", cosine(col("probe_emb"), col("cand_emb")))
      .select("probe_id", "cand_id", "score")
    topKPerProbe(scored, k)
  }

  /** Top-k retrieval on int8-quantized codes — the memory-bandwidth
    * scale lever: scoring reads 4× fewer bytes per vector than the
    * double path, so an executor core scans 4× the corpus per second
    * and holds 4× the index ([[quantizeInt8]] has the codes' contract).
    * Scores are EXACT BIGINT dots of the codes (|dot| ≤ 127²·dim), via
    * the codegen'd [[graft.functions.NativeVector.qdot]] — no float
    * anywhere from codes to ranking, so retrieval is bit-reproducible
    * in any engine. Same topology as [[bruteForceTopK]]: probes
    * broadcast, the corpus never shuffles, ≤ k-entry heaps cross the
    * wire. In production the corpus side would be quantized ONCE at
    * ingest and stored (codes + scale columns); quantizing in-plan here
    * keeps the operator self-contained — the scan-side cost is one
    * pass over data already in cache for the scoring.
    *
    * Re-ranking recipe: take this top-k with k' = 4k, then exact-cosine
    * re-rank the short list ([[bruteForceTopK]] on the k' ids) — the
    * standard two-stage ANN layout; both stages are in this file.
    */
  def quantizedTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      quantizeInt8(col(embCol)).as("probe_q"))
    val c = corpus.select(col(idCol).as("cand_id"),
      quantizeInt8(col(embCol)).as("cand_q"))
    val scored = c.crossJoin(broadcast(p))
      .withColumn("score", graft.functions.NativeVector
        .qdot(col("probe_q"), col("cand_q")).cast("double"))
      .select("probe_id", "cand_id", "score")
    // integer scores ≤ 127²·dim ≪ 2⁵³ — exact as the heap's double key
    topKPerProbe(scored, k).withColumn("score", col("score").cast("long"))
  }

  /** Two-stage ANN: [[quantizedTopK]] shortlist (k·`expand` candidates
    * on exact integer code dots — the cheap 4×-bandwidth scan), then
    * exact cosine re-rank of the shortlist only. The standard
    * production layout: stage 1 reads the whole (quantized) corpus,
    * stage 2 touches `k·expand` full-precision vectors per probe —
    * at 10⁹ corpus × k=10 that is a 10⁷× cut in full-precision reads.
    *
    * Scale shape: the shortlist (≤ probes·k·expand rows of ids) joins
    * the corpus on `cand_id` — at production scale THAT side is
    * broadcast (shortlist ≪ corpus), so the corpus is scanned, never
    * shuffled, in both stages. Determinism: stage 1 is exact integer,
    * stage 2 is the same index-order cosine fold as [[bruteForceTopK]]
    * — both replay bit-identically in the oracle.
    */
  def twoStageTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      expand: Int = 4, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(expand >= 1, s"expand must be >= 1: $expand")
    val shortlist = quantizedTopK(probes, corpus, k * expand, idCol, embCol)
      .select(col("probe_id"), col("cand_id"))
    val p = probes.select(col(idCol).as("probe_id"),
      toDouble(col(embCol)).as("probe_emb"))
    val c = corpus.select(col(idCol).as("cand_id"),
      toDouble(col(embCol)).as("cand_emb"))
    val scored = c.join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("score", cosine(col("probe_emb"), col("cand_emb")))
      .select("probe_id", "cand_id", "score")
    topKPerProbe(scored, k)
  }

  // ------------------------------------------------------------- LSH ANN

  /** Deterministic pseudo-random hyperplane coefficient for (plane j,
    * dim i): integer in [-1000000, 1000000], derived arithmetically so
    * the oracle reproduces it.
    */
  private def planeCoef(j: Int, i: Column): Column =
    (lit(j.toLong) * 131071L + i.cast("long") * 524287L) % 2000001L - 1000000L

  private def planeCoefSql(j: Int, iE: String): String =
    s"(($j * 131071 + $iE * 524287) % 2000001 - 1000000)"

  /** Plane-count sizing rule for the LSH family, from the round-10
    * stress-probe measurements: a pinned `planes` holds the bucket COUNT
    * constant while the corpus grows, so expected bucket occupancy —
    * and with it the quadratic per-bucket pair work, and eventually the
    * `maxBucket` cap (measured crossover: the cap truncates `knnGraph`
    * output at ~30× the sf0.1 corpus under planes=4, while planes=9
    * returns the full set) — grows linearly. This helper is the inverse:
    * pick the fewest planes that keep EXPECTED occupancy ≤
    * `targetBucket` (`n / 2^planes ≤ targetBucket`), floored at `base`
    * so small corpora keep the recall of wide buckets. At the sf0.1
    * corpus (2,000 vectors, target 128) it returns the pinned 4; at 30×
    * it returns the measured-correct 9. Callers pass a corpus count they
    * already have (a parquet row count is metadata-cheap at any scale) —
    * the helper stays pure so bucketing remains plan-constant and
    * oracle-reproducible.
    *
    * Recall trade: occupancy-constant planes also hold RECALL roughly
    * constant (a fixed-size bucket sees a fixed-size neighborhood);
    * callers wanting higher recall at scale should raise `targetBucket`,
    * not pin `planes`.
    */
  def autoPlanes(corpusCount: Long, targetBucket: Int = 128,
      base: Int = 4): Int = {
    require(corpusCount >= 0, s"negative corpus count: $corpusCount")
    require(targetBucket > 0, s"targetBucket must be positive: $targetBucket")
    val needed = math.ceil(
      math.log(math.max(1.0, corpusCount.toDouble / targetBucket)) /
        math.log(2.0)).toInt
    // 63-plane ceiling: bucket ids live in the sign bits of one Long
    math.min(63, math.max(base, needed))
  }

  /** Sentinel default for `planes` parameters: auto-size with
    * [[autoPlanes]] from the corpus row count. Round-11 default flip
    * (round-10 review "What's wrong" #1): the old pinned `planes = 4`
    * default was measured to silently truncate kNN recall above ~30×
    * the sf0.1 corpus (the `maxBucket` cap bites as occupancy grows);
    * auto-sizing is now what callers get unless they pin explicitly.
    */
  val PlanesAuto: Int = -1

  /** Resolve a `planes` argument: an explicit positive value passes
    * through (oracle-pinned callers like q91/q97); [[PlanesAuto]]
    * sizes from `corpusCount` when the caller already has one (free),
    * else from ONE distributed count of `df` — metadata-cheap on a
    * parquet scan, one job otherwise, and paid once per call chain
    * (semanticDedup resolves before delegating to knnGraph).
    */
  private[graft] def resolvePlanes(df: DataFrame, planes: Int,
      corpusCount: Option[Long]): Int =
    if (planes != PlanesAuto) {
      require(planes > 0 && planes <= 63, s"planes out of range: $planes")
      planes
    } else autoPlanes(corpusCount.getOrElse(df.count()))

  /** Sign-bit LSH bucket id from `planes` random hyperplanes (native
    * one-pass expression; [[lshBucketHof]] is the reference form).
    */
  def lshBucket(embD: Column, planes: Int = 8): Column =
    graft.functions.NativeVector.lshBucket(embD, planes)

  def lshBucketHof(embD: Column, planes: Int = 8): Column =
    (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(embD, transform(sequence(lit(1), size(embD)),
          i => planeCoef(j, i).cast("double")), _ * _),
        lit(0.0), _ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(embE: String, planes: Int = 8): String =
    (0 until planes).map { j =>
      val proj = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(generate_series(1, len($embE)), " +
        s"i -> ($embE)[i] * CAST(${planeCoefSql(j, "i")} AS DOUBLE))), (a,v) -> a+v)"
      s"(CASE WHEN $proj > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** ANN top-k: probes meet only corpus rows in the same LSH bucket, then
    * exact cosine re-rank. Equi-join on bucket → shuffle carries
    * (bucket, id, embedding) once; no cross product.
    */
  def annTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 8, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      toDouble(col(embCol)).as("probe_emb"))
      .withColumn("bucket", lshBucket(col("probe_emb"), planes))
    val c = corpus.select(col(idCol).as("cand_id"),
      toDouble(col(embCol)).as("cand_emb"))
      .withColumn("bucket", lshBucket(col("cand_emb"), planes))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .withColumn("score", cosine(col("probe_emb"), col("cand_emb")))
      .select("probe_id", "cand_id", "score")
    topKPerProbe(scored, k)
  }

  // ------------------------------------------------------------- IVF ANN

  /** IVF (inverted-file) ANN index: k-means partitions the corpus into
    * cells ONCE at build time; [[IvfIndex.search]] reuses the persisted
    * assignment for every query. Build/search are split so the (MLlib
    * KMeans) build cost is paid once per corpus, not once per query — a
    * production index is built offline and amortized over millions of
    * searches.
    *
    * Scale shape: the build is one MLlib KMeans job (sampled
    * initialization, iterative refinement — all distributed); at query
    * time the centroid table is tiny and driver-local, so cell selection
    * is a broadcast map-side step and the candidate join is an equi-join
    * on `cluster`. Complements [[annTopK]]: LSH is cheaper to build /
    * oracle-reproducible; IVF adapts to the data distribution (better
    * recall per candidate at the same fan-in).
    *
    * @param assigned  corpus rows (cand_id, cand_emb, cluster), persisted
    * @param centroids (cluster, centroid) — nCentroids × dim, broadcastable
    */
  final class IvfIndex private[ext] (
      val assigned: DataFrame, val centroids: DataFrame) {

    /** ANN top-k against the prebuilt index: each probe searches its
      * `nProbe` nearest cells, exact cosine re-rank inside.
      *
      * Cell selection uses the SAME metric as assignment (squared
      * Euclidean): ‖p−c‖² = ‖p‖² − 2·p·c + ‖c‖², and ‖p‖² is constant per
      * probe, so cells rank by maximizing 2·p·c − ‖c‖². A corpus probe's
      * own cell is its Euclidean-argmin centroid, so it is always among
      * the probed cells — the self-hit invariant holds structurally
      * (ranking cells by max inner product could skip it).
      */
    def search(probes: DataFrame, k: Int, nProbe: Int = 4,
        idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
      val p = probes.select(col(idCol).as("probe_id"),
        toDouble(col(embCol)).as("probe_emb"))
      val cellScored = p.crossJoin(broadcast(centroids))
        .withColumn("score", lit(2.0) * dot(col("probe_emb"), col("centroid"))
          - dot(col("centroid"), col("centroid")))
        .select(col("probe_id"), col("cluster").as("cand_id"), col("score"))
      val probeCells = topKPerProbe(cellScored, nProbe)
        .select(col("probe_id"), col("cand_id").as("cluster"))
        .join(p, Seq("probe_id")) // reattach probe_emb (both sides tiny)

      val scored = assigned.join(broadcast(probeCells), Seq("cluster"))
        .withColumn("score", cosine(col("probe_emb"), col("cand_emb")))
        .select("probe_id", "cand_id", "score")
      topKPerProbe(scored, k)
    }

    /** Release the persisted assignment. */
    def unpersist(): Unit = { assigned.unpersist(); () }
  }

  object IvfIndex {
    /** Fit k-means and persist the cell assignment (materialized eagerly
      * so the first search doesn't absorb the build).
      */
    /** `nPartitions` sizes the pinned k-means input layout. The default
      * (32) is the verification setting — deterministic at local[32] test
      * scale; a real 100 TB corpus should pass executors×cores-scale
      * parallelism (e.g. 4000 on a 1000-executor cluster) or the fit
      * bottlenecks on 32 tasks. Changing it changes which rows k-means||
      * init samples, hence the centroids — same recall, different cells —
      * so pin one value per corpus for reproducible indexes.
      */
    def build(corpus: DataFrame, nCentroids: Int = 16,
        idCol: String = "vec_id", embCol: String = "embedding",
        nPartitions: Int = 32): IvfIndex = {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector

      val c = corpus.select(col(idCol).as("cand_id"),
        toDouble(col(embCol)).as("cand_emb"))
        // pin partitioning by id hash BEFORE the fit: k-means|| init
        // samples per partition, so an environment-dependent split layout
        // (file sizes, core count) would otherwise vary the centroids
        // even at a fixed seed
        .repartition(nPartitions, col("cand_id"))
        .withColumn("features", array_to_vector(col("cand_emb")))
      // Degenerate corpora (fuzz-gate empty/single-row sweeps): k-means
      // cannot fit on nothing (Summarizer requires ≥1 row) — DEFINED as
      // an empty index whose every search returns no rows — and fitting
      // k centroids on fewer than k vectors throws inside Spark ML, so
      // k clamps to the corpus size (a parquet count(*) is footer-only).
      val nRows = corpus.count()
      val spark = corpus.sparkSession
      import spark.implicits._
      if (nRows == 0L)
        return new IvfIndex(
          c.drop("features").withColumn("cluster", lit(0).cast("int")),
          Seq.empty[(Int, Seq[Double])].toDF("cluster", "centroid"))
      // k must clamp to the number of DISTINCT vectors, not just rows:
      // Spark ML's k-means aggregator indexes centers by the init's
      // distinct-candidate count, and k > distinct points crashes with
      // an ArrayIndexOutOfBounds (found by the all-identical `dup`
      // gate corpus — a scraper gone wrong is exactly when a real
      // pipeline hits this). The count is over a 64-bit content hash:
      // map-side cheap, and a collision only UNDER-counts, which is
      // always safe (fewer cells = coarser index, never a crash).
      val nDistinct = c.select(xxhash64(col("cand_emb"))).distinct().count()
      if (nRows == 1L || nDistinct == 1L) {
        // Spark ML k-means requires k ≥ 2 — a corpus with one vector
        // (or one distinct vector repeated) is one cell holding
        // everything; search degenerates to the exact scan
        val assigned = c.drop("features")
          .withColumn("cluster", lit(0).cast("int")).persist()
        assigned.count()
        val v = assigned.select("cand_emb").head.getSeq[Double](0)
        return new IvfIndex(assigned,
          Seq((0, v)).toDF("cluster", "centroid"))
      }
      val k = math.min(math.min(nCentroids.toLong, nRows), nDistinct).toInt
      val model = new KMeans().setK(k).setSeed(42L).setMaxIter(5)
        .fit(c) // 5 iterations: cell quality plateaus early; recall asserted in tests
      val assigned = model.transform(c)
        .withColumnRenamed("prediction", "cluster")
        .drop("features")
        .persist()
      assigned.count() // materialize now — build cost stays in build()

      // centroid table: nCentroids × dim — driver-local by construction
      val centroids = model.clusterCenters.zipWithIndex
        .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
        .toDF("cluster", "centroid")
      new IvfIndex(assigned, centroids)
    }

    // Application-scoped index reuse for repeated queries over the same
    // corpus. Callers key by `applicationId + corpus path` (persisted
    // blocks are application-scoped, so an applicationId in the key can
    // never alias a stopped context's blocks — unlike identity hashes,
    // which the JVM reuses after GC). Entries pin persisted partitions
    // until evicted: [[invalidate]]/[[clearCache]] are the release path.
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]()

    /** Signature parity with [[build]] — `nPartitions` reaches the
      * k-means input layout on the cached path too (a 100 TB corpus
      * indexed through `cached` must be able to set fit parallelism;
      * note it participates in centroid determinism, so keep it constant
      * per cache key).
      */
    def cached(key: String, corpus: => DataFrame, nCentroids: Int = 16,
        idCol: String = "vec_id", embCol: String = "embedding",
        nPartitions: Int = 32): IvfIndex =
      cache.computeIfAbsent(key,
        _ => build(corpus, nCentroids, idCol, embCol, nPartitions))

    /** Drop one cached index and unpersist its assignment blocks. */
    def invalidate(key: String): Unit =
      Option(cache.remove(key)).foreach(_.unpersist())

    /** Drop every cached index (e.g. on application shutdown). */
    def clearCache(): Unit = {
      val keys = cache.keySet.toArray(Array.empty[String])
      keys.foreach(invalidate)
    }
  }

  /** One-shot convenience: build + search (the round-1 API; prefer
    * [[IvfIndex.build]]/[[IvfIndex.search]] or [[IvfIndex.cached]] when
    * the corpus is queried more than once).
    */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    IvfIndex.build(corpus, nCentroids, idCol, embCol)
      .search(probes, k, nProbe, idCol, embCol)

  /** Embedding-cosine near-dup pairs: same-bucket pairs above a cosine
    * threshold (id_a < id_b). The embedding analogue of
    * [[Dedup.nearDuplicates]].
    *
    * `maxBucket` drops mega-buckets before the self-join (a bucket of b
    * rows is b² pairs — one degenerate hyperplane cell would be
    * quadratic); the bucket-size window rides the same Exchange the join
    * needs, so the cap adds no shuffle. See [[Dedup.DefaultMaxBucket]].
    */
  def embeddingNearDups(df: DataFrame, threshold: Double, planes: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // identical aliased subtrees below the join → one Exchange + reuse
    // (per-side renames would break canonical matching; see
    // Dedup.minHashCandidates)
    val e = df.select(col(idCol), toDouble(col(embCol)).as("embd"))
      .withColumn("bucket", lshBucket(col("embd"), planes))
      .repartition(col("bucket"))
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy("bucket")))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    e.as("a")
      .join(e.as("b"), col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", cosine(col("a.embd"), col("b.embd")))
      .filter(col("cos") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("cos"))
      .distinct()
  }

  /** Embedding-bucket audit twin of the [[embeddingNearDups]] cap: the
    * (bucket, size) rows a given `maxBucket` would drop (see
    * [[Dedup.oversizedBuckets]]).
    */
  def embeddingOversizedBuckets(df: DataFrame, planes: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    df.select(lshBucket(toDouble(col(embCol)), planes).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  // ---------------------------------------------------------- kNN graph

  /** Corpus-wide kNN graph — for EVERY vector, its `k` nearest neighbors
    * by cosine among vectors sharing its LSH bucket: the building block
    * of SemDeDup-style semantic clustering, label propagation and graph
    * curation ([[embeddingNearDups]] emits thresholded PAIRS; this emits
    * a fixed-degree neighbor list whether or not any pair clears a
    * threshold). Output: `(vec_id, rank, neighbor_id, score)`, rank 1 =
    * nearest; a vector whose bucket holds no other vector emits no rows.
    *
    * Recall caveat (same as every single-table LSH scheme here): a true
    * neighbor in a DIFFERENT bucket is invisible. Fewer `planes` → bigger
    * buckets → higher recall and higher cost; the `maxBucket` cap bounds
    * the worst case and [[embeddingOversizedBuckets]] audits what it
    * would drop. A PINNED `planes` does not survive corpus growth —
    * occupancy grows linearly until the cap truncates output (measured
    * at ~30× the sf0.1 corpus under planes=4) — so the DEFAULT is
    * [[PlanesAuto]]: occupancy-constant sizing via [[autoPlanes]] from
    * `corpusCount` (or one count job when absent).
    *
    * Scale shape (100 TB): one pass buckets ids (per-row arithmetic);
    * bucket sizes are a ≤ 2^planes-row aggregate BROADCAST back (no
    * window — a degenerate bucket would funnel the corpus through one
    * reducer before the cap could drop it); the self-join is an
    * equi-join on `bucket`; ranking runs through the bounded
    * [[graft.functions.TopK.topKByScore]] heap — only ≤ k entries per
    * vector cross the final shuffle, never a candidate set.
    */
  def knnGraph(df: DataFrame, k: Int, planes: Int = PlanesAuto,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket,
      corpusCount: Option[Long] = None): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val nPlanes = resolvePlanes(df, planes, corpusCount)
    val e = df.select(col(idCol), toDouble(col(embCol)).as("embd"))
      .withColumn("bucket", lshBucket(col("embd"), nPlanes))
    val sizes = e.groupBy("bucket").agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") <= maxBucket)
      .select("bucket")
    val kept = e.join(broadcast(sizes), Seq("bucket"))
    val scored = kept.as("a")
      .join(kept.as("b"), col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("probe_id"),
        col(s"b.$idCol").as("cand_id"),
        cosine(col("a.embd"), col("b.embd")).as("score"))
    topKPerProbe(scored, k)
      .select(col("probe_id").as(idCol), col("rank"),
        col("cand_id").as("neighbor_id"), col("score"))
  }

  /** DuckDB twin of [[knnGraph]] (same buckets, same cosine folds, same
    * `score DESC, neighbor` tie-break).
    */
  def knnGraphSql(table: String, k: Int, planes: Int = 4,
      idE: String = "vec_id", embE: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket): String =
    s"""WITH __e AS MATERIALIZED (
       |  SELECT $idE, list_transform($embE, x -> CAST(x AS DOUBLE))
       |      AS embd,
       |    ${lshBucketSql(s"list_transform($embE, x -> CAST(x AS DOUBLE))",
            planes)} AS bucket
       |  FROM $table),
       |__sz AS (SELECT bucket FROM __e GROUP BY bucket
       |  HAVING count(*) <= $maxBucket),
       |__k AS (SELECT __e.* FROM __e JOIN __sz USING (bucket)),
       |__sc AS (SELECT a.$idE AS id, b.$idE AS neighbor_id,
       |    ${cosineSql("a.embd", "b.embd")} AS score
       |  FROM __k a JOIN __k b
       |    ON a.bucket = b.bucket AND a.$idE <> b.$idE),
       |__r AS (SELECT *, CAST(row_number() OVER (PARTITION BY id
       |    ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM __sc)
       |SELECT id AS $idE, rank, neighbor_id, score
       |FROM __r WHERE rank <= $k""".stripMargin

  // ------------------------------------------------------ semantic dedup

  /** SemDeDup end-to-end (Abbas et al., arXiv:2303.09540): cluster
    * vectors whose cosine similarity clears `threshold` into transitive
    * components via the kNN graph, and elect one canonical survivor per
    * cluster — the embedding-space analogue of the MinHash →
    * dupComponents → canonicalPerCluster text chain (q24→q49→q81).
    * Output: `(component, n_members, canonical_id, n_dropped)` per
    * cluster of size ≥ 2; a vector with no above-threshold neighbor is
    * not a cluster and emits nothing (its drop count is zero).
    *
    * Canonical = smallest id — deterministic and oracle-reproducible; a
    * production pipeline with per-doc quality scores would elect by
    * `min(struct(-quality, id))` instead, exactly as
    * [[Dedup.canonicalPerCluster]] does with token counts.
    *
    * Scale shape (100 TB): [[knnGraph]] does the only corpus-sized work
    * (bucketed self-join, bounded heaps); thresholded edges are a tiny
    * pair set; [[Dedup.dupComponents]] iterates on (id, long) labels
    * only — each round one key shuffle of the EDGE set, lineage kept
    * flat by localCheckpoint; the final rollup is map-side combined on
    * |clusters| rows.
    */
  def semanticDedup(df: DataFrame, threshold: Double, k: Int = 5,
      planes: Int = PlanesAuto, idCol: String = "vec_id",
      embCol: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket,
      corpusCount: Option[Long] = None): DataFrame = {
    // resolve once here so the delegation never pays a second count
    val knn = knnGraph(df, k, resolvePlanes(df, planes, corpusCount),
      idCol, embCol, maxBucket)
    val pairs = knn.filter(col("score") >= threshold)
      .select(least(col(idCol), col("neighbor_id")).as("id_a"),
        greatest(col(idCol), col("neighbor_id")).as("id_b"))
      .distinct()
    Dedup.dupComponents(pairs)
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"), min("id").as("canonical_id"))
      .select(col("component"), col("n_members"), col("canonical_id"),
        (col("n_members") - 1L).as("n_dropped"))
  }

  /** DuckDB twin of [[semanticDedup]]: the same kNN edges thresholded,
    * components as recursive min-reachable-id (a different algorithm
    * than Spark's label propagation that must land on identical
    * clusters), same min-id election.
    */
  def semanticDedupSql(table: String, threshold: Double, k: Int = 5,
      planes: Int = 4, idE: String = "vec_id", embE: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket): String =
    s"""WITH RECURSIVE __g AS MATERIALIZED (
       |  SELECT * FROM (
       |${knnGraphSql(table, k, planes, idE, embE, maxBucket)})),
       |__ver AS MATERIALIZED (
       |  SELECT DISTINCT least($idE, neighbor_id) AS id_a,
       |    greatest($idE, neighbor_id) AS id_b
       |  FROM __g WHERE score >= $threshold),
       |__ed AS MATERIALIZED (
       |  SELECT id_a AS s, id_b AS d FROM __ver
       |  UNION ALL SELECT id_b, id_a FROM __ver),
       |__reach AS (
       |  SELECT s AS v, s AS r FROM __ed
       |  UNION
       |  SELECT __reach.v, e.d FROM __reach JOIN __ed e ON __reach.r = e.s),
       |__comp AS (SELECT v AS id, min(r) AS component
       |  FROM __reach GROUP BY v)
       |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
       |  min(id) AS canonical_id,
       |  CAST(count(*) - 1 AS BIGINT) AS n_dropped
       |FROM __comp GROUP BY component""".stripMargin

  // --------------------------------------- random-projection reduction

  /** Johnson–Lindenstrauss-style dimensionality reduction: project an
    * embedding onto `outDim` pseudo-random ±1 directions. Output dim j is
    * `Σ_k v[k]·sign(j,k)` with the sign derived from
    * [[graft.functions.PortableHash.affine]] parity — a fixed,
    * engine-independent projection matrix that is never materialized,
    * shipped, or broadcast: each executor regenerates coefficients inside
    * codegen. The fold runs left-to-right over k, the same association as
    * DuckDB's `list_reduce`, so reduced vectors are bit-identical across
    * engines (floats widen to double exactly; each product and addition
    * is one correctly-rounded IEEE op in a fixed order).
    *
    * This is the scale lever for brute-force cosine: scoring cost is
    * linear in dimension, so 64→16 cuts the dominant term 4× while
    * approximately preserving inner products (JL); the reduced corpus
    * also shrinks the ANN build. Unscaled (no 1/√outDim factor): rankings
    * and bucket signs are scale-invariant, and omitting the multiply
    * keeps one fewer rounding step to reason about.
    *
    * Input dimension must be ≤ 1024 so (j,k) index pairs stay unique in
    * the sign-hash domain.
    */
  def randomProject(emb: Column, outDim: Int, seed: Int = 7): Column = {
    require(outDim > 0, s"outDim must be positive: $outDim")
    graft.functions.NativeVector.randomProject(toDouble(emb), outDim, seed)
  }

  /** HOF reference form of [[randomProject]] — the executable contract
    * the native expression is spec-checked against. NOT the production
    * path: interprets outDim·dim affine hashes per row.
    */
  def randomProjectHof(emb: Column, outDim: Int, seed: Int = 7): Column = {
    require(outDim > 0, s"outDim must be positive: $outDim")
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(sequence(lit(0), size(emb) - 1), lit(0.0d),
        (acc, k) => acc +
          element_at(emb, k + 1).cast("double") * rpSign(j, k, seed)))
  }

  /** Sign bit: parity of a DOUBLE affine pass. One pass is degenerate
    * here — for x = j·1024+k ≲ 3500 the first affine never wraps mod P,
    * so h is a plain linear form with even coefficients and every sign
    * comes out +1. The second pass wraps for all h ≳ 2300 and restores
    * parity mixing (measured: 50.2% +1 over a 16×64 matrix).
    */
  private def rpSign(j: Column, k: Column, seed: Int): Column = {
    import graft.functions.PortableHash.affine
    when(affine(lit(seed + 4),
        affine(lit(seed), j.cast("long") * 1024L + k.cast("long"))) % 2 === 0,
      lit(1.0d)).otherwise(lit(-1.0d))
  }

  /** DuckDB twin of [[randomProject]] (same fold order → bit-equal). */
  def randomProjectSql(embE: String, outDim: Int, seed: Int = 7): String = {
    import graft.functions.PortableHash.affineSql
    val h = affineSql((seed + 4).toString,
      s"(${affineSql(seed.toString, "(j*1024 + k)")})")
    val sign = s"CASE WHEN ($h) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    s"list_transform(generate_series(0, ${outDim - 1}), j -> " +
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(0, len($embE)-1), k -> " +
      s"CAST(($embE)[k+1] AS DOUBLE) * $sign)), (acc, v) -> acc + v))"
  }

  // ------------------------------------------------- corpus diversity

  /** Per-group embedding diversity in ONE pass via the centroid trick:
    * the mean squared distance of a group's vectors to their centroid is
    * `E[‖x‖²] − ‖E[x]‖²` — so a data-mixture curator can score how
    * redundant each source/cluster is (low diversity ⇒ near-duplicate
    * mass worth downweighting, the SemDeDup signal, arXiv:2303.09540)
    * WITHOUT any pairwise join.
    *
    * Cross-engine exactness: float sums are order-sensitive, so every
    * element is first quantized to an integer (`round(x·10⁶)` — one
    * identical IEEE double op per element); all aggregation is then
    * exact BIGINT arithmetic, and the final three doubles come from the
    * same division sequence in both engines.
    *
    * Scale shape (100 TB): one explode of `(group, dim, q)` scalars with
    * map-side partial aggregation — the exchange carries per-(group,dim)
    * partials, not vectors, and the second-level rollup is |groups|·|dims|
    * rows. No pairwise anything; linear in corpus size. The second-level
    * rollup runs in DECIMAL(38,0) because the centroid term Σ_d(Σq)² is
    * ≈ n²·10¹²·‖c̄‖² — past BIGINT at only ~3·10³ tight-cluster rows per
    * group, and a tight cluster (‖c̄‖ ≈ 1) is exactly the redundancy case
    * this targets. DECIMAL(38) holds to n ≈ 3·10¹² rows per group, both
    * engines compute it exactly, and past even that both fail loudly
    * (no silent wrap anywhere).
    */
  def groupDiversity(df: DataFrame, groupCol: String = "label",
      embCol: String = "embedding"): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val q = df.select(col(groupCol).as("__g"),
      posexplode(transform(col(embCol),
        x => round(x.cast("double") * 1000000).cast("long")))
        .as(Seq("__pos", "__q")))
    // The per-element square runs in DECIMAL(38,0), not LONG: a raw
    // element of magnitude m quantizes to m·10⁶, whose square m²·10¹²
    // passes 2⁶³ at |m| ≈ 3·10³ — and unnormalized real-world vectors
    // (found by the fuzz-corpus gate at m = 10⁶) do reach that. Any
    // long q squares exactly inside DECIMAL(38) (max ≈ 8.5·10³⁷).
    val perDim = q.groupBy(col("__g"), col("__pos"))
      .agg(sum(dec(col("__q"))).as("__s"),
        sum(dec(col("__q")) * dec(col("__q"))).as("__ss"),
        count(lit(1)).as("__cnt"))
    // The rollup sums run in DECIMAL(38,0): the centroid term Σ_d(Σq)²
    // is ≈ n²·10¹²·‖c̄‖², past BIGINT at only ~3·10³ tight-cluster rows
    // per group — exactly the redundancy case this operator targets.
    // DECIMAL(38) holds to n ≈ 3·10¹² rows of unit-scale vectors and
    // both engines agree exactly; the final doubles are one identical
    // correctly-rounded cast; past the decimal range both engines fail
    // loudly (no silent wrap anywhere).
    val g = perDim.groupBy("__g").agg(
      max("__cnt").as("n"),
      sum(col("__ss")).as("__sum_sq"),
      sum(col("__s") * col("__s")).as("__sum_cs"))
    val meanSq = (col("__sum_sq").cast("double") / col("n")) / lit(1e12)
    val centSq =
      (col("__sum_cs").cast("double") / col("n") / col("n")) / lit(1e12)
    g.select(col("__g").as(groupCol), col("n"),
      meanSq.as("mean_sq_norm"),
      centSq.as("centroid_sq_norm"),
      (meanSq - centSq).as("diversity"))
  }

  /** Nearest-centroid assignment — the label-noise / cluster-quality
    * audit: compute each label's exact centroid, then assign every
    * vector to its closest centroid; a vector whose `assigned` differs
    * from its `label` is a mislabel/outlier candidate, and the
    * (label × assigned) confusion counts grade the labeling wholesale.
    *
    * Determinism: centroids come from the same integer-quantized sums as
    * [[groupDiversity]] (exact in any engine); per-vector distances are
    * sequential-association folds in index order (`zip_with` +
    * `aggregate` ≡ DuckDB `list_reduce`), so both engines produce
    * bit-identical doubles; argmin ties break on the centroid label.
    *
    * Scale shape (100 TB): centroids are |labels|·|dims| partials
    * (map-side combined) collapsing to |labels| rows — BROADCAST back;
    * the corpus is scanned once more, each row scored against the
    * broadcast centroid table with no shuffle, and the argmin groupBy is
    * |corpus|·|labels| scalar tuples. For |labels| in the thousands,
    * fold the argmin into the scoring pass per-row (centroids as one
    * broadcast array) — same topology, one less exchange.
    */
  def centroidAssign(df: DataFrame, idCol: String = "vec_id",
      labelCol: String = "label", embCol: String = "embedding"): DataFrame = {
    val q = df.select(col(labelCol).as("__l"),
      posexplode(transform(col(embCol),
        x => round(x.cast("double") * 1000000).cast("long")))
        .as(Seq("__pos", "__q")))
    val cent = q.groupBy(col("__l"), col("__pos"))
      .agg(sum("__q").as("__s"), count(lit(1)).as("__cnt"))
      .groupBy(col("__l"))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__s"))))
          .as("__ps"),
        max("__cnt").as("__n"))
      .select(col("__l").as("__cl"),
        transform(col("__ps"),
          p => (p.getField("__s").cast("double") / col("__n")) / lit(1e6))
          .as("__cent"))
    // a ragged embedding must fail LOUDLY in both engines — zip_with
    // would null-pad a short vector into a null distance that Spark's
    // struct-min sorts first while the oracle's ORDER BY sorts last,
    // silently diverging the argmin instead of surfacing the bad row
    df.select(col(idCol), col(labelCol), col(embCol))
      .crossJoin(broadcast(cent))
      .withColumn("__d2",
        when(size(col(embCol)) =!= size(col("__cent")),
          raise_error(concat(lit("centroidAssign: embedding dim "),
            size(col(embCol)).cast("string"),
            lit(" != centroid dim "),
            size(col("__cent")).cast("string"))))
        .otherwise(
          aggregate(zip_with(toDouble(col(embCol)), col("__cent"),
            (x, c) => (x - c) * (x - c)), lit(0.0d), (acc, v) => acc + v)))
      .groupBy(col(idCol), col(labelCol))
      .agg(min(struct(col("__d2"), col("__cl"))).as("__best"))
      .select(col(idCol), col(labelCol),
        col("__best").getField("__cl").as("assigned"),
        col("__best").getField("__d2").as("dist2"))
  }

  /** DuckDB twin of [[centroidAssign]] (same quantized centroids, same
    * fold order, same `(dist, label)` tie-break).
    */
  def centroidAssignSql(table: String, idE: String, labelE: String,
      embE: String): String =
    s"""WITH __e AS MATERIALIZED (
       |  SELECT g, CAST(round(CAST(($embE)[CAST(i AS INT)] AS DOUBLE)
       |      * 1000000) AS BIGINT) AS q, i AS pos
       |  FROM (SELECT $labelE AS g, $embE,
       |          unnest(generate_series(1, len($embE))) AS i
       |        FROM $table)),
       |__d AS (SELECT g, pos, sum(q) AS s, count(*) AS cnt
       |  FROM __e GROUP BY g, pos),
       |__c AS (SELECT g AS cl, CAST(max(cnt) AS BIGINT) AS n,
       |    list(CAST(s AS BIGINT) ORDER BY pos) AS sv
       |  FROM __d GROUP BY g),
       |__cent AS (SELECT cl,
       |    list_transform(sv, s -> (CAST(s AS DOUBLE) / n) / 1e6) AS cent
       |  FROM __c),
       |__score AS (SELECT v.$idE AS vid, v.$labelE AS vlabel, c.cl,
       |    CASE WHEN len(v.$embE) <> len(c.cent)
       |      THEN error('centroidAssign: embedding dim '
       |        || len(v.$embE) || ' != centroid dim ' || len(c.cent))
       |    ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len(v.$embE)), i ->
       |        (CAST((v.$embE)[CAST(i AS INT)] AS DOUBLE)
       |            - c.cent[CAST(i AS INT)])
       |        * (CAST((v.$embE)[CAST(i AS INT)] AS DOUBLE)
       |            - c.cent[CAST(i AS INT)]))),
       |      (acc, x) -> acc + x) END AS d2
       |  FROM $table v CROSS JOIN __cent c),
       |__assign AS (SELECT *, row_number() OVER (PARTITION BY vid
       |    ORDER BY d2, cl) AS rn FROM __score)
       |SELECT vid AS $idE, vlabel AS $labelE, cl AS assigned, d2 AS dist2
       |FROM __assign WHERE rn = 1""".stripMargin

  /** DuckDB twin of [[groupDiversity]] (same quantization, same division
    * sequence → bit-equal doubles).
    */
  def groupDiversitySql(table: String, groupE: String,
      embE: String): String =
    s"""WITH __e AS MATERIALIZED (
       |  SELECT g, CAST(round(CAST(($embE)[CAST(i AS INT)] AS DOUBLE)
       |      * 1000000) AS BIGINT) AS q, i AS pos
       |  FROM (SELECT $groupE AS g, $embE,
       |          unnest(generate_series(1, len($embE))) AS i
       |        FROM $table)),
       |__d AS (SELECT g, pos, CAST(sum(q) AS HUGEINT) AS s,
       |    sum(CAST(q AS HUGEINT) * q) AS ss,
       |    count(*) AS cnt
       |  FROM __e GROUP BY g, pos),
       |__gr AS (SELECT g,
       |    CAST(max(cnt) AS BIGINT) AS n,
       |    sum(ss) AS sum_sq,
       |    sum(s * s) AS sum_cs
       |  FROM __d GROUP BY g)
       |SELECT g AS $groupE, n,
       |  (CAST(sum_sq AS DOUBLE) / n) / 1e12 AS mean_sq_norm,
       |  (CAST(sum_cs AS DOUBLE) / n / n) / 1e12 AS centroid_sq_norm,
       |  (CAST(sum_sq AS DOUBLE) / n) / 1e12
       |    - (CAST(sum_cs AS DOUBLE) / n / n) / 1e12 AS diversity
       |FROM __gr""".stripMargin

  // ------------------------------------- contrastive training pairs

  /** Contrastive training-pair assembly (the SimCSE/CLIP-style data
    * layout: anchor, positive, k negatives per row group): positives
    * are deterministic within a label group (the group's minimum id —
    * or the second minimum when the anchor IS the minimum), negatives
    * are hash-probed candidates filtered to label disagreement.
    *
    * Determinism over rejection sampling: slot j's candidate is
    * `affine(j, anchor) mod N` — a fixed universal-family probe — and a
    * candidate that lands on the anchor's own label is DROPPED, not
    * re-probed (re-probing is a sequential dependence that cannot be
    * expressed as one parallel scan). Callers get ≤ k negatives per
    * anchor plus the audit of which slots were lost; oversample k to
    * absorb the loss (for L labels uniformly, expect k·(L−1)/L kept).
    *
    * Scale shape: the positive map and corpus count are per-label /
    * scalar aggregates — broadcast back, the corpus never shuffles for
    * them. Candidate generation is a zero-shuffle explode (k small
    * ints per row); the only real exchange is the candidate equi-join
    * on the id (AQE-splittable, no skew: affine scatters uniformly).
    * A single-member label yields a NULL pos_id (audit, not a drop).
    */
  def contrastivePairs(df: DataFrame, k: Int, idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import graft.functions.PortableHash
    val ids = df.select(col(idCol).cast("long").as("__id"),
      col(labelCol).as("__lab"))
    val m1 = ids.groupBy("__lab").agg(min("__id").as("__m1"))
    val m2 = ids.join(broadcast(m1), "__lab")
      .filter(col("__id") =!= col("__m1"))
      .groupBy("__lab").agg(min("__id").as("__m2"))
    val n = ids.agg(count(lit(1)).as("__n"))
    val anchors = ids
      .join(broadcast(m1), Seq("__lab"))
      .join(broadcast(m2), Seq("__lab"), "left")
      .select(col("__id"), col("__lab"),
        when(col("__id") === col("__m1"), col("__m2"))
          .otherwise(col("__m1")).as("pos_id"))
    val cands = anchors.crossJoin(broadcast(n))
      .select(col("__id"), col("__lab"), col("pos_id"), col("__n"),
        explode(sequence(lit(1), lit(k))).as("slot"))
      .withColumn("__cand",
        PortableHash.affine(col("slot"), col("__id")) % col("__n"))
    cands
      .join(ids.select(col("__id").as("__cand"), col("__lab").as("neg_label")),
        Seq("__cand"))
      .filter(col("neg_label") =!= col("__lab"))
      .select(col("__id").as("anchor_id"), col("__lab").as("label"),
        col("pos_id"), col("slot").cast("long").as("slot"),
        col("__cand").as("neg_id"), col("neg_label"))
  }

  /** DuckDB twin of [[contrastivePairs]]. */
  def contrastivePairsSql(table: String, idE: String, labelE: String,
      k: Int): String = {
    import graft.functions.PortableHash
    s"""WITH __ids AS MATERIALIZED (
       |  SELECT CAST($idE AS BIGINT) AS id, $labelE AS lab FROM $table),
       |__n AS (SELECT count(*) AS n FROM __ids),
       |__m1 AS (SELECT lab, min(id) AS m1 FROM __ids GROUP BY lab),
       |__m2 AS (SELECT i.lab, min(i.id) AS m2 FROM __ids i
       |  JOIN __m1 USING (lab) WHERE i.id <> __m1.m1 GROUP BY i.lab),
       |__anchors AS (
       |  SELECT id, i.lab,
       |    CASE WHEN id = m1 THEN m2 ELSE m1 END AS pos_id
       |  FROM __ids i JOIN __m1 USING (lab) LEFT JOIN __m2 USING (lab)),
       |__cand AS (
       |  SELECT a.id, a.lab, a.pos_id, t.j AS slot,
       |    (${PortableHash.affineSql("t.j", "a.id")}) % n.n AS cand
       |  FROM __anchors a, generate_series(1, $k) t(j), __n n)
       |SELECT c.id AS anchor_id, c.lab AS label, c.pos_id,
       |  CAST(c.slot AS BIGINT) AS slot, c.cand AS neg_id,
       |  i.lab AS neg_label
       |FROM __cand c JOIN __ids i ON c.cand = i.id
       |WHERE i.lab <> c.lab""".stripMargin
  }

  // ------------------------------------------- reciprocal-rank fusion

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    * two ranked retrieval lists — the standard hybrid-search combiner:
    * lexical (BM25) and semantic (embedding cosine) rankings fuse by
    * `Σ 1/(kRrf + rank)`, which rewards items ranked well by EITHER
    * list without comparing their incommensurable scores. An id absent
    * from one list contributes 0 for that list (its rank column stays
    * NULL in the output — the audit signal for "lexical-only" vs
    * "semantic-only" hits).
    *
    * Each reciprocal is ONE IEEE double division and the fusion one
    * addition — bit-exact across engines (the reason RRF oracle-gates
    * cleanly where score-interpolation hybrids would not).
    *
    * Scale shape: inputs are already top-N lists — N rows each,
    * independent of corpus size — so the full-outer join and the final
    * TakeOrdered are driver-trivial; the heavy lifting stays in the
    * upstream retrieval operators ([[bruteForceTopK]]'s
    * corpus-never-shuffles scan, [[graft.ext.Text.bm25TopK]]'s
    * single-scan fold).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, topK: Int,
      rankCol: String = "rank", kRrf: Int = 60): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(kRrf >= 0, s"kRrf must be non-negative: $kRrf")
    val l = a.select(col(idCol), col(rankCol).cast("long").as("rank_a"))
    val r = b.select(col(idCol), col(rankCol).cast("long").as("rank_b"))
    l.join(r, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(kRrf.toDouble) +
            col("rank_a").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toDouble) +
            col("rank_b").cast("double")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }

  /** DuckDB twin of [[rrfFuse]] over two ranked CTE/table expressions
    * (each exposing `$idE` and `rank`).
    */
  def rrfFuseSql(aTable: String, bTable: String, idE: String,
      topK: Int, kRrf: Int = 60): String =
    s"""SELECT coalesce(a.$idE, b.$idE) AS $idE,
       |  a.rank AS rank_a, b.rank AS rank_b,
       |  (coalesce(1.0 / ($kRrf.0 + CAST(a.rank AS DOUBLE)), 0.0)
       |    + coalesce(1.0 / ($kRrf.0 + CAST(b.rank AS DOUBLE)), 0.0))
       |    AS rrf
       |FROM $aTable a FULL OUTER JOIN $bTable b ON a.$idE = b.$idE
       |ORDER BY rrf DESC, $idE LIMIT $topK""".stripMargin
}
