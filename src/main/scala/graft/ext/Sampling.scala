package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic, engine-portable sampling — the subsampling stage of a
  * training-data mixer ("keep 100% of code, 30% of English web, 5% of
  * low-quality crawl"), built so the SAME rows are selected on every
  * run, every engine, every cluster size.
  *
  * Mechanism: a row is kept iff `sampleHash(key) < rate·P` — a pure
  * per-row predicate on a stable key. That buys, for free:
  *   - reproducibility: re-runs (and the DuckDB oracle) pick identical
  *     rows, unlike `df.sample()` whose selection depends on partition
  *     layout and seed plumbing;
  *   - consistency under growth: a row's fate never changes as the
  *     corpus around it grows, so incremental pipelines don't churn;
  *   - nested samples: a 5% sample IS a subset of a 30% sample of the
  *     same key — rate sweeps are monotone, no resample noise;
  *   - scale: zero shuffle, zero state — the predicate rides the scan
  *     (codegen'd) on any number of executors.
  *
  * The hash is [[sampleHash]]: [[PortableHash.polyHash]] scrambled
  * through one [[PortableHash.affine]] step. The scramble is
  * load-bearing, not decoration — a bare Horner fold of a SHORT key
  * (numeric ids are 1-10 chars) lands in [0, ~31^len·127], far below
  * P, so every row would pass any non-tiny threshold and the "sample"
  * would silently keep everything; the affine multiply spreads those
  * small values across [0, P) (measured: rates accurate to ~2% at
  * n=600, ~0.1% at n=60k). Production at 100 TB swaps in `xxhash64`
  * via the `hash` parameter — same topology, ~4× cheaper per char, no
  * longer cross-engine-checkable.
  */
object Sampling {

  import PortableHash.P

  /** Keep-decision hash: poly fold + affine scramble, uniform on [0, P)
    * even for short keys. The DuckDB twin is [[sampleHashSql]].
    */
  def sampleHash(c: Column): Column = seededHash(7)(c)

  def sampleHashSql(e: String): String = seededHashSql(7)(e)

  /** Seeded variant: pipelines that sample/cap/shard the SAME key column
    * in successive stages must use a DIFFERENT seed per stage — with one
    * shared hash the stages' keep decisions correlate (e.g. a per-domain
    * cap keeping the highest hashes starves a downstream `h < rate·P`
    * sample that keeps the lowest), silently skewing effective rates.
    */
  def seededHash(seed: Int)(c: Column): Column =
    PortableHash.affine(lit(seed), PortableHash.polyHash(c))

  def seededHashSql(seed: Int)(e: String): String =
    PortableHash.affineSql(seed.toString,
      s"(${PortableHash.polyHashSql(e)})")

  /** Threshold-grade scramble: cube then affine. [[seededHash]] is
    * LINEAR in the poly hash, and short numeric keys span only
    * ~10⁴-10⁵ of the [0, P) domain — a·x+b maps such a set onto a
    * handful of wrapping segments, so a small threshold bucket
    * (`h < 0.05·P`) can catch almost nothing (measured: an
    * 0.8/0.1/0.1 split of 500 numeric ids landed 489/1/10 under
    * seededHash). Cubing mod P first is non-linear, so nearby keys
    * scatter across the domain before the affine mixes the seed in —
    * the same 500-id split lands within a few percent of nominal.
    * Use this for threshold-bucket ops (splits, fractional epochs);
    * rank-based ops (capPerKey, budgetPerKey, shardAssign) only need
    * a consistent order and keep the cheaper [[seededHash]].
    * All intermediates stay < 2^63: x < P ≈ 2^30 ⇒ x² < 2^60, and
    * (x² mod P)·x < 2^60.
    */
  def spreadHash(seed: Int)(c: Column): Column = {
    val x = PortableHash.polyHash(c)
    PortableHash.affine(lit(seed), x * x % P * x % P)
  }

  def spreadHashSql(seed: Int)(e: String): String = {
    val x = s"(${PortableHash.polyHashSql(e)})"
    PortableHash.affineSql(seed.toString, s"($x * $x % $P * $x % $P)")
  }

  private def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    math.round(rate * P)
  }

  /** Uniform deterministic sample: keep rows with hash(key) < rate·P. */
  def deterministic(df: DataFrame, key: Column, rate: Double,
      hash: Column => Column = sampleHash): DataFrame =
    df.filter(hash(key.cast("string")) < lit(threshold(rate)))

  /** Per-stratum deterministic sample. `rates` maps stratum values to
    * keep-rates; unlisted strata fall back to `defaultRate`. The rate
    * lookup is a broadcast-free map literal (`element_at` over a
    * `typedLit` map — pure expression, stays inside whole-stage
    * codegen); the keep decision is the same per-row hash predicate as
    * [[deterministic]], so stratified output = union of per-stratum
    * uniform samples, with all the same guarantees.
    */
  def stratified(df: DataFrame, key: Column, strata: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      hash: Column => Column = sampleHash): DataFrame = {
    val thresholds: Map[String, Long] =
      rates.map { case (s, r) => s -> threshold(r) }
    // try_element_at, not element_at: under spark.sql.ansi.enabled a
    // missing map key must fall through to defaultRate, not throw
    // MAP_KEY_DOES_NOT_EXIST.
    val t = coalesce(
      try_element_at(typedLit(thresholds), strata.cast("string")),
      lit(threshold(defaultRate)))
    df.filter(hash(key.cast("string")) < t)
  }

  /** DuckDB twin of the [[stratified]] keep-predicate, for oracle SQL:
    * `CASE strata WHEN 's1' THEN h < t1 ... ELSE h < tDefault END`.
    */
  def stratifiedSql(keyE: String, strataE: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): String = {
    val h = sampleHashSql(s"CAST($keyE AS VARCHAR)")
    val arms = rates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"WHEN '${s.replace("'", "''")}' THEN $h < ${threshold(r)}"
    }.mkString(" ")
    s"(CASE CAST($strataE AS VARCHAR) $arms ELSE $h < ${threshold(defaultRate)} END)"
  }

  /** Temperature-flattened mixture resampling — the domain-mixing stage
    * of a training-data pipeline: a raw crawl is dominated by a few huge
    * sources; flattening keeps rare domains/languages represented
    * without manually tuning a rate per stratum. Stratum `s` with `n_s`
    * rows keeps rate `min(1, baseRate · sqrt(n_max / n_s))` — the
    * largest stratum keeps `baseRate`, a 4×-smaller one keeps 2× that
    * (temperature α = 0.5 relative to the head stratum).
    *
    * Normalizing against `max` rather than `Σ n_s^α` is deliberate:
    * max of integers is exact and order-independent, while a float sum
    * over strata would make the rates depend on engine accumulation
    * order and break bit-equal verification. `sqrt` and one multiply /
    * divide are correctly-rounded IEEE ops — identical in any engine.
    *
    * Scale shape: the stratum-count aggregate is map-side-combined
    * (bytes ∝ #strata); rates broadcast back onto the scan; the keep
    * decision is the same deterministic per-row hash predicate as
    * [[deterministic]] (reproducible, nested across baseRate sweeps,
    * zero shuffle of corpus rows).
    */
  def temperatureMix(df: DataFrame, key: Column, strata: Column,
      baseRate: Double, hash: Column => Column = sampleHash): DataFrame = {
    require(baseRate >= 0.0 && baseRate <= 1.0,
      s"baseRate must be in [0,1]: $baseRate")
    val counts = df.groupBy(strata.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val nMax = counts.agg(max(col("__n")).as("__n_max"))
    val rates = counts.crossJoin(broadcast(nMax)).select(col("__stratum"),
      least(lit(1.0), lit(baseRate) *
        sqrt(col("__n_max").cast("double") / col("__n").cast("double")))
        .as("__rate"))
    // Null-safe equality: a null stratum forms its own group in the
    // count aggregate, so it must also match its rate row here — a
    // plain === would silently drop every null-stratum row.
    df.join(broadcast(rates), strata <=> col("__stratum"))
      .filter(hash(key.cast("string")).cast("double") <
        col("__rate") * lit(P.toDouble))
      .drop("__stratum", "__rate")
  }

  /** DuckDB twin of the [[temperatureMix]] rate formula (one stratum's
    * keep-rate, given per-stratum count `nE` and global max `nMaxE`).
    */
  def temperatureRateSql(baseRate: Double, nE: String, nMaxE: String): String =
    s"least(1.0, $baseRate * sqrt(CAST($nMaxE AS DOUBLE) / CAST($nE AS DOUBLE)))"

  /** Per-key cap — "keep at most `n` docs per domain/source", the standard
    * web-curation guard against a single crawl host dominating the mix.
    * Which `n` survive is deterministic: the `n` highest [[sampleHash]]
    * values win (ties by smallest id), so the kept set is stable across
    * runs and engines, and re-crawling a domain only displaces rows at the
    * hash boundary.
    *
    * Scale shape: NOT a `row_number()` window — a hot domain would funnel
    * its millions of rows through one reducer just to discard all but
    * `n`. [[graft.functions.TopK.topKByScore]] runs as a two-phase
    * ObjectHashAggregate: each map task keeps an `n`-bounded heap per key,
    * and only heaps (≤ `n` ids each) cross the shuffle. The final
    * semi-join back to the corpus is a plain equi-join on the id (AQE
    * broadcasts it when `n`·|keys| is small).
    *
    * `idCol` must uniquely identify rows (it is the semi-join key).
    */
  def capPerKey(df: DataFrame, key: Column, idCol: String, n: Int,
      hash: Column => Column = sampleHash): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    val kept = df
      .select(key.as("__key"), col(idCol),
        hash(col(idCol).cast("string")).cast("double").as("__h"))
      .groupBy(col("__key"))
      .agg(graft.functions.TopK.topKByScore(col("__h"), col(idCol), n)
        .as("__top"))
      .select(explode(col("__top.item")).as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Token-budget cap — "take documents per source, in deterministic
    * hash order, until the source's token budget is spent" (the
    * Dolma/DataComp-style mixer stage where quotas are in TOKENS, not
    * document counts, so [[capPerKey]]'s fixed-N is the wrong unit).
    * A document is admitted iff the running token total of the docs
    * ahead of it (same key, (hash, id) order) is still below `budget`
    * — so one oversized doc can overshoot by at most itself, and the
    * admitted set is stable across runs/engines and monotone in
    * `budget`.
    *
    * Scale shape — the scalable windowed cumsum: a plain
    * `sum() over (partition by key order by ...)` funnels every hot
    * source through ONE reducer (the same hazard [[capPerKey]] and
    * `AsOfJoin.asOfSliced` dodge). Instead the hash order is cut into
    * `slices` contiguous ranges of the hash domain, and the cumsum
    * decomposes into:
    *   1. per-(key, slice) totals — map-side-combined hash aggregate,
    *      ≤ `slices` rows per key cross the shuffle;
    *   2. per-key running offsets over those totals — a window whose
    *      partitions hold ≤ `slices` rows by construction;
    *   3. a per-(key, slice) local running sum + the slice's offset —
    *      window partitions now hold ~1/`slices` of a hot key each.
    * Identical result to the single-window form (the oracle IS the
    * single-window form); reducer bound improves `slices`-fold, and
    * `slices` scales independently of cluster size.
    */
  def budgetPerKey(df: DataFrame, key: Column, idCol: String,
      weight: Column, budget: Long, slices: Int = 16,
      hash: Column => Column = sampleHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be positive: $budget")
    require(slices > 0, s"slices must be positive: $slices")
    val base = df.select(key.as("__key"), col(idCol),
      weight.cast("long").as("__w"),
      hash(col(idCol).cast("string")).as("__h"))
    // hash ∈ [0, P); slice = h·slices / P is contiguous in hash order,
    // so per-slice sums + offsets reassemble the exact per-key cumsum.
    // h < 2^30 and slices ≤ ~2^30 keep the product below 2^63.
    val sliced = base.withColumn("__slice",
      floor(col("__h") * lit(slices.toLong) / lit(P)).cast("int"))
    val offsetW = Window.partitionBy("__key").orderBy("__slice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy("__key", "__slice")
      .agg(sum("__w").as("__slice_total"))
      .withColumn("__offset",
        coalesce(sum("__slice_total").over(offsetW), lit(0L)))
      .drop("__slice_total")
    val localW = Window.partitionBy("__key", "__slice")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    sliced.join(offsets, Seq("__key", "__slice"))
      .withColumn("__cum", col("__offset") + sum("__w").over(localW))
      .filter(col("__cum") - col("__w") < budget)
      .select(col(idCol), col("__key").as("key"), col("__w").as("weight"),
        col("__cum").as("running_total"))
  }

  /** DuckDB twin of [[budgetPerKey]]: the single-window formulation the
    * sliced decomposition must reproduce exactly.
    */
  def budgetPerKeySql(table: String, keyE: String, idE: String,
      weightE: String, budget: Long): String = {
    val h = sampleHashSql(s"CAST($idE AS VARCHAR)")
    s"""SELECT $idE, $keyE AS key, CAST($weightE AS BIGINT) AS weight,
       |  CAST(sum(CAST($weightE AS BIGINT)) OVER (PARTITION BY $keyE
       |    ORDER BY ($h), $idE ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS running_total
       |FROM $table
       |QUALIFY running_total - CAST($weightE AS BIGINT) < $budget""".stripMargin
  }

  /** Weighted priority sample — k rows per stratum with inclusion odds
    * ∝ `weight` (Efraimidis-Spirakis A-Res, the deterministic integer
    * variant): each row draws priority `hash(id) / weight` and the k
    * SMALLEST priorities per stratum win. A row with twice the weight
    * halves its priority, so heavier rows win proportionally more of
    * the time — the standard "sample k docs per domain, favoring long /
    * high-quality ones" mixer stage. Deterministic: same corpus → same
    * sample, and the sample is stable under re-partitioning because
    * the priority depends only on (id, weight).
    *
    * Uses [[spreadHash]], not [[seededHash]]: the weighting argument
    * needs `h` uniform on [0, P), not merely consistently ordered —
    * the linear hash's segment clustering on short numeric ids would
    * skew effective inclusion odds.
    *
    * Exactness: priority is one IEEE division of two exactly-
    * representable doubles (h < 2³⁰, integer weight) — bit-identical
    * in any engine; ties (hash collisions) break on smallest id via
    * the heap's item ordering = the oracle's `ORDER BY pri ASC, id`.
    *
    * Scale shape: per-stratum k-bounded heaps
    * ([[graft.functions.TopK.topKByScore]]) — map-side partials, only
    * ≤ k-entry heaps cross the shuffle; NO window, so a hot stratum
    * never funnels through one reducer. Rows with `weight ≤ 0` are
    * excluded (a zero weight has no well-defined priority).
    */
  def weightedPriority(df: DataFrame, strata: Column, idCol: String,
      weight: Column, k: Int, seed: Int = 23): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = weight.cast("long")
    val pri = spreadHash(seed)(col(idCol).cast("string")).cast("double") /
      w.cast("double")
    df.filter(w > 0L)
      .select(strata.as("stratum"), col(idCol), w.as("__w"),
        pri.as("__pri"))
      .groupBy(col("stratum"))
      .agg(graft.functions.TopK.topKByScore(-col("__pri"),
        struct(col(idCol), col("__w"), col("__pri")), k).as("__top"))
      .select(col("stratum"), posexplode(col("__top.item")))
      .select(col("stratum"), (col("pos") + 1L).cast("long").as("rank"),
        col(s"col.$idCol").as(idCol), col("col.__w").as("weight"),
        col("col.__pri").as("priority"))
  }

  /** DuckDB twin of [[weightedPriority]]: the single-window top-k
    * formulation the bounded-heap aggregate must reproduce exactly.
    */
  def weightedPrioritySql(table: String, strataE: String, idE: String,
      weightE: String, k: Int, seed: Int = 23): String = {
    val h = spreadHashSql(seed)(s"CAST($idE AS VARCHAR)")
    s"""SELECT stratum, rank, $idE, weight, priority FROM (
       |  SELECT $strataE AS stratum, $idE,
       |    CAST($weightE AS BIGINT) AS weight,
       |    CAST(($h) AS DOUBLE) / CAST($weightE AS DOUBLE) AS priority,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY $strataE
       |      ORDER BY CAST(($h) AS DOUBLE) / CAST($weightE AS DOUBLE) ASC,
       |        $idE ASC) AS BIGINT) AS rank
       |  FROM $table WHERE CAST($weightE AS BIGINT) > 0)
       |WHERE rank <= $k""".stripMargin
  }

  /** Token-budget water-filling across sources — the fair-cap computation
    * of a training-mix recipe: given per-source token totals `T_s` and a
    * global budget `B < ΣT_s`, find the level `L` such that
    * `Σ min(T_s, L) = B`: sources under the level keep everything,
    * sources above are capped at `L` (the `rem = B mod`-ish leftovers go
    * +1 each to the first capped sources in source order, so the
    * allocation sums to EXACTLY `B`). This is the principled version of
    * hand-tuned per-domain caps: one knob (the budget), maximal
    * smallest-source retention. With `B ≥ ΣT_s` every source keeps its
    * total (`capped = false`, `level` null).
    *
    * All integer arithmetic. The bracket search is the closed form over
    * sources sorted by total ascending: the first index `i` (totals
    * `T_1 ≤ … ≤ T_N`, prefix `P`) with `B − P_{i−1} ≤ (N−i+1)·T_i`
    * holds the level: `L = (B − P_{i−1}) div (N−i+1)` and
    * `rem = (B − P_{i−1}) mod (N−i+1)`.
    *
    * Scale shape: the per-source aggregate is map-side combined (bytes
    * ∝ #sources); the windows then run over ≤ #sources rows — a global
    * window is FINE here because its partition is the source list, not
    * the corpus (tens of rows at any scale). Products stay far below
    * 2⁶³: `N · T_i ≤ #sources · Σtokens`. Compose with
    * [[budgetPerKey]] to turn each source's allocation into an actual
    * document admission set.
    */
  def waterfill(df: DataFrame, strata: Column, weight: Column,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be positive: $budget")
    val totals = df.groupBy(strata.as("source"))
      .agg(sum(weight.cast("long")).as("tokens"))
    val byTok = Window.orderBy(col("tokens").asc, col("source").asc)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bySrc = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = totals
      .withColumn("__i", row_number().over(byTok).cast("long"))
      .withColumn("__prefix", coalesce(sum("tokens").over(
        byTok.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__rest", lit(budget) - col("__prefix"))
      .withColumn("__bracket", min(when(
        col("__rest") <= (col("__n") - col("__i") + 1L) * col("tokens"),
        col("__i"))).over(all))
      // `div`, not `/`: Column./ on longs is DOUBLE division (exactness
      // dies past 2^53); div is the exact integer quotient, = DuckDB //.
      .withColumn("__level", max(when(col("__i") === col("__bracket"),
        expr("__rest div (__n - __i + 1)"))).over(all))
      .withColumn("__rem", max(when(col("__i") === col("__bracket"),
        col("__rest") % (col("__n") - col("__i") + 1L))).over(all))
      .withColumn("__capRank", sum(when(
        col("__bracket").isNotNull && col("__i") >= col("__bracket"),
        1L).otherwise(0L)).over(bySrc))
    staged.select(col("source"), col("tokens"),
      when(col("__bracket").isNull || col("__i") < col("__bracket"),
          col("tokens"))
        .otherwise(col("__level") +
          when(col("__capRank") <= col("__rem"), 1L).otherwise(0L))
        .cast("long").as("alloc"),
      (col("__bracket").isNotNull && col("__i") >= col("__bracket"))
        .as("capped"),
      col("__level").as("level"))
  }

  /** DuckDB twin of [[waterfill]] over a table. Every windowed sum is
    * CAST back to BIGINT (DuckDB widens to HUGEINT).
    */
  def waterfillSql(table: String, strataE: String, weightE: String,
      budget: Long): String =
    s"""WITH __tot AS (
       |  SELECT $strataE AS source,
       |    CAST(sum(CAST($weightE AS BIGINT)) AS BIGINT) AS tokens
       |  FROM $table GROUP BY 1),
       |__st AS (
       |  SELECT source, tokens,
       |    CAST(ROW_NUMBER() OVER (ORDER BY tokens, source) AS BIGINT)
       |      AS i,
       |    CAST(coalesce(sum(tokens) OVER (ORDER BY tokens, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS prefix,
       |    CAST(count(*) OVER () AS BIGINT) AS n
       |  FROM __tot),
       |__br AS (
       |  SELECT *, $budget - prefix AS rest,
       |    min(CASE WHEN $budget - prefix <= (n - i + 1) * tokens
       |      THEN i END) OVER () AS bracket
       |  FROM __st),
       |__lv AS (
       |  SELECT *,
       |    max(CASE WHEN i = bracket
       |      THEN CAST(rest // (n - i + 1) AS BIGINT) END) OVER ()
       |      AS level,
       |    max(CASE WHEN i = bracket
       |      THEN CAST(rest % (n - i + 1) AS BIGINT) END) OVER ()
       |      AS rem,
       |    CAST(sum(CASE WHEN bracket IS NOT NULL AND i >= bracket
       |      THEN 1 ELSE 0 END) OVER (ORDER BY source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cap_rank
       |  FROM __br)
       |SELECT source, tokens,
       |  CAST(CASE WHEN bracket IS NULL OR i < bracket THEN tokens
       |    ELSE level + (CASE WHEN cap_rank <= rem THEN 1 ELSE 0 END)
       |    END AS BIGINT) AS alloc,
       |  (bracket IS NOT NULL AND i >= bracket) AS capped,
       |  level
       |FROM __lv""".stripMargin

  /** Epoch-based source upsampling — the inverse of [[temperatureMix]]:
    * instead of downsampling dominant sources, REPEAT scarce high-value
    * sources a fractional number of epochs (the "2.5 epochs of
    * Wikipedia, 0.4 of common crawl" mixing recipe of LLM training
    * runs). Stratum with `epochs = e` emits `floor(e)` copies of every
    * row, plus one more iff `hash(key) < frac(e)·P` — so the expected
    * multiplicity is exactly `e`, the extra-copy set is a deterministic
    * nested sample (2.3 epochs ⊂ 2.7 epochs for the same stratum), and
    * `e < 1` degenerates to [[deterministic]] sampling. Each copy
    * carries a 0-based `epoch` index so the downstream training-order
    * shuffle ([[shardAssign]] on `(key, epoch)`) spreads repeats across
    * shards instead of emitting them adjacent.
    *
    * Fractional thresholds are folded into a per-stratum LONG literal
    * map at build time (same integer-exact shape as [[stratified]]);
    * the multiplicity is pure per-row arithmetic and the copies come
    * from one codegen'd `explode(sequence(...))` — zero shuffle, zero
    * state, output size = Σ multiplicities. The dedup/dup-aware caveat:
    * run this AFTER dedup and budget stages — upsampled copies are
    * intentional duplicates and must not re-enter them.
    */
  def epochMix(df: DataFrame, key: Column, strata: Column,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      hash: Column => Column = spreadHash(19)): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0),
      s"epochs must be non-negative: $epochs default=$defaultEpochs")
    // the output ADDS `epoch`; an existing column of that name would be
    // silently overwritten (the scd1-flag-collision class of bug)
    require(!df.columns.contains("epoch"),
      "epochMix adds an `epoch` column; the input already has one")
    def base(e: Double): Long = math.floor(e).toLong
    def thr(e: Double): Long = math.round((e - math.floor(e)) * P)
    val baseMap = epochs.map { case (s, e) => s -> base(e) }
    val thrMap = epochs.map { case (s, e) => s -> thr(e) }
    val s = strata.cast("string")
    val b = coalesce(try_element_at(typedLit(baseMap), s),
      lit(base(defaultEpochs)))
    val t = coalesce(try_element_at(typedLit(thrMap), s),
      lit(thr(defaultEpochs)))
    val n = b + when(hash(key.cast("string")) < t, lit(1L)).otherwise(lit(0L))
    // sequence(0, -1) would yield a DESCENDING [0, -1] (negative-step
    // inference), so zero-multiplicity rows must be filtered BEFORE the
    // explode, not emptied by it.
    df.withColumn("__n", n)
      .filter(col("__n") >= 1L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1L)))
      .drop("__n")
  }

  /** DuckDB twin of [[epochMix]]'s multiplicity expression (the `n`
    * copies a row of stratum `strataE` with key `keyE` receives).
    */
  def epochMixSql(keyE: String, strataE: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      seed: Int = 19): String = {
    val h = spreadHashSql(seed)(s"CAST($keyE AS VARCHAR)")
    def base(e: Double): Long = math.floor(e).toLong
    def thr(e: Double): Long = math.round((e - math.floor(e)) * P)
    val arms = epochs.toSeq.sortBy(_._1).map { case (s, e) =>
      s"WHEN '${s.replace("'", "''")}' THEN ${base(e)} + " +
        s"(CASE WHEN $h < ${thr(e)} THEN 1 ELSE 0 END)"
    }.mkString(" ")
    s"(CASE CAST($strataE AS VARCHAR) $arms ELSE ${base(defaultEpochs)} + " +
      s"(CASE WHEN $h < ${thr(defaultEpochs)} THEN 1 ELSE 0 END) END)"
  }

  /** Disjoint multi-way split assignment — train/val/test (or any
    * weighted partition) from ONE hash: bucket `i` takes the hash range
    * `[cum_{i-1}·P, cum_i·P)`, so the splits are disjoint and
    * exhaustive BY CONSTRUCTION (three independent rate-samples would
    * overlap), deterministic across runs/engines/cluster sizes, and
    * stable under corpus growth — a doc never migrates between splits
    * as data is added, which is what keeps eval sets honest over time.
    * Zero shuffle: one hash + a literal CASE chain riding the scan.
    */
  def splitAssign(df: DataFrame, key: Column,
      splits: Seq[(String, Double)],
      hash: Column => Column = spreadHash(23)): DataFrame = {
    require(splits.nonEmpty, "splitAssign needs at least one split")
    require(splits.forall(_._2 > 0.0), s"weights must be positive: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be unique: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1: $splits")
    require(!df.columns.contains("split"),
      "splitAssign adds a `split` column; the input already has one")
    val h = hash(key.cast("string"))
    // cumulative thresholds; the LAST bucket is the otherwise-branch so
    // rounding at the top end can never leave a row unassigned
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val cased = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1)) { case (((name, _), cum), rest) =>
        when(h < lit(math.round(cum * P)), lit(name)).otherwise(rest)
    }
    df.withColumn("split", cased)
  }

  /** Leakage-safe split: [[splitAssign]] where every member of a dup
    * cluster lands in the SAME split. Plain per-doc splitting leaks
    * evaluation data — a near-duplicate pair straddling train/test means
    * the model is scored on (a copy of) its own training data, which is
    * exactly what near-dedup was run to prevent. Hashing the CLUSTER
    * label (min-id component from [[Dedup.dupComponents]]) instead of
    * the doc id makes the whole cluster move as one unit; docs in no
    * cluster hash their own id, so for them the assignment is identical
    * to [[splitAssign]] — adding edges never migrates an untouched doc.
    *
    * Scale shape: `components` is delta-sized (only docs with a dup
    * edge appear — at production dup rates a few percent of the
    * corpus), so the left join broadcasts or, past that, shuffles only
    * (id, component) pairs against the corpus ids; the split itself
    * stays a zero-shuffle literal CASE on the coalesced label.
    *
    * @param components (`idCol`, `component`) pairs from
    *                   [[graft.ext.Dedup.dupComponents]] (its `id`
    *                   column renamed/aliased to `idCol` if needed)
    */
  def splitByCluster(df: DataFrame, idCol: String, components: DataFrame,
      splits: Seq[(String, Double)],
      hash: Column => Column = spreadHash(23)): DataFrame = {
    require(!df.columns.contains("group_key"),
      "splitByCluster adds a `group_key` column; the input already has one")
    val comp = components.select(col(idCol).as("__cid"),
      col("component").as("__component"))
    val labeled = df.join(comp, col(idCol) === col("__cid"), "left")
      .withColumn("group_key", coalesce(col("__component"), col(idCol)))
      .drop("__cid", "__component")
    splitAssign(labeled, col("group_key"), splits, hash)
  }

  /** DuckDB twin of [[splitAssign]]'s CASE chain. */
  def splitAssignSql(keyE: String, splits: Seq[(String, Double)],
      seed: Int = 23): String = {
    val h = spreadHashSql(seed)(s"CAST($keyE AS VARCHAR)")
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val arms = splits.init.zip(cums.init).map { case ((name, _), cum) =>
      s"WHEN $h < ${math.round(cum * P)} THEN '${name.replace("'", "''")}'"
    }.mkString(" ")
    s"(CASE $arms ELSE '${splits.last._1.replace("'", "''")}' END)"
  }

  /** Training-order shuffle + shard assignment: `pos` is the portable
    * hash of the key (a deterministic global permutation — the "shuffle
    * the corpus before training" step), `shard` spreads that order over
    * `numShards` output files. Pure per-row arithmetic: zero shuffle to
    * ASSIGN; the physical clustering is the caller's one
    * `repartitionByRange(shard, pos)` + `sortWithinPartitions` before the
    * sharded write (each output file is then a contiguous, sorted slice
    * of the global order).
    */
  def shardAssign(df: DataFrame, key: Column, numShards: Int,
      hash: Column => Column = sampleHash): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    df.withColumn("pos", hash(key.cast("string")))
      .withColumn("shard", pmod(col("pos"), lit(numShards.toLong)).cast("int"))
  }

  /** DuckDB twin of [[shardAssign]]'s two derived columns. */
  def shardAssignSql(keyE: String, numShards: Int): (String, String) = {
    val pos = sampleHashSql(s"CAST($keyE AS VARCHAR)")
    (pos, s"CAST(($pos) % $numShards AS INTEGER)")
  }

  /** Curriculum phase assignment: rank every row within its key by a
    * difficulty score (exact, via
    * [[graft.ops.ScaleOps.rankSliced]] — no per-key window funnel) and
    * bucket the percentile into `phases` equal bands. Phase 0 holds the
    * HIGHEST scores (rank 1 side); a curriculum that trains easy→hard
    * feeds phases in whichever order its difficulty convention needs.
    * Per-source ranking IS the calibration: scores from different
    * sources are never compared directly, only their within-source
    * percentiles — the standard fix for incomparable quality scales.
    *
    * `phase = min(⌊pct · phases⌋, phases−1)`: pct is the exact
    * PERCENT_RANK both engines compute bit-identically; floor + clamp
    * are engine-exact.
    */
  def curriculum(df: DataFrame, key: Column, idCol: String,
      difficulty: Column, phases: Int, slices: Int = 16,
      lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(phases > 0, s"phases must be positive: $phases")
    graft.ops.ScaleOps.rankSliced(df, key, idCol, difficulty, slices, lo, hi)
      .withColumn("phase",
        least(floor(col("pct") * lit(phases.toDouble)).cast("long"),
          lit(phases.toLong - 1)))
  }

  /** DuckDB twin of [[curriculum]] over a table/CTE expression. */
  def curriculumSql(table: String, keyE: String, idE: String,
      scoreE: String, phases: Int): String = {
    val ranked = graft.ops.ScaleOps.rankSlicedSql(table, keyE, idE, scoreE)
    s"""SELECT *, least(CAST(floor(pct * $phases.0) AS BIGINT),
       |  ${phases - 1}) AS phase
       |FROM ($ranked)""".stripMargin
  }
}
