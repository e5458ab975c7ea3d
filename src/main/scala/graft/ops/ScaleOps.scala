package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew/shuffle-shaping utilities — the knobs a 100 TB deployment turns
  * (SURVEY.md §4.2, builder prompt "Partitioning & shuffle"). AQE handles
  * moderate runtime skew; these are the explicit forms for pathological
  * keys and for shuffle-free repeat joins.
  */
object ScaleOps {

  /** Deterministic salt in [0, salts) from arbitrary columns (xxhash64 —
    * salting only needs dispersion, not cross-engine portability).
    */
  def saltOf(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong))

  /** Two-phase (salted) aggregation: partial per (key, salt), final per
    * key. For sum/count the result is exactly the plain aggregate —
    * verified against the same SQL oracle — but no single reducer ever
    * sees a whole hot key.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16, saltSource: Seq[String] = Nil): DataFrame = {
    val src = if (saltSource.isEmpty) Seq(col(valueCol)) else saltSource.map(col)
    df.withColumn("__salt", saltOf(salts, src: _*))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("sum_" + valueCol),
        sum(col("__n")).as("n_rows"))
  }

  /** Salted equi-join for a skewed probe side: the skewed side gets a
    * deterministic salt, the build side is replicated once per salt
    * value, and the join key becomes (keys..., salt). Row multiplicity is
    * unchanged (each skewed row meets each matching build row exactly
    * once); the hot key's rows now spread over `salts` reducers.
    */
  def saltedJoin(skewed: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("__salt",
      saltOf(salts, skewed.columns.map(col).toSeq: _*))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Z-order (Morton) interleave of two non-negative dimension columns
    * — the multi-dimensional clustering key for data layout: range-
    * partitioning + sorting a table by `zValue(a, b)` clusters rows so
    * that a predicate on EITHER dimension prunes most files, where
    * sorting by `(a, b)` prunes only on `a` (b-values scatter across
    * every file). The write-side recipe is
    * `repartitionByRange(col("z")) .sortWithinPartitions("z")` before a
    * parquet write — min/max footer stats on a and b then do the
    * pruning; no read-side support is needed.
    *
    * Bit interleave: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1; both inputs must fit in `bits` bits (require ≤ 31 so the
    * result fits in a long positive range). Implemented as an unrolled
    * sum of `((x >> i) & 1) << (2i)` terms — pure integer arithmetic,
    * codegen'd, zero shuffle to COMPUTE (the one range exchange is the
    * clustering write itself), and exactly reproducible in any SQL
    * engine (the oracle twin unrolls the same terms).
    */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val lim = 1L << bits
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    // Out-of-range inputs would silently drop high bits and destroy the
    // clustering (the oracle cannot catch it — both engines truncate the
    // same way), so fail loudly instead; the twin carries the same guard.
    when(a >= 0L && a < lim && b >= 0L && b < lim, terms.reduce(_ + _))
      .otherwise(raise_error(format_string(
        s"zValue: inputs must be in [0, $lim): a=%s b=%s", a, b)))
  }

  /** DuckDB twin of [[zValue]] (same unrolled terms, same range guard). */
  def zValueSql(aE: String, bE: String, bits: Int = 21): String = {
    val lim = 1L << bits
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"((($aE >> $i) & 1) << ${2 * i})",
        s"((($bE >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
    s"CASE WHEN $aE >= 0 AND $aE < $lim AND $bE >= 0 AND $bE < $lim " +
      s"THEN $terms ELSE error('zValue: input out of range') END"
  }

  /** Exact per-key dense ranking WITHOUT a per-key window — the
    * scale-safe `row_number().over(partitionBy(key).orderBy(score))`:
    * a plain window funnels EVERY row of a hot key through one reducer;
    * this decomposes the key's order into `slices` score-contiguous
    * sub-ranges (rank = sub-range offset + local rank), so a hot key
    * spreads over `slices` reducers and the windows that remain are
    * per-(key, slice). The same decomposition as
    * [[graft.ext.Sampling.budgetPerKey]]'s sliced running sum, applied
    * to ranking; the bounded-heap `TopKByScore` covers top-K — this
    * covers FULL ranking (quantile normalization, curriculum ordering,
    * per-source percentile quality calibration), where every row needs
    * its position.
    *
    * Slicing is the pure monotone map `floor((score−lo)·slices/(hi−lo))`
    * clamped to [0, slices): equal scores always land in the same slice
    * (ties stay intact; they break on `id`, matching the oracle's
    * `ORDER BY score DESC, id`), and a mis-estimated [lo, hi) only
    * unbalances slices — never changes the output. A structural guard
    * still verifies the slice ranges are disjoint per key and
    * `raise_error`s on overlap (future non-monotone slicing bugs fail
    * loudly, not silently re-rank).
    *
    * Output: `(id, key, score, rank, pct)` — rank 1 = highest score per
    * key; `pct` = PERCENT_RANK = (rank−1)/(n−1), 0.0 for a 1-row key.
    * One shuffle of the fact side (the (key, slice) exchange that also
    * serves the local windows); offsets and key sizes ride tiny
    * broadcast aggregates.
    */
  def rankSliced(df: DataFrame, key: Column, idCol: String, score: Column,
      slices: Int = 16, lo: Double = 0.0, hi: Double = 1.0): DataFrame =
    rankSlicedFull(df, key, idCol, score, slices, lo, hi).drop("__n")

  /** [[rankSliced]] plus the per-key row count `__n` (needed by
    * [[equiDepthBins]]'s bin formula without a second pass).
    */
  private def rankSlicedFull(df: DataFrame, key: Column, idCol: String,
      score: Column, slices: Int, lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slices > 0, s"slices must be positive: $slices")
    require(hi > lo, s"need hi > lo: [$lo, $hi)")
    val s = score.cast("double")
    // Non-finite scores route explicitly: both engines sort NaN above
    // everything and +Inf above all finite values, so they belong in
    // the TOP slice (and −Inf in the bottom) — the arithmetic path
    // would put floor(NaN/±Inf) through an ANSI long cast and crash
    // (or, pre-clamp, scatter them into a wrong slice and trip the
    // disjointness guard — how the fuzz-corpus gate found this).
    val slice = when(isnan(s) || s === lit(Double.PositiveInfinity),
        lit(slices - 1))
      .when(s === lit(Double.NegativeInfinity), lit(0))
      .otherwise(least(greatest(
        floor((s - lit(lo)) * lit(slices.toDouble) / lit(hi - lo)),
        lit(0L)), lit(slices.toLong - 1)))
      .cast("int")
    val base = df.select(key.as("__key"), col(idCol), s.as("__score"),
      slice.as("__slice"))
    // per-(key, slice) counts + score ranges; the offset window runs
    // over ≤ |keys|·slices rows. Descending slice order: rank counts
    // from the TOP score down.
    val offsetW = Window.partitionBy("__key").orderBy(col("__slice").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ordW = Window.partitionBy("__key").orderBy(col("__slice").asc)
    val offsets = base.groupBy("__key", "__slice")
      .agg(count(lit(1)).as("__cnt"),
        min("__score").as("__lo"), max("__score").as("__hi"))
      .withColumn("__offset",
        coalesce(sum("__cnt").over(offsetW), lit(0L)))
      .withColumn("__prev_hi", lag("__hi", 1).over(ordW))
      // disjointness guard: a lower slice's max must stay strictly
      // below this slice's min (pure monotone slicing guarantees it;
      // anything else must explode, not silently mis-rank)
      .withColumn("__guard",
        when(col("__prev_hi").isNotNull && col("__prev_hi") >= col("__lo"),
          raise_error(format_string(
            "rankSliced: slice ranges overlap for key=%s slice=%s",
            col("__key"), col("__slice")))).otherwise(lit(0)))
      .select(col("__key"), col("__slice"), col("__offset"), col("__guard"))
    val sizes = base.groupBy("__key").agg(count(lit(1)).as("__n"))
    val localW = Window.partitionBy("__key", "__slice")
      .orderBy(col("__score").desc, col(idCol).asc)
    base.join(offsets, Seq("__key", "__slice"))
      .join(broadcast(sizes), Seq("__key"))
      .withColumn("rank",
        (col("__offset") + row_number().over(localW) + col("__guard"))
          .cast("long"))
      .select(col(idCol), col("__key").as("key"), col("__score").as("score"),
        col("rank"),
        when(col("__n") === 1L, lit(0.0))
          .otherwise((col("rank") - 1L).cast("double") /
            (col("__n") - 1L).cast("double")).as("pct"),
        col("__n"))
  }

  /** Exact global equi-depth binning per key WITHOUT a per-key window
    * funnel: every row lands in bin `⌊(rank−1)·nBins / n⌋` (bin 0 =
    * highest scores), computed on [[rankSliced]]'s decomposition — pure
    * BIGINT floor division, so the boundaries are bit-identical to the
    * single-window oracle. This is the quantile-discretizer /
    * curriculum-difficulty-bucket / per-source-quality-tier op: unlike
    * an `approx_percentile`-edged histogram the depths are EXACTLY
    * balanced (bins differ by ≤ 1 row), and unlike `ntile` over one
    * window a hot key spreads across `slices` reducers.
    *
    * Output: `(key, bin, n_rows, lo_score, hi_score)` — the realized
    * per-bin depth and score range (the empirical quantile edges). The
    * rollup reuses the ranking's `(key, slice)` exchange up to the
    * final tiny `(key, bin)` aggregate.
    */
  def equiDepthBins(df: DataFrame, key: Column, idCol: String,
      score: Column, nBins: Int, slices: Int = 16, lo: Double = 0.0,
      hi: Double = 1.0): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    rankSlicedFull(df, key, idCol, score, slices, lo, hi)
      .withColumn("bin", expr(s"(rank - 1L) * ${nBins}L div __n"))
      .groupBy("key", "bin")
      .agg(count(lit(1)).as("n_rows"),
        min("score").as("lo_score"), max("score").as("hi_score"))
  }

  /** DuckDB twin of [[equiDepthBins]]: the single-window formulation. */
  def equiDepthBinsSql(table: String, keyE: String, idE: String,
      scoreE: String, nBins: Int): String =
    s"""WITH ranked AS (
       |  SELECT $keyE AS key, CAST($scoreE AS DOUBLE) AS score,
       |    row_number() OVER (PARTITION BY $keyE
       |      ORDER BY CAST($scoreE AS DOUBLE) DESC, $idE) AS rank,
       |    count(*) OVER (PARTITION BY $keyE) AS n
       |  FROM $table)
       |SELECT key, CAST(((rank - 1) * $nBins) // n AS BIGINT) AS bin,
       |  count(*) AS n_rows, min(score) AS lo_score,
       |  max(score) AS hi_score
       |FROM ranked GROUP BY key, bin""".stripMargin

  /** DuckDB twin of [[rankSliced]]: the single-window formulation the
    * sliced decomposition must reproduce exactly.
    */
  def rankSlicedSql(table: String, keyE: String, idE: String,
      scoreE: String): String =
    s"""SELECT $idE, $keyE AS key, CAST($scoreE AS DOUBLE) AS score,
       |  CAST(row_number() OVER w AS BIGINT) AS rank,
       |  CASE WHEN count(*) OVER (PARTITION BY $keyE) = 1 THEN 0.0
       |    ELSE CAST(row_number() OVER w - 1 AS DOUBLE)
       |      / CAST(count(*) OVER (PARTITION BY $keyE) - 1 AS DOUBLE)
       |  END AS pct
       |FROM $table
       |WINDOW w AS (PARTITION BY $keyE
       |  ORDER BY CAST($scoreE AS DOUBLE) DESC, $idE)""".stripMargin

  /** Bucketed managed-table write: pre-shuffles ONCE at write time so
    * every later equi-join/aggregate on `bucketCols` runs shuffle-free
    * (bucket-local sort-merge). The pattern for fact tables joined
    * repeatedly on the same key at 100 TB.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Rolling time-RANGE aggregate per key: for every event, the sum (in
    * exact integer cents) and count of the key's events in
    * `[t − windowSec, t]` — the trailing-window rate/exposure feature
    * (fraud velocity, per-user activity, rate limiting). A RANGE frame,
    * not ROWS: all time-ties are peers and aggregate identically no
    * matter how the sort broke them, which is what makes the cents sum
    * deterministic cross-engine.
    *
    * Scale: one shuffle on the key; the frame is per-key bounded by
    * event density × window. A hot key (one user with millions of
    * in-window events) funnels its frame through one reducer — the
    * decomposition for that case is a time-slice spine as in
    * [[graft.ops.AsOfJoin.asOfSliced]] (carry a running prefix per
    * slice, range-join the remainder); at typical per-entity densities
    * the plain frame is the right plan.
    */
  def rollingTimeAgg(df: DataFrame, key: Column, tsCol: Column,
      value: Column, windowSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    // NTZ-safe by construction: TIMESTAMP passes through the cast
    // unchanged, TIMESTAMP_NTZ casts to instant under the pinned UTC
    // session zone (same rule as functions.TimeCols.toMicros — inlined
    // here because tsCol is an arbitrary Column, not a schema field, so
    // there is no dtype to dispatch on). Callers must not pass integer
    // columns: cast would silently read them as SECONDS.
    val tUs = unix_micros(tsCol.cast("timestamp"))
    // centsSafe: a NaN/Inf/NULL reading is DEFINED as missing (sum
    // skips it, count still counts the event) — the plain cast was an
    // ANSI CAST_OVERFLOW on the first non-finite measurement
    val cents = graft.queries.Q.centsSafe(value)
    val w = Window.partitionBy("__k").orderBy(col("__t_us"))
      .rangeBetween(-windowSec * 1000000L, 0L)
    df.select(key.as("__k"), tUs.as("__t_us"), cents.as("__cents"))
      .select(col("__k").as("key"), col("__t_us").as("t_us"),
        sum("__cents").over(w).as("window_cents"),
        count(lit(1)).over(w).cast("long").as("window_events"))
  }

  /** DuckDB twin of [[rollingTimeAgg]] (numeric RANGE frame over epoch
    * microseconds — identical peer semantics).
    */
  def rollingTimeAggSql(table: String, keyE: String, tsE: String,
      valueE: String, windowSec: Long): String =
    s"""SELECT $keyE AS key, epoch_us($tsE) AS t_us,
       |  CAST(sum(${graft.queries.Q.centsSafeSql(valueE)}) OVER w
       |    AS BIGINT) AS window_cents,
       |  CAST(count(*) OVER w AS BIGINT) AS window_events
       |FROM $table
       |WINDOW w AS (PARTITION BY $keyE ORDER BY epoch_us($tsE)
       |  RANGE BETWEEN ${windowSec * 1000000L} PRECEDING AND CURRENT ROW)
       |""".stripMargin
}
