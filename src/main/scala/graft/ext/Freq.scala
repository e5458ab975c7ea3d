package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency-sketch operators over a pre-exploded item column — the
  * "which items are FREQUENT" half of the approximate-analytics pair
  * (HLL / q32 answers "how many DISTINCT"). Backed by the distributed
  * Misra–Gries aggregate ([[graft.functions.MisraGries]]): partials are
  * `capacity`-bounded maps built map-side; only those maps — never the
  * item stream — cross the shuffle.
  *
  * Production use is [[heavyHitters]] alone (no exact pass anywhere).
  * [[heavyHittersAudit]] additionally computes EXACT counts to check the
  * sketch's guarantees — that is the oracle-checkable surface, because
  * raw `est` values depend on partition order (the GUARANTEES hold for
  * every order; the values do not).
  */
object Freq {

  /** The Misra–Gries summary as rows: `(rank, item, est)`, est
    * descending (item ascending on ties), rank 1 = most frequent.
    * At most `capacity` rows. `est` never overcounts and undercounts by
    * at most N/(capacity+1); every item with true count above that
    * threshold is present.
    */
  def heavyHitters(df: DataFrame, itemCol: String, capacity: Int): DataFrame =
    df.agg(graft.functions.FreqSketch.misraGries(col(itemCol), capacity)
        .as("__sk"))
      .select(posexplode(col("__sk")))
      .select((col("pos") + 1L).cast("long").as("rank"),
        col("col.item").as(itemCol), col("col.est").as("est"))

  /** Derived-fact audit of the sketch guarantees against exact counts,
    * over the exact top-`topK` items (a deterministic row set no matter
    * how the sketch's internal state fell out):
    *
    *  - `no_overcount`: est ≤ true count (absent ⇒ est 0);
    *  - `err_bounded`:  (true − est)·(capacity+1) ≤ N;
    *  - `covered`:      in the sketch, OR below the guarantee threshold
    *                    (true·(capacity+1) ≤ N) where absence is allowed.
    *
    * All three are theorems of Misra–Gries for EVERY partitioning and
    * merge order, so the oracle emits literal TRUE. Products run in
    * DECIMAL(38,0) so a corpus big enough to overflow BIGINT fails
    * loudly in both engines instead of wrapping (same policy as
    * vocabDrift/groupDiversity).
    *
    * Scale shape: the exact side is the audit's own cost (a count
    * aggregate, map-side combined — the very thing the sketch avoids in
    * production); the sketch side is one `capacity`-bounded global
    * aggregate broadcast into the comparison.
    */
  def heavyHittersAudit(df: DataFrame, itemCol: String, capacity: Int,
      topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val exact = df.groupBy(col(itemCol)).agg(count(lit(1)).as("cnt"))
    val totals = exact.agg(sum("cnt").as("__n"))
    val sketch = heavyHitters(df, itemCol, capacity)
      .select(col(itemCol), col("est"))
    exact
      .join(sketch, Seq(itemCol), "left")
      .crossJoin(broadcast(totals))
      .select(col(itemCol), col("cnt"),
        (coalesce(col("est"), lit(0L)) <= col("cnt")).as("no_overcount"),
        (dec(col("cnt") - coalesce(col("est"), lit(0L)))
          * dec(lit(capacity + 1L)) <= dec(col("__n"))).as("err_bounded"),
        (col("est").isNotNull ||
          dec(col("cnt")) * dec(lit(capacity + 1L)) <= dec(col("__n")))
          .as("covered"))
      .orderBy(col("cnt").desc, col(itemCol))
      .limit(topK)
  }

  /** DuckDB twin of [[heavyHittersAudit]]: exact top-`topK` counts with
    * the guarantee booleans as literal TRUE (they are theorems).
    */
  def heavyHittersAuditSql(table: String, itemE: String,
      topK: Int): String =
    s"""SELECT $itemE, CAST(count(*) AS BIGINT) AS cnt,
       |  TRUE AS no_overcount, TRUE AS err_bounded, TRUE AS covered
       |FROM $table GROUP BY $itemE
       |ORDER BY cnt DESC, $itemE LIMIT $topK""".stripMargin

  /** Derived-fact audit of Spark's rank sketch (`approx_percentile`,
    * Greenwald–Khanna summaries) — the THIRD sketch of the approximate
    * family: HLL counts distinct, Misra–Gries finds frequent, GK places
    * ranks. Production use is plain `percentile_approx` (mergeable
    * map-side summaries, no sort, no shuffle of values — the way to get
    * p99s out of 100 TB); this audit checks each estimate's GK
    * guarantee against exact rank counts:
    *
    *  - `rank_lo_ok` / `rank_hi_ok`: the estimate's exact rank is
    *    within ε·N of the target rank p·N (ε = 1/accuracy; ±1 row of
    *    slack for the summary's discrete rank arithmetic);
    *  - `in_range`: the estimate is an actual data value (GK returns
    *    retained samples, never interpolates).
    *
    * The booleans hold for any partitioning (GK summaries merge with
    * additive error), so the oracle emits literal TRUE alongside the
    * exact, deterministic `n_rows` — the same pattern as
    * [[heavyHittersAudit]] and the HLL audit (q32).
    */
  def quantileAudit(df: DataFrame, valueCol: String, ps: Seq[Double],
      accuracy: Int = 1000): DataFrame = {
    require(ps.nonEmpty, "ps must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"ps must be in [0,1]: $ps")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val eps = 1.0 / accuracy
    val vals = df.filter(col(valueCol).isNotNull)
    val pArr = array(ps.map(lit): _*)
    val est = vals
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy)).as("__qs"))
      .select(posexplode(col("__qs")).as(Seq("__i", "est")))
      .select(element_at(pArr, col("__i") + 1).as("p"), col("est"))
    val audited = vals.crossJoin(broadcast(est))
      .groupBy("p", "est")
      .agg(
        sum(when(col(valueCol) <= col("est"), 1L).otherwise(0L)).as("__le"),
        sum(when(col(valueCol) < col("est"), 1L).otherwise(0L)).as("__lt"),
        sum(when(col(valueCol) === col("est"), 1L).otherwise(0L)).as("__eq"),
        count(lit(1)).as("n_rows"))
      .select(col("p"), col("n_rows"),
        (col("__le").cast("double") >=
          (col("p") - eps) * col("n_rows").cast("double") - 1.0)
          .as("rank_lo_ok"),
        (col("__lt").cast("double") <=
          (col("p") + eps) * col("n_rows").cast("double") + 1.0)
          .as("rank_hi_ok"),
        (col("__eq") > 0L).as("in_range"))
    // TOTAL over an empty input (the empty-partition run — fuzz gate):
    // `percentile_approx` of nothing is NULL, so `audited` is empty —
    // but the audit's contract is one row PER PROBE. The probe list is
    // a plan constant; left-join the audit onto it and read missing
    // audits as the vacuous truth (0 rows, every guarantee holds).
    val probeRows = df.sparkSession.range(1).select(explode(pArr).as("p"))
    probeRows.join(audited, Seq("p"), "left")
      .select(col("p"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("rank_lo_ok"), lit(true)).as("rank_lo_ok"),
        coalesce(col("rank_hi_ok"), lit(true)).as("rank_hi_ok"),
        coalesce(col("in_range"), lit(true)).as("in_range"))
      .orderBy("p")
  }

  /** DuckDB twin of [[quantileAudit]]: the probe list with the exact
    * non-null row count and the guarantee booleans as literal TRUE.
    */
  def quantileAuditSql(table: String, valueE: String,
      ps: Seq[Double]): String = {
    val probes = ps.map(p => s"($p)").mkString(", ")
    s"""SELECT CAST(t.p AS DOUBLE) AS p,
       |  (SELECT CAST(count($valueE) AS BIGINT) FROM $table) AS n_rows,
       |  TRUE AS rank_lo_ok, TRUE AS rank_hi_ok, TRUE AS in_range
       |FROM (VALUES $probes) AS t(p)
       |ORDER BY CAST(t.p AS DOUBLE)""".stripMargin
  }
}
