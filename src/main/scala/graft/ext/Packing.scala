package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the batch-assembly stage of a training
  * pipeline: documents (or [[Text.chunkTokens]] chunks) are packed, in
  * deterministic order, into bins of at most `budget` tokens, so every
  * training sequence wastes as little context as possible.
  *
  * Packing is inherently sequential (bin boundaries depend on the
  * running fill), so the scale move is SHARDING: rows are hash-sharded
  * up front (a pure column expression the caller picks, e.g.
  * `pmod(doc_id, nShards)`), each shard is packed independently, and
  * shards run in parallel across executors. The implementation is the
  * secondary-sort pattern: `repartition(shard)` guarantees a shard
  * never splits across partitions, `sortWithinPartitions(shard, order)`
  * streams each shard's rows in order, and one `mapPartitions` fold
  * carries (bin, fill) state row-to-row — no per-group
  * materialization, memory O(1) per partition, any number of docs per
  * shard.
  *
  * Determinism: (shard, order) is a total order, so bin ids are
  * reproducible on any cluster size — the same property the DuckDB
  * recursive-CTE oracle replays row by row.
  *
  * A doc larger than `budget` gets a bin of its own (callers chunk
  * long docs first — [[Text.chunkTokens]] — so this is the explicit
  * any-input fallback, not silent truncation).
  */
object Packing {

  /** One packed row: input identity + assigned bin and the bin's fill
    * AFTER this row (the last row of a bin reports its final fill).
    */
  final case class Packed(shard: Long, id: Long, n_tokens: Long,
      bin: Long, bin_fill: Long)

  /** Internal typed row for the fold (not `private`: the codegen'd
    * encoder deserializer must be able to instantiate it).
    */
  final case class In(shard: Long, id: Long, n_tokens: Long)

  /** Pack `(shardCol, idCol, sizeCol)` rows into ≤ `budget`-token bins
    * per shard, greedily in `idCol` order. Output: one row per input
    * with `(shard, id, n_tokens, bin, bin_fill)`; `bin` counts from 0
    * within each shard.
    */
  def packGreedy(df: DataFrame, shardCol: String, idCol: String,
      sizeCol: String, budget: Long): Dataset[Packed] = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(sizeCol).cast("long").as("n_tokens"))
      .as[In]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .mapPartitions { rows =>
        // streaming fold; state resets at shard boundaries
        var started = false
        var curShard = 0L
        var bin = -1L
        var fill = 0L
        rows.map { r =>
          if (!started || r.shard != curShard) {
            started = true; curShard = r.shard; bin = -1L; fill = 0L
          }
          if (bin < 0 || fill + r.n_tokens > budget) { bin += 1; fill = 0L }
          fill += r.n_tokens
          Packed(r.shard, r.id, r.n_tokens, bin, fill)
        }
      }
  }

  /** DuckDB twin: per-shard greedy replay via a recursive CTE walking
    * `row_number` order — sequential semantics made explicit.
    * `inner` must produce columns (shard, id, n_tokens).
    */
  def packGreedySql(inner: String, budget: Long): String =
    s"""WITH RECURSIVE __d AS MATERIALIZED (
       |  SELECT shard, id, n_tokens,
       |    row_number() OVER (PARTITION BY shard ORDER BY id) AS rn
       |  FROM ($inner)),
       |__p AS (
       |  SELECT shard, id, n_tokens, rn,
       |    CAST(0 AS BIGINT) AS bin, n_tokens AS bin_fill
       |  FROM __d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.id, d.n_tokens, d.rn,
       |    CASE WHEN p.bin_fill + d.n_tokens > $budget
       |      THEN p.bin + 1 ELSE p.bin END,
       |    CASE WHEN p.bin_fill + d.n_tokens > $budget
       |      THEN d.n_tokens ELSE p.bin_fill + d.n_tokens END
       |  FROM __p p JOIN __d d ON d.shard = p.shard AND d.rn = p.rn + 1)
       |SELECT shard, id, n_tokens, bin, bin_fill FROM __p""".stripMargin

  /** Length-grouped batching audit: bin rows into `nBins` exact
    * equi-depth LENGTH buckets per key and report, per bucket, the
    * padding waste a max-length-padded batch of that bucket would pay —
    * `waste_ppm = (max_len·n − Σlen) · 10⁶ div (max_len·n)`, exact
    * BIGINT throughout. Length-grouped batching (bucketed batch
    * sampling) is the standard fix for padding-dominated training
    * steps; this measures what it buys BEFORE committing to it:
    * `nBins = 1` is the unbucketed baseline, and the waste drop from 1
    * to B bins is the padding the bucketing eliminates.
    *
    * Scale shape: ranks come from [[graft.ops.ScaleOps.rankSliced]]
    * (hot keys spread over slices, no per-key window funnel); per-key
    * sizes ride a broadcast aggregate; the per-bucket rollup is
    * map-side combinable on (key, bin).
    */
  def paddingAudit(df: DataFrame, key: org.apache.spark.sql.Column,
      idCol: String, len: org.apache.spark.sql.Column, nBins: Int,
      slices: Int = 16, lo: Double = 0.0,
      hi: Double = 4096.0): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val ranked = graft.ops.ScaleOps.rankSliced(
      df.select(key.as("__k"), col(idCol), len.cast("long").as("__len")),
      col("__k"), idCol, col("__len"), slices, lo, hi)
    val ns = ranked.groupBy("key").agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(ns), Seq("key"))
      .withColumn("bin", expr(s"(rank - 1L) * ${nBins}L div __n"))
      .groupBy("key", "bin")
      .agg(count(lit(1)).as("n_rows"),
        max(col("score")).cast("long").as("max_len"),
        sum(col("score").cast("long")).as("sum_len"))
      .withColumn("waste_ppm",
        when(col("max_len") * col("n_rows") === 0L, lit(0L))
          .otherwise(expr(
            "(max_len * n_rows - sum_len) * 1000000L div (max_len * n_rows)")))
  }

  /** DuckDB twin of [[paddingAudit]]: the single-window formulation. */
  def paddingAuditSql(table: String, keyE: String, idE: String,
      lenE: String, nBins: Int): String =
    s"""WITH __r AS (
       |  SELECT $keyE AS key, CAST($lenE AS BIGINT) AS len,
       |    row_number() OVER (PARTITION BY $keyE
       |      ORDER BY CAST($lenE AS DOUBLE) DESC, $idE) AS rank,
       |    count(*) OVER (PARTITION BY $keyE) AS n
       |  FROM $table)
       |SELECT key, CAST((rank - 1) * $nBins // n AS BIGINT) AS bin,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(max(len) AS BIGINT) AS max_len,
       |  CAST(sum(len) AS BIGINT) AS sum_len,
       |  CAST(CASE WHEN max(len) * count(*) = 0 THEN 0
       |    ELSE (max(len) * count(*) - sum(len)) * 1000000
       |      // (max(len) * count(*)) END AS BIGINT) AS waste_ppm
       |FROM __r GROUP BY key, bin""".stripMargin
}
