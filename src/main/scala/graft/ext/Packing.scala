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
}
