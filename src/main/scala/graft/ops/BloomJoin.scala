package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered EXACT anti join — "drop everything already in the
  * seen set" at corpus scale (the standard incremental-dedup gate of a
  * training-data pipeline: new crawl vs. all previously-ingested doc
  * keys).
  *
  * Why not a plain `left_anti`: a shuffle anti join moves the FULL big
  * side across the wire, because every row needs to meet its key's
  * partition to prove absence. But absence is exactly what a Bloom
  * filter proves cheaply: a row whose key fails `mightContain` is
  * DEFINITELY unseen (no false negatives) and belongs in the result
  * with no join at all. Only the `mightContain` hits — true matches
  * plus an `fpp` fraction of false positives — need the exact anti
  * join. At 100 TB that converts a full-corpus shuffle into a
  * (match-rate + fpp)-sized one, at the cost of a second scan of the
  * big side (scans are cheap and column-pruned; shuffles are the
  * bottleneck — SCALING.md).
  *
  * The result is EXACT (byte-equal to `big.join(keys, "left_anti")`):
  * the bloom only routes rows between the no-join branch and the
  * exact-join branch, it never decides membership by itself.
  *
  * Mechanics: the filter is built DISTRIBUTED (`stat.bloomFilter` runs
  * a treeAggregate over `xxhash64(key)`; only per-partition bloom
  * bitmaps merge at the driver) and probed with Spark's own native
  * [[BloomFilterMightContain]] expression over the same `xxhash64` —
  * codegen'd, no UDF. The serialized bitmap is embedded as a literal:
  * `numBits/8` bytes held by the driver and shipped once per executor
  * with the task closure — the same lifecycle as a broadcast dim, sized
  * by `expectedItems`/`fpp`, never by row width or corpus size (Spark's
  * own runtime row-level filtering injects its bloom the same way).
  *
  * Null keys: `left_anti` keeps null-key rows (null equals nothing);
  * here a null key hashes to xxhash64's seed, so it either fails the
  * bloom (kept directly) or lands in the exact branch (kept by the
  * anti join) — both routes preserve the semantics.
  */
object BloomJoin {

  /** `mightContain` probe column over a driver-held bloom filter built
    * by [[buildFilter]] (exposed for composing other bloom-gated plans,
    * e.g. a semi-join prefilter, where it prunes BEFORE the shuffle).
    */
  def mightContain(bf: BloomFilter, key: Column): Column = {
    val bytes = { val bos = new ByteArrayOutputStream; bf.writeTo(bos); bos.toByteArray }
    column(BloomFilterMightContain(expression(lit(bytes)), expression(xxhash64(key))))
  }

  /** Distributed bloom build over `xxhash64(keyCol)` of `keys`. */
  def buildFilter(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): BloomFilter =
    keys.select(xxhash64(col(keyCol)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)

  /** Exact `big ANTI JOIN keys` with the bloom fast path: rows failing
    * the bloom skip the join entirely; only hits shuffle into the exact
    * anti join. `expectedItems` sizes the filter (≈ distinct keys);
    * `fpp` trades bitmap size against residual shuffle volume.
    */
  def antiJoin(big: DataFrame, keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // empty seen set: everything is new — and the guard is also load-
    // bearing, because `stat.bloomFilter` over zero rows returns a
    // filter whose serialization NPEs (found by the fuzz gate's
    // empty-corpus sweep). The isEmpty probe is a limit-1 scan.
    if (keys.isEmpty) return big
    val probe = mightContain(buildFilter(keys, keyCol, expectedItems, fpp),
      col(keyCol))
    val definitelyNew = big.filter(!probe)
    val suspects = big.filter(probe)
      .join(keys.select(keyCol), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(suspects)
  }
}
