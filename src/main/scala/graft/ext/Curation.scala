package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end corpus curation — the canonical training-data pipeline
  * composed from the §2.11 operators:
  *
  *   quality filter → exact dedup (normalized fingerprint, deterministic
  *   keeper) → near-dup removal (MinHash-LSH recall + Jaccard verify,
  *   greedy drop of the larger id per confirmed pair).
  *
  * Everything stays in one lazy plan per stage; the only data-volume
  * shuffles are the fingerprint group-by and the LSH sketch exchange —
  * text never shuffles for pairing (SCALING.md). Greedy pair-wise
  * dropping is deterministic; full transitive clustering (connected
  * components) is the documented heavier alternative when dup chains
  * matter.
  */
object Curation {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Runs the pipeline and returns the curated `(id, quality)` set,
    * MATERIALIZED (localCheckpoint): the corpus-sized persisted boundary
    * is released before returning, in a finally.
    *
    * Why eager: `Dataset.persist` registers the plan in the session's
    * CacheManager, which holds a STRONG reference — ContextCleaner never
    * frees it when the plan merely becomes unreferenced, so a lazy curate
    * would pin a full scored copy of every corpus it ever touched for the
    * application lifetime (round-3 advice). Materializing the narrow
    * two-column result while the boundary is hot, then unpersisting,
    * bounds the retained footprint to the output. The checkpointed blocks
    * ARE RDD-scoped, so those the ContextCleaner does free on GC.
    *
    * Scale note: localCheckpoint truncates lineage — an executor lost
    * after curate() returns cannot recompute its result blocks. The
    * output is O(kept ids) × 2 narrow columns; a production 100 TB run
    * lands it in a table immediately anyway (at which point the
    * checkpoint blocks are dead weight and GC reclaims them).
    *
    * `auditOversized = true` additionally logs what the LSH mega-bucket
    * cap dropped (count + total rows of buckets over
    * [[Dedup.DefaultMaxBucket]]) — the observable recall trade of the
    * quadratic-bucket guard, priced as one extra pass over the cached
    * boundary (opt-in for that reason).
    */
  def curate(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minQuality: Double = 1.5,
      nearThreshold: Double = 0.5, k: Int = 16, bands: Int = 4,
      auditOversized: Boolean = false): DataFrame = {
    val analyzed = df
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("fingerprint", Text.fingerprint(col(textCol)))
    val qualified = analyzed.filter(col("quality") >= minQuality)

    val keepers = qualified.groupBy("fingerprint")
      .agg(min(col(idCol)).as(idCol))
    // exactKept feeds three consumers (LSH candidates, the Jaccard verify
    // join, the final anti-join). Persist the boundary so the corpus is
    // scanned + quality-scored + fingerprinted once, not once per stage;
    // MEMORY_AND_DISK so an over-memory corpus spills instead of silently
    // recomputing the whole subtree.
    val exactKept = qualified
      .join(keepers, Seq("fingerprint", idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (auditOversized) {
        val over = Dedup.oversizedBuckets(exactKept, idCol, textCol, k, bands)
          .agg(count(lit(1)).as("n"), sum("bucket_size").as("rows"))
          .collect()(0)
        log.warn(s"curate: LSH cap (${Dedup.DefaultMaxBucket}) drops " +
          s"${over.getLong(0)} oversized buckets covering " +
          s"${if (over.isNullAt(1)) 0L else over.getLong(1)} bucket rows")
      }
      val drops = Dedup
        .nearDuplicates(exactKept, idCol, textCol, nearThreshold, k, bands)
        .select(col("id_b").as(idCol)).distinct()

      exactKept.join(drops, Seq(idCol), "left_anti")
        .select(col(idCol), col("quality"))
        .localCheckpoint(true)
    } finally { exactKept.unpersist(); () }
  }
}
