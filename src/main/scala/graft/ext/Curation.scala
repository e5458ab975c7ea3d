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

  def curate(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minQuality: Double = 1.5,
      nearThreshold: Double = 0.5, k: Int = 16, bands: Int = 4): DataFrame = {
    val analyzed = df
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("fingerprint", Text.fingerprint(col(textCol)))
    val qualified = analyzed.filter(col("quality") >= minQuality)

    val keepers = qualified.groupBy("fingerprint")
      .agg(min(col(idCol)).as(idCol))
    // exactKept feeds three consumers (LSH candidates, the Jaccard verify
    // join, the final anti-join). Persist the boundary so the corpus is
    // scanned + quality-scored + fingerprinted once, not once per stage.
    // Blocks are released by Spark's ContextCleaner once the plan is
    // unreferenced; MEMORY_AND_DISK so an over-memory corpus spills
    // instead of silently recomputing the whole subtree.
    val exactKept = qualified
      .join(keepers, Seq("fingerprint", idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val drops = Dedup
      .nearDuplicates(exactKept, idCol, textCol, nearThreshold, k, bands)
      .select(col("id_b").as(idCol)).distinct()

    exactKept.join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("quality"))
  }
}
