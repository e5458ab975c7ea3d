package graft.ext

import org.apache.spark.sql.DataFrame
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
  *
  * Lifecycle: [[Curation.curate]] is the one-shot path (scan, cure,
  * release — nothing stays pinned). [[Curation.open]] returns a
  * [[CurationSession]] for repeated curation of ONE corpus (e.g. sweeping
  * `nearThreshold`): the scored+exact-deduped boundary is scanned and
  * cached once, every `session.curate(...)` reuses it, and the caller
  * releases it explicitly — mirroring `IvfIndex.cached`/`invalidate`.
  */
object Curation {

  /** Runs the full pipeline once and returns the curated `(id, quality)`
    * set, MATERIALIZED (localCheckpoint): the corpus-sized persisted
    * boundary is released before returning, in a finally.
    *
    * Why the explicit release: `Dataset.persist` registers the plan in
    * the session's CacheManager, which holds a STRONG reference —
    * ContextCleaner never frees it when the plan merely becomes
    * unreferenced, so a leaked boundary would pin a full scored copy of
    * every corpus it ever touched for the application lifetime (round-3
    * advice). Materializing the narrow two-column result while the
    * boundary is hot, then unpersisting, bounds the retained footprint to
    * the output. The checkpointed blocks ARE RDD-scoped, so those the
    * ContextCleaner does free on GC.
    *
    * Scale note: localCheckpoint truncates lineage — an executor lost
    * after curate() returns cannot recompute its result blocks. The
    * output is O(kept ids) × 2 narrow columns; a production 100 TB run
    * lands it in a table immediately anyway (at which point the
    * checkpoint blocks are dead weight and GC reclaims them).
    */
  def curate(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minQuality: Double = 1.5,
      nearThreshold: Double = 0.5, k: Int = 16, bands: Int = 4,
      auditOversized: Boolean = false): DataFrame = {
    val session = open(df, idCol, textCol, minQuality)
    try session.curate(nearThreshold, k, bands, auditOversized)
    finally session.release()
  }

  /** Scores + exact-dedups the corpus ONCE into a cached boundary and
    * hands the caller its lifecycle. The scan happens here (eager
    * materialize), so every subsequent `session.curate(...)` — different
    * thresholds, bands, audit on/off — touches only the cached boundary.
    *
    * MEMORY_AND_DISK: an over-memory corpus spills instead of silently
    * recomputing the whole scored subtree on each reuse. The caller MUST
    * `release()` (or the blocks stay pinned by the CacheManager for the
    * application lifetime — see [[curate]]).
    */
  /** The full training-data preparation pipeline, stage-composed from
    * the round-6/7 corpus operators:
    *
    *   structural quality gate ([[Text.qualityRules]]) →
    *   exact dedup (normalized fingerprint, min-id keeper) →
    *   benchmark decontamination ([[Dedup.decontaminate]]) →
    *   per-source cap ([[Sampling.capPerKey]]) →
    *   temperature mixture over languages ([[Sampling.temperatureMix]]) →
    *   training-order shard assignment ([[Sampling.shardAssign]]).
    *
    * Output = surviving corpus rows + `pos`/`shard`. Fully deterministic
    * (every stage is hash-predicate or exact-arithmetic driven), so the
    * whole pipeline is oracle-checkable end to end (q63).
    *
    * The three hash-driven stages use DIFFERENT seeds
    * ([[Sampling.seededHash]]): cap keeps the HIGHEST hashes and the mix
    * keeps `h < rate·P` — on one shared hash the cap would feed the mix
    * only high-h rows and the realized mix rate would collapse.
    *
    * Scale shape — two rules, enforced structurally:
    *
    *  1. Corpus text shuffles zero times. The only exchanges are
    *     (fingerprint, id) pairs, (gram, id) pairs for decontamination,
    *     bounded per-source heaps, and per-language counts.
    *  2. Every text-heavy expression runs in EXACTLY ONE column-pruned
    *     scan. Stages hand each other tiny id-frames, eagerly
    *     materialized with `localCheckpoint` — naive stage chaining
    *     re-derives each semi-join's left side, so stage k's text work
    *     would re-run once per downstream consumer (measured 2.5× total
    *     runtime at sf0.1; the multiplier grows with pipeline depth).
    *
    * Eager: the id-frames compute on call (same contract as [[curate]]).
    * The checkpointed frames are id/lang/source-width — O(kept ids) —
    * and RDD-scoped, so the ContextCleaner frees them on GC; nothing
    * corpus-sized is ever pinned.
    */
  def prepareTrainingData(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang", sourceCol: String = "source",
      capPerSource: Int = 15, baseRate: Double = 0.5, numShards: Int = 4,
      decontamN: Int = 4): DataFrame = {
    val idc = col(idCol)
    // scan 1 (text): quality gate + fingerprint fused in one projection;
    // exact dedup's min-id keeper comes straight off it.
    val dedupIds = corpus
      .select(idc, Text.fingerprint(col(textCol)).as("__fp"))
      .where(Text.passesQuality(col(textCol)))
      .groupBy("__fp").agg(min(idc).as(idCol))
      .select(idc)
      .localCheckpoint(true)
    // scan 2 (text): shingle grams of the survivors vs benchmark grams —
    // id-level anti join, so the text scan runs once (decontaminate's
    // row-level form would re-derive its input for explode AND anti).
    val cleanIds = dedupIds
      .join(
        Dedup.contaminatedIds(
          corpus.select(idc, col(textCol))
            .join(dedupIds, Seq(idCol), "left_semi"),
          bench, idCol, textCol, decontamN),
        Seq(idCol), "left_anti")
      .localCheckpoint(true)
    // scan 3 (narrow: id, source, lang — no text): cap, then mix. The
    // capped frame feeds the mix's count/max/join consumers, so it is
    // checkpointed too.
    val capped = Sampling.capPerKey(
        corpus.select(idc, col(sourceCol), col(langCol))
          .join(cleanIds, Seq(idCol), "left_semi"),
        col(sourceCol), idCol, capPerSource, Sampling.seededHash(7))
      .select(idc, col(langCol))
      .localCheckpoint(true)
    val mixedIds = Sampling.temperatureMix(capped, idc, col(langCol),
      baseRate, Sampling.seededHash(13)).select(idc)
    // scan 4 (full width): one final semi join + per-row shard arithmetic.
    Sampling.shardAssign(
      corpus.join(mixedIds, Seq(idCol), "left_semi"),
      idc, numShards, Sampling.seededHash(19))
  }

  def open(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minQuality: Double = 1.5): CurationSession = {
    val qualified = df
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("fingerprint", Text.fingerprint(col(textCol)))
      .filter(col("quality") >= minQuality)
    // exact dedup: deterministic keeper = min id per normalized fingerprint
    val keepers = qualified.groupBy("fingerprint")
      .agg(min(col(idCol)).as(idCol))
    val exactKept = qualified
      .join(keepers, Seq("fingerprint", idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    exactKept.count() // materialize now — the corpus scan stays in open()
    new CurationSession(exactKept, idCol, textCol)
  }
}

/** A cached curation boundary over one corpus: quality-scored,
  * fingerprinted, exact-deduped, persisted. Obtain via [[Curation.open]];
  * call [[release]] when done (the cache is CacheManager-pinned until
  * then).
  */
final class CurationSession private[ext] (
    /** The cached boundary (`corpus columns + quality + fingerprint`,
      * exact-dups removed). Exposed for audits and tests; treat as
      * read-only.
      */
    val exactKept: DataFrame,
    idCol: String, textCol: String) {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Near-dup removal over the cached boundary → curated `(id, quality)`
    * set, materialized (localCheckpoint) so the result outlives
    * [[release]].
    *
    * `auditOversized = true` additionally logs what the LSH mega-bucket
    * cap dropped (count + total rows of buckets over
    * [[Dedup.DefaultMaxBucket]]) — the observable recall trade of the
    * quadratic-bucket guard, priced as one extra pass over the cached
    * boundary (opt-in for that reason).
    */
  def curate(nearThreshold: Double = 0.5, k: Int = 16, bands: Int = 4,
      auditOversized: Boolean = false): DataFrame = {
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
  }

  /** Unpersist the boundary. Results already returned by [[curate]] are
    * checkpoint-materialized and unaffected.
    */
  def release(): Unit = { exactKept.unpersist(); () }
}
