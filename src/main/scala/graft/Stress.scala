package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-scaled stress probe (round-10 review item #1): the 100× design
  * claims in SCALING.md have only ever met sf0.1 data, so this main
  * synthesizes larger corpora LOCALLY (no driver dependency) by unioning
  * the sf0.1 tables with id-offset copies and measures how each query
  * family actually grows. Six sweeps: the five most expensive queries,
  * the time-keyed family (as-of/range/sessionize/rolling over scaled
  * `events`), the text/dedup mid-tier, the relational core (scaled
  * lineitem/orders, unscaled dims), the CDC/versioned-lake set, and
  * the retrieval/sketch/multimodal tier (fixed probes over a scaled
  * corpus; fixed-state sketch audits; payload-count-scaled decodes).
  *
  * Two synthesis modes, because "10× data" means two different things:
  *  - `replica`: exact copies, ids offset. Every doc gains s−1 perfect
  *    duplicates — the heavy-duplication corpus the round-9 review named
  *    as q129's pressure point. Here the OUTPUT itself grows ~s² for
  *    dup-cluster pairs, so superlinear cost is partly irreducible
  *    (output size lower-bounds cost); what the probe isolates is
  *    whether cost tracks the candidate count or outgrows it.
  *  - `disjoint`: ids offset AND content perturbed per copy (tokens
  *    suffixed `_i`; embeddings circularly shifted by i dims) so copies
  *    never pair across the corpus. Output stays ~linear; this measures
  *    the ENGINE's scaling alone.
  *
  * Only `documents` and `embeddings` are synthesized — the five target
  * queries (q129, q97, q91, q63, q126) read nothing else.
  *
  * Output: one JSON line per measurement on stdout:
  * `{"probe":"stress","mode":m,"scale":s,"query":q,"sec":t,"rows":n}`.
  * Growth exponents are fitted offline (log t ratios / log s ratios).
  *
  * Usage: `runMain graft.Stress [modes] [scales]` — defaults
  * `replica,disjoint` and `1,2,3,10`. `SPARK_GRAFT_STRESS_DIR` overrides
  * the synthesis root (default `/tmp/graft_stress`).
  */
object Stress {

  /** Id offset between copies — above any sf0.1 id (doc_id ≤ 4999,
    * vec_id ≤ 1999, event_id/user_id ≤ 99,999 at sf0.1). The source dir
    * is env-overridable, so [[guardOffset]] re-checks the bound against
    * the ACTUAL data at synthesis time: a silent overlap would turn
    * "replica" copies into exact duplicate ROWS and "disjoint" copies
    * into key collisions — corrupting the dedup/CDC/episode slopes with
    * no error raised.
    */
  private val IdOffset = 100000L

  /** Orderkey offset between copies (max l_orderkey/o_orderkey at sf0.1
    * is 149,999).
    */
  private val OrderOffset = 10000000L

  /** Fail loudly if offsetting `idCol` by `offset` per copy could make
    * copies collide (see [[IdOffset]]).
    */
  private def guardOffset(df: DataFrame, idCol: String, offset: Long,
      table: String): Unit = {
    val mx = df.agg(max(col(idCol)).cast("long")).head.getLong(0)
    require(mx < offset,
      s"Stress.synthesize: max($table.$idCol) = $mx >= copy offset " +
        s"$offset — id-offset copies would overlap; raise the offset " +
        "for this corpus")
  }

  def synthesize(spark: SparkSession, sfDir: String, outDir: String,
      scale: Int, mode: String): Unit = {
    val docs = queries.Q.t(spark, sfDir, "documents")
    guardOffset(docs, "doc_id", IdOffset, "documents")
    val copiesD = (0 until scale).map { i =>
      val base = docs.withColumn("doc_id", col("doc_id") + lit(i * IdOffset))
      val shifted =
        if (mode == "disjoint" && i > 0)
          // suffix every token: every shingle/fingerprint/vocab key is
          // copy-local, so no pair forms across copies
          base.withColumn("text",
            concat_ws(" ", transform(split(col("text"), " "),
              t => concat(t, lit(s"_$i")))))
        else base
      // keep the derived-length column honest after perturbation
      shifted.withColumn("n_chars", length(col("text")).cast("long"))
    }
    copiesD.reduce(_ unionByName _).repartition(spark.conf
        .get("spark.sql.shuffle.partitions").toInt)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = queries.Q.t(spark, sfDir, "embeddings")
    guardOffset(emb, "vec_id", IdOffset, "embeddings")
    val copiesE = (0 until scale).map { i =>
      val base = emb.withColumn("vec_id", col("vec_id") + lit(i * IdOffset))
      if (mode == "disjoint" && i > 0) {
        // circular dim shift: within a copy all pairwise cosines are
        // preserved (same rotation), across copies dims decorrelate —
        // copies are s independent corpora, the linear-growth baseline
        val k = i % 63 + 1
        base.withColumn("embedding",
          expr(s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
            s"slice(embedding, 1, $k))"))
      } else base
    }
    copiesE.reduce(_ unionByName _).repartition(spark.conf
        .get("spark.sql.shuffle.partitions").toInt)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events, for the time-keyed family (as-of / range / sessionize /
    // rolling): `replica` offsets only event_id — every (user, ts) point
    // gains s−1 coincident copies, the hot-key/duplication corpus for
    // time operators; `disjoint` offsets user_id too, so copies are s
    // independent populations (pure engine scaling — every time operator
    // here keys on user_id, so offset users never interact).
    val ev = queries.Q.t(spark, sfDir, "events")
    guardOffset(ev, "event_id", IdOffset, "events")
    guardOffset(ev, "user_id", IdOffset, "events")
    val copiesV = (0 until scale).map { i =>
      val base = ev.withColumn("event_id", col("event_id") + lit(i * IdOffset))
      if (mode == "disjoint" && i > 0)
        base.withColumn("user_id", col("user_id") + lit(i * IdOffset))
      else base
    }
    copiesV.reduce(_ unionByName _).repartition(spark.conf
        .get("spark.sql.shuffle.partitions").toInt)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    // relational core (fourth sweep): lineitem + orders scale with the
    // corpus; the orderkey offset applies in BOTH modes (the lineitem ⋈
    // orders equi-join must keep its 4-rows-per-order multiplicity —
    // duplicated orderkeys would square it, which is not what "more
    // data" means for a fact table). `replica` keeps o_custkey, so every
    // customer gains s× orders — hot-partition growth for per-customer
    // windows (q06); `disjoint` offsets custkey → independent
    // populations. Dimension tables are copied UNSCALED: dims grow
    // slower than facts in any real warehouse, and the broadcast side
    // staying small is exactly the plan property worth preserving.
    val li = queries.Q.t(spark, sfDir, "lineitem")
    guardOffset(li, "l_orderkey", OrderOffset, "lineitem")
    (0 until scale).map(i => li.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * OrderOffset)))
      .reduce(_ unionByName _)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    val ord = queries.Q.t(spark, sfDir, "orders")
    guardOffset(ord, "o_orderkey", OrderOffset, "orders")
    guardOffset(ord, "o_custkey", IdOffset, "orders")
    (0 until scale).map { i =>
      val base = ord.withColumn("o_orderkey",
        col("o_orderkey") + lit(i * OrderOffset))
      if (mode == "disjoint" && i > 0)
        base.withColumn("o_custkey", col("o_custkey") + lit(i * IdOffset))
      else base
    }.reduce(_ unionByName _)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      queries.Q.t(spark, sfDir, dim).write.mode("overwrite")
        .parquet(s"$outDir/$dim.parquet")
  }

  /** The probe targets, by registry name (runs the exact pinned query):
    * the five most expensive queries (round-10 review item #1) plus the
    * time-keyed family — the OTHER funnel class (per-key time order:
    * as-of, range join, sessionize, episodes, rolling agg), which had
    * plan-shape arguments but no measured growth slopes.
    * `SPARK_GRAFT_STRESS_ONLY` (comma-separated substrings) narrows the
    * set for single-query investigations.
    */
  private val targets = {
    val all = Seq("q129_similarity_join", "q97_semantic_dedup",
      "q91_knn_graph", "q63_training_pipeline", "q126_streaming_budget",
      "q40_asof_join", "q44_asof_sliced", "q41_range_join",
      "q85_sessionize", "q116_episode_assembly", "q127_rolling_window",
      // text/dedup mid-tier (third sweep): the MinHash family carries
      // the same verify-join shape q129's 30× cliff exposed — measured
      // here directly, not fixed by analogy alone
      "q24_minhash_lsh_neardup", "q49_dup_components",
      "q35_token_frequencies", "q50_sequence_packing",
      "q121_bpe_encode", "q66_token_budget_cap",
      // relational core (fourth sweep): pure-Catalyst plans over the
      // scaled fact tables — agg, per-key window, star join, salted
      // agg/join, pushdown scan
      "q01_agg_pricing", "q06_window_topk_per_group",
      "q16_star_join_revenue", "q30_salted_agg", "q31_salted_join",
      "q34_pushdown_scan",
      // merge family rider: insert-if-absent over the scaled fact
      // table — the anti-join-plus-union shape whose target-size cost
      // driver SCD1/SCD2 share (their fixtures read unscaled dims by
      // the synthesis design, so q04 is the family's scale probe)
      "q04_merge_insert_if_absent",
      // CDC / versioned lake (fifth sweep): change-apply, snapshot
      // diff, IVM refresh — their fixtures derive from the scaled
      // events/orders, so lake version sizes scale with the corpus.
      // Round 11 adds the concurrency protocol itself: q133's racing
      // CAS committers and q104's compaction-as-replace-commit run
      // against the scaled tables, so the staging + validation +
      // manifest costs are measured against data volume, not argued
      "q105_cdc_replay", "q113_version_diff", "q115_ivm_refresh",
      "q133_concurrent_commits", "q104_lake_compaction",
      // round-11 late additions: the change feed (append scan + keyed
      // replace diff + compaction netting to zero — all three step
      // shapes against scaled orders), manifest schema evolution
      // (three evolving commits + the O(1) schema-applied head read),
      // and the exactly-once streaming commit (3 stamped micro-batch
      // versions over scaled events + the replay-skip probe)
      "q134_change_feed", "q135_schema_evolution",
      "q136_versioned_stream_ingest",
      // row-level DML (this round): copy-on-write delete + update +
      // merge over the scaled orders — staging, candidate pruning,
      // rewrite, and conflict-probe costs must track the MATCHED-file
      // volume
      "q137_lake_delete_where", "q138_lake_merge_into",
      "q139_lake_update_where",
      // merge-on-read DML: deletion-vector commits over the scaled
      // orders — position-sidecar write + anti-join read costs must
      // track the MATCHED-row volume, never the file volume
      "q140_lake_delete_mor", "q141_lake_update_mor",
      // file-skipping index family: the metadata-only retention delete
      // (manifest-subset commit — cost must track the PARTIAL-file
      // scan, the dropped slice moves zero bytes however it scales)
      // and the bloom point delete (index build is one pass over the
      // scaled corpus; the point lookup itself must stay O(1) files)
      "q142_lake_retention_delete", "q143_lake_bloom_point_delete",
      // SQL surface (round 12): the same DML/maintenance operators
      // driven through the catalog + analysis rule — route overhead
      // must stay a constant (session + parse + rule), with the data
      // cost tracking the underlying operator's slope. q147 is the
      // general clause engine (conditional matched/NMBS rewrite +
      // anti-join inserts) over the scaled orders
      "q145_sql_lake_dml", "q146_sql_lake_maintenance",
      "q147_sql_general_merge",
      // metadata-only COUNT(*): manifest arithmetic + one DV-sidecar
      // read — the answer must stay flat however the data grows
      "q144_lake_metadata_count",
      // retrieval / sketches / multimodal (sixth sweep): fixed probes
      // (vec_id < 5/8) against the scaled corpus — measures the
      // "probes broadcast, corpus never shuffles" linear-scan claim,
      // the IVF index build (k-means) included; the three sketch
      // audits are fixed-state aggregates that should stay flat; the
      // decode family's payload count scales with `documents`
      "q26_cosine_topk_brute", "q27_cosine_topk_ann", "q38_ivf_topk",
      "q86_quantized_ann", "q88_twostage_ann",
      "q32_approx_distinct_hll", "q95_heavy_hitters", "q96_quantile_audit",
      "q33_multimodal_decode", "q52_audio_decode", "q53_video_decode",
      "q125_image_retrieval",
      // streaming family (seventh sweep): the config probe isolated a
      // per-micro-batch lifecycle floor; this measures the other axis —
      // fixed batch COUNT (the fixtures write exactly 3 batches / one
      // AvailableNow pass), scaled per-batch VOLUME — so state-store
      // growth (dedup keys, CDC keys, windowed sketch state) meets data
      "q37_streaming_window", "q98_streaming_trending",
      "q70_streaming_dedup_ingest", "q77_streaming_neardup_ingest",
      "q108_stream_enrich", "q111_streaming_cdc",
      // round-18 sweep: the Update-mode streaming upsert (per-trigger
      // keyed merge must track the CHANGED-KEY footprint), the
      // born-clustered append (commit-time range sort is O(batch)),
      // the delete-carrying CDC sink (same merge engine + tombstone
      // semilattice), and subset compaction (cost tracks the SELECTED
      // debt, never the table)
      "q154_lake_stream_upsert", "q155_lake_cluster_by",
      "q156_lake_subset_compact", "q157_lake_cdc_sink")
    sys.env.get("SPARK_GRAFT_STRESS_ONLY") match {
      case Some(f) => all.filter(n => f.split(",").exists(n.contains))
      case None => all
    }
  }

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val modes = args.lift(0).getOrElse("replica,disjoint").split(",").toSeq
    val scales = args.lift(1).getOrElse("1,2,3,10").split(",").map(_.toInt)
    val root = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR", "/tmp/graft_stress")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE: shuffle-partition override. The bench pins
      // partitions = cores for sf0.1; a scaled corpus must scale the
      // partition count with it or per-partition volume grows linearly
      // until it spills (measured: see the q129 verify-join finding in
      // README round-10) — exactly the sizing rule SCALING.md §config
      // prescribes for real deployments.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      // SPARK_GRAFT_INIT_PARTS: AQE's coalescePartitions.initialPartitionNum
      // — the AUTOMATIC form of the sizing rule above: shuffles start at
      // this width and AQE coalesces down to the data's actual volume, so
      // one setting serves every corpus size without retuning.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS",
          sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // per-run scratch warehouse: concurrent Verify/Bench/Stress JVMs
      // must not drop each other's managed-table fixtures
      .config("spark.sql.warehouse.dir", queries.Q.scratchWarehouse())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def emit(mode: String, scale: Int, query: String, sec: Double,
        rows: Long): Unit =
      println(f"""{"probe":"stress","mode":"$mode","scale":$scale,""" +
        f""""query":"$query","sec":$sec%.3f,"rows":$rows}""")
    // one unmeasured warmup pass before the FIRST measured point (JIT /
    // codegen compilation is JVM-global, so once is enough — and it must
    // run whichever scale comes first, or a descending scale list would
    // leave its largest point codegen-cold)
    var warmed = false
    for (mode <- modes; scale <- scales) {
      val dir = s"$root/${mode}_x$scale"
      val (tSynth, _) = time(synthesize(spark, sfDir, dir, scale, mode))
      System.err.println(f"[stress] synthesized $dir in $tSynth%.1f s")
      if (!warmed) {
        targets.foreach(q => SparkEntry.queries(q)(spark, dir).count())
        warmed = true
      }
      for (q <- targets) {
        val runs = (1 to reps).map(_ => time(
          SparkEntry.queries(q)(spark, dir).count()))
        emit(mode, scale, q, runs.map(_._1).min, runs.head._2)
      }
      // q129's named pressure point: the candidate-pair count (the
      // quantity the distinct() and verify join are sized by) — at
      // q129's OWN threshold (1/3, PrepQueries q129), not the library
      // default: prefix length is n − ⌈t·n⌉ + 1, so a different
      // threshold measures a different candidate set
      if (targets.exists(_.startsWith("q129"))) {
        val (tc, nc) = time(graft.ext.Dedup.similarityJoinCandidates(
          queries.Q.t(spark, dir, "documents"),
          thresholdNum = 1, thresholdDen = 3).count())
        emit(mode, scale, "q129_candidates", tc, nc)
      }
      // LSH plane scaling: q91/q97 pin planes=4 (16 buckets) — correct
      // at sf0.1, quadratic in bucket occupancy as the corpus grows.
      // The shipped sizing rule is Similarity.autoPlanes (occupancy-
      // constant); the probe drives exactly that rule at each scale.
      if (scale > 1 && targets.exists(n =>
          n.startsWith("q91") || n.startsWith("q97"))) {
        val emb = queries.Q.t(spark, dir, "embeddings")
        val planes = graft.ext.Similarity.autoPlanes(emb.count())
        val (t91, n91) = time(graft.ext.Similarity
          .knnGraph(emb, k = 5, planes = planes).count())
        emit(mode, scale, s"q91_planes$planes", t91, n91)
        val (t97, n97) = time(graft.ext.Similarity
          .semanticDedup(emb, threshold = 0.35, k = 5, planes = planes)
          .count())
        emit(mode, scale, s"q97_planes$planes", t97, n97)
      }
    }
    try {
      graft.warehouse.Warehouse.dropGraftDatabases(spark)
      graft.warehouse.Warehouse.sweepOrphanGraftDirs(spark)
    } catch { case e: Throwable =>
      System.err.println(s"[stress] warehouse cleanup failed: ${e.getMessage}")
    }
    // the synthesized corpora are multi-GB at the big scales and serve
    // no purpose after the run (every run re-synthesizes) — same
    // disk-accumulation rule as the warehouse janitor. KEEP=1 preserves
    // them for manual poking at a run's corpus.
    if (!sys.env.get("SPARK_GRAFT_STRESS_KEEP").contains("1"))
      for (mode <- modes; scale <- scales)
        queries.Q.deleteRecursively(
          java.nio.file.Paths.get(s"$root/${mode}_x$scale"))
    spark.stop()
  }
}
