package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ChangeApply
import Q.t

/** Round-8 incremental-pipeline queries: CDC log replay and the
  * versioned-table operations built on it. Complements [[SnapshotDiff]]
  * (producing deltas) with the consuming side (applying them).
  */
object DeltaQueries {

  // ---------------------------------------------------------------- q105
  // CDC log replay: the events table read as a change feed — per user,
  // the latest entry by (ts, event_id) wins; a final 'error' event
  // tombstones the user. ONE map-side-combinable struct-max aggregate:
  // a hot key's million updates cross the shuffle as one candidate per
  // map task, never through a row_number window's single-reducer sort.
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val log = t(s, dir, "events")
      .withColumn("op",
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
    ChangeApply.latestSnapshot(log, "user_id", Seq("ts", "event_id"),
        "op", Seq("event_type", "value", "props"))
      .orderBy("user_id")
  }

  private val q105Sql = ChangeApply.latestSnapshotSql(
    """SELECT user_id, ts, event_id,
      |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |  event_type, value, props
      |FROM events""".stripMargin,
    "user_id", Seq("ts", "event_id"), "op",
    Seq("event_type", "value", "props")) + "\nORDER BY user_id"

  // ---------------------------------------------------------------- q107
  // Join-key skew advisor: exact top-20 heaviest customer keys in
  // orders with ppm share, integer-cross-product skew verdict, and the
  // salt fan-out that would level each (the measurement step that
  // decides whether q31's salted join is worth its build-side explode).
  private def q107(s: SparkSession, dir: String): DataFrame =
    graft.ext.Profiler.skewAdvisor(t(s, dir, "orders"), col("o_custkey"),
      topK = 20, factor = 2L)

  private val q107Sql =
    graft.ext.Profiler.skewAdvisorSql("orders", "o_custkey",
      topK = 20, factor = 2L)

  // ---------------------------------------------------------------- q108
  // Stream-static enrichment ingest: events replayed as three "daily"
  // micro-batches (batch = event_id % 3), each broadcast-left-joined
  // with the customer dim and appended to the enriched table exactly
  // once (checkpointed AvailableNow lifecycle, as q70). The enriched
  // table must equal the plain batch join — the stream-static contract.
  // Bench note: the seconds are fixture + streaming lifecycle (3 batch
  // files, managed-table create, 3 checkpointed commits), not plan cost.
  private def q108(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-enrich-src")
    val ckpt = Files.createTempDirectory("graft-enrich-ckpt")
    val table = "graft.q108_enriched"
    try {
      val events = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      writeIdBatches(events, "event_id", tmp)
      val dim = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      graft.warehouse.Warehouse.ensureDatabase(s, "graft")
      graft.warehouse.Warehouse.dropManagedTable(s, table)
      events.limit(0)
        .join(dim, col("user_id") === col("c_custkey"), "left")
        .drop("c_custkey")
        .write.saveAsTable(table)
      val stream = s.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp.toString)
      // per-batch joins at this scale don't need 32 shuffle partitions
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Q.streamParts)
      try {
        val q = graft.streaming.Streams.enrichIngest(stream, dim, table,
          ckpt.toString, "user_id", "c_custkey")
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    } finally { Q.deleteRecursively(tmp); Q.deleteRecursively(ckpt) }
    s.table(table).orderBy("event_id")
  }

  private val q108Sql =
    """SELECT e.event_id, e.user_id, e.event_type, e.value,
      |  c.c_name, c.c_mktsegment
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q109
  // Versioned-lake time travel: three commits build the table (append
  // v0, append v1, REPLACE as v2 — the compaction/purge shape), then
  // version 1 is read back AFTER v2 was published: the historical
  // snapshot must be exactly the first two appends, untouched by the
  // replace. Bench note: the seconds include the three fixture commits.
  private def q109(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-versioned")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 3 === 0))
      val v1 = Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 3 === 1))
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 3 === 2), replace = true)
      assert(Versioned.latestVersion(s, tmp.toString).contains(2))
      Versioned.read(s, tmp.toString, Some(v1))
        .orderBy("o_orderkey")
        // materialize before the temp dir is deleted
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q109Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 3 <= 1
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q111
  // Streaming CDC apply: the q105 change feed replayed as three
  // micro-batches (batch = event_id % 3 — deliberately NOT per-key
  // ordered) continuously maintaining a compacted state table with
  // tombstones retained. Because the merge is a max-semilattice, the
  // final live view must equal q105's one-shot full-log compaction
  // exactly — same oracle. Bench note: seconds are fixture + streaming
  // lifecycle + 3 staged table rewrites, not plan cost.
  private def q111(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-cdc-src")
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt")
    val table = "graft.q111_state"
    try {
      val log = t(s, dir, "events")
        .withColumn("op",
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
        .select("user_id", "ts", "event_id", "op", "event_type", "value",
          "props")
      writeIdBatches(log, "event_id", tmp)
      graft.warehouse.Warehouse.ensureDatabase(s, "graft")
      graft.warehouse.Warehouse.dropManagedTable(s, table)
      log.limit(0).write.saveAsTable(table)
      val stream = s.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp.toString)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Q.streamParts)
      try {
        val q = graft.streaming.Streams.cdcIngest(stream, table,
          ckpt.toString, "user_id", Seq("ts", "event_id"), "op",
          Seq("event_type", "value", "props"))
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      // live view: tombstoned users stay dead
      s.table(table).filter(col("op") =!= "D")
        .select("user_id", "ts", "event_id", "event_type", "value", "props")
        .orderBy("user_id")
        .localCheckpoint(true)
    } finally { Q.deleteRecursively(tmp); Q.deleteRecursively(ckpt) }
  }

  // identical semantics to the one-shot q105 — that IS the property
  private val q111Sql = q105Sql

  // ---------------------------------------------------------------- q112
  // Right-to-be-forgotten purge on the versioned lake: commit orders,
  // purge every o_custkey divisible by 10, THEN expire history to one
  // version — the purged rows must be gone from the live table AND
  // physically gone from disk (a purge that leaves time travel serving
  // the data is a compliance bug; the operator couples the two).
  private def q112(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-purge")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 2 === 0))
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 2 === 1))
      val (v, deleted) = Versioned.purge(s, tmp.toString,
        col("o_custkey") % 10 === 0)
      // both pre-purge versions must be expired and their files gone
      require(v == 2 && deleted > 0, s"purge kept bytes: v=$v del=$deleted")
      require(Versioned.latestVersion(s, tmp.toString).contains(2))
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q112Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_custkey % 10 <> 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q113
  // Version-to-version CDC: SnapshotDiff over two committed versions of
  // the versioned lake — "what changed since the last pipeline run"
  // computed from immutable snapshots (no race with concurrent
  // commits), the input an incremental downstream (re-embed only
  // changed docs; q102's rollup refresh) consumes.
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-vdiff")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
      // v0: keys %4 in {0,1,2}; v1: keys %4 in {1,2,3}, %8==1 repriced
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 4 <= 2))
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 4 >= 1)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 8 === 1, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice"))),
        replace = true)
      graft.ops.SnapshotDiff.diff(
          Versioned.read(s, tmp.toString, Some(0)),
          Versioned.read(s, tmp.toString, Some(1)),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q113Sql =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 4 <= 2),
      |n AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 8 = 1 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 4 >= 1),
      |d AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
      |       WHEN n.o_orderkey IS NULL THEN 'removed'
      |       WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
      |         THEN 'changed'
      |       ELSE 'unchanged' END AS change
      |  FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
      |SELECT o_orderkey, change FROM d
      |WHERE change <> 'unchanged' ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q115
  // Incremental view maintenance: per-customer totals maintained across
  // a replace commit by re-aggregating ONLY the customers the version
  // diff names (removed rows' customers included via the OLD snapshot);
  // untouched customers carry their stored totals by reference. Must
  // hash-match the direct full re-aggregation of the new version —
  // correctness of the O(delta) refresh, the q102 rollup's missing
  // half (min/max are not invertible, so sound IVM = carry + re-agg).
  private def q115(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    import graft.ops.{IncrementalAgg, SnapshotDiff}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivm")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 4 <= 2))
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 4 >= 1)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 8 === 1, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice"))),
        replace = true)
      val v0 = Versioned.read(s, tmp.toString, Some(0))
      val v1 = Versioned.read(s, tmp.toString, Some(1))
      val cents = round(col("o_totalprice") * 100).cast("long")
      val totals0 = IncrementalAgg.totals(v0, col("o_custkey"), cents)
      val changed = SnapshotDiff.diff(v0, v1, Seq("o_orderkey"))
        .select("o_orderkey")
      val affected = v0.select("o_orderkey", "o_custkey")
        .unionByName(v1.select("o_orderkey", "o_custkey"))
        .join(changed, Seq("o_orderkey"), "left_semi")
        .select("o_custkey")
      IncrementalAgg.refreshByDiff(totals0, v1, affected,
          col("o_custkey"), cents)
        .orderBy("key")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  // ground truth: the refresh must equal a direct re-aggregation of v1
  private val q115Sql = {
    val n = """SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 8 = 1 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 4 >= 1""".stripMargin
    s"""WITH n AS ($n)
       |${graft.ops.IncrementalAgg.totalsSql("n", "o_custkey",
          "round(o_totalprice * 100)")}
       |ORDER BY key""".stripMargin
  }

  // ---------------------------------------------------------------- q114
  // Export capstone: quality gate → exact dedup → shard assignment →
  // greedy sequence packing composed end-to-end (the ship-to-training
  // layout: which doc, in which shard, in which training sequence) and
  // hash-checked against ONE CTE chain that replays every stage —
  // including the recursive-CTE packing replay. The composition
  // property, not just each stage, is what's verified (q63/q73's
  // curation/mixer analogue for the export side).
  private def q114(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.{Packing, Sampling, Text}
    val docs = t(s, dir, "documents")
    val passing = Text.qualityRules(docs).filter(col("passes"))
      .select("doc_id")
    val gated = docs.join(passing, Seq("doc_id"), "left_semi")
    val fp = gated.withColumn("fp", Text.fingerprint(col("text")))
    val keeper = fp.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val deduped = fp.join(keeper, Seq("fp", "doc_id"), "left_semi").drop("fp")
    val sharded = Sampling.shardAssign(deduped, col("doc_id"), numShards = 4)
      .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
    Packing.packGreedy(
        sharded.select(col("shard"), col("doc_id").as("id"), col("n_tokens")),
        "shard", "id", "n_tokens", budget = 300L)
      .toDF()
      .withColumnRenamed("id", "doc_id")
      .orderBy("shard", "bin", "doc_id")
  }

  private val q114Sql = {
    val grams3 = graft.ext.Dedup.wordShinglesSql("text", 3)
    val (_, shardE) = graft.ext.Sampling.shardAssignSql("doc_id", 4)
    val fpE = graft.ext.Text.fingerprintSql("text")
    val nTok = "CAST(len(string_split(text, ' ')) AS BIGINT)"
    val meanLen = s"""(CAST(length(text) AS DOUBLE) -
      |    (CAST($nTok AS DOUBLE) - 1.0)) / CAST($nTok AS DOUBLE)"""
      .stripMargin
    val uniq = s"CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)" +
      s" / CAST($nTok AS DOUBLE)"
    val dup3 = s"coalesce(1.0 - CAST(len(list_distinct($grams3)) AS DOUBLE)" +
      s" / NULLIF(CAST(len($grams3) AS DOUBLE), 0.0), 0.0)"
    val passes = s"($nTok >= 30 AND $nTok <= 10000) AND " +
      s"(($meanLen) >= 2.0 AND ($meanLen) <= 10.0) AND " +
      s"($uniq) >= 0.3 AND ($dup3) <= 0.2"
    val pack = graft.ext.Packing.packGreedySql(
      "SELECT shard, doc_id AS id, n_tokens FROM sharded", 300L)
    s"""WITH gated AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents WHERE $passes),
       |fpt AS MATERIALIZED (SELECT doc_id, text, $fpE AS fp FROM gated),
       |keep AS (SELECT fp, min(doc_id) AS doc_id FROM fpt GROUP BY fp),
       |dedup AS (SELECT f.doc_id, f.text FROM fpt f JOIN keep k
       |  ON f.fp = k.fp AND f.doc_id = k.doc_id),
       |sharded AS MATERIALIZED (SELECT doc_id,
       |  CAST($shardE AS BIGINT) AS shard,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |FROM dedup)
       |SELECT shard, id AS doc_id, n_tokens, bin, bin_fill
       |FROM ($pack)
       |ORDER BY shard, bin, doc_id""".stripMargin
  }

  /** Shared streaming fixture (same shape as q70's): split `df` into
    * three batch files (`idCol` % 3) with strictly ascending mod-times
    * so the file source replays them oldest-first in batch order.
    */
  private def writeIdBatches(df: DataFrame, idCol: String,
      tmp: java.nio.file.Path): Unit =
    Q.writeModBatches(df, idCol, tmp)

  // ---------------------------------------------------------------- q128
  // Stats-pruned versioned read: three range-clustered commits record
  // per-file doc_id min/max in the manifest; a selective BETWEEN read
  // plans ONLY the intersecting file (asserted in-query via
  // inputFiles), and the row results still hash-match the plain
  // filtered oracle — the file-skipping mechanism of a table format,
  // proven semantics-preserving.
  private def q128(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-vstats")
    try {
      val docs = t(s, dir, "documents").select("doc_id", "source", "n_chars")
      Versioned.commitWithStats(s, tmp.toString,
        docs.filter(col("doc_id") < 167).coalesce(1), "doc_id")
      Versioned.commitWithStats(s, tmp.toString,
        docs.filter(col("doc_id") >= 167 && col("doc_id") < 334)
          .coalesce(1), "doc_id")
      Versioned.commitWithStats(s, tmp.toString,
        docs.filter(col("doc_id") >= 334).coalesce(1), "doc_id")
      val pruned = Versioned.readPruned(s, tmp.toString, "doc_id",
        200L, 250L)
      // the audit that makes this a PRUNING test, not just a filter
      // test: at most the middle commit's single file may be planned
      // (0 when every commit pruned away — an all-empty corpus leaves
      // nothing intersecting, and the schema-only fallback scan
      // optimizes to a zero-file plan)
      require(pruned.inputFiles.length <= 1,
        s"expected <=1 planned file, got ${pruned.inputFiles.length}")
      pruned.orderBy("doc_id").localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q128Sql =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id BETWEEN 200 AND 250 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q133
  // Multi-writer optimistic concurrency (round-11 review item #1): two
  // RACING writer threads against one versioned table — writer A
  // appends the odd orderkeys while writer B publishes a validated
  // REPLACE derived from version 0 (the even orderkeys repriced ×2,
  // keys disjoint from A's). The CAS commit protocol serializes them in
  // whichever order the scheduler picks: if B wins the version race, A
  // retries its append on the new head; if A wins, B re-validates
  // no-key-overlap against the rows appended since its base and carries
  // them into its manifest. EITHER order replays to the same table
  // state — repriced evens + odds — which is exactly what the oracle
  // pins. The in-query requires assert both writers really committed
  // (three versions, no conflict exception swallowed).
  private def q133(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-ccommit")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 2 === 0))            // v0
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def writer(f: () => Unit) = new Thread(() =>
        try { barrier.await(); f() }
        catch { case t: Throwable => errs.add(t); () })
      val a = writer(() => {
        Versioned.commit(s, tmp.toString,
          orders.filter(col("o_orderkey") % 2 === 1)); () })
      val b = writer(() => {
        Versioned.commitReplace(s, tmp.toString,
          orders.filter(col("o_orderkey") % 2 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2),
          keyCols = Seq("o_orderkey"), baseVersion = Some(0)); () })
      a.start(); b.start(); a.join(); b.join()
      require(errs.isEmpty, s"racing writer failed: ${errs.peek()}")
      require(Versioned.latestVersion(s, tmp.toString).contains(2),
        "expected exactly three committed versions after the race")
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  // the serial oracle both interleavings must replay to
  private val q133Sql =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q134
  // Incremental change feed (Versioned.changesBetween): four commits —
  // base append, second append, a repricing/deleting replace, and a
  // compaction — read back as one row-level CDC feed. The append step
  // contributes plain `insert` rows planned from ONLY its new files
  // (manifest set-difference, zero joins); the replace step contributes
  // delete + update_preimage/postimage pairs from a keyed diff over the
  // files it swapped; the compaction rewrites every byte and must
  // contribute NOTHING — exactly what a downstream consumer (re-embed
  // changed docs, refresh a rollup) should observe. The oracle is the
  // slice arithmetic of what each commit did to the key space.
  private def q134(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-cfeed")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 4 <= 2))              // v0
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 4 === 3))             // v1 append
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 4 >= 1)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 8 === 1, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice"))),
        replace = true)                                         // v2 replace
      Versioned.compactCommit(s, tmp.toString)                  // v3 no-op
      Versioned.changesBetween(s, tmp.toString, 0, 3, Seq("o_orderkey"))
        .orderBy("_commit_version", "o_orderkey", "_change_type")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  // v1 appends %4==3 (inserts); v2 deletes %4==0, reprices %8==1
  // (pre+post pair); v3's compaction feeds nothing
  private val q134Sql =
    """SELECT o_orderkey, o_totalprice,
      |    'insert' AS _change_type, 1 AS _commit_version
      |  FROM orders WHERE o_orderkey % 4 = 3
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, 'delete', 2
      |  FROM orders WHERE o_orderkey % 4 = 0
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, 'update_preimage', 2
      |  FROM orders WHERE o_orderkey % 8 = 1
      |UNION ALL
      |SELECT o_orderkey, o_totalprice * 2, 'update_postimage', 2
      |  FROM orders WHERE o_orderkey % 8 = 1
      |ORDER BY _commit_version, o_orderkey, _change_type""".stripMargin

  // ---------------------------------------------------------------- q135
  // Manifest-recorded schema evolution: v0 commits two columns, v1
  // appends rows carrying a NEW column (o_orderstatus), v2 appends
  // rows with the OLD two-column shape again (stale writer code). The
  // head read renders all three versions under the evolved schema —
  // resolved from the manifest in O(1) at plan time (a mergeSchema
  // footer sweep over a 100 TB table reads every footer just to
  // plan) — with non-carrying files null-filling the evolved column.
  // Time travel integrity is asserted in-query: v0 still renders its
  // own two-column schema.
  private def q135(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-evolve")
    try {
      val orders = t(s, dir, "orders")
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 3 === 0)
          .select("o_orderkey", "o_totalprice"))                // v0
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 3 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderstatus")) // v1 + col
      Versioned.commit(s, tmp.toString,
        orders.filter(col("o_orderkey") % 3 === 2)
          .select("o_orderkey", "o_totalprice"))                // v2 old shape
      // each version keeps ITS OWN schema — the pre-evolution snapshot
      // must not grow the column retroactively
      require(Versioned.read(s, tmp.toString, Some(0)).columns.toSeq ==
        Seq("o_orderkey", "o_totalprice"),
        "v0 schema grew retroactively")
      require(Versioned.read(s, tmp.toString).columns.toSeq ==
        Seq("o_orderkey", "o_totalprice", "o_orderstatus"),
        "head schema did not evolve")
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q135Sql =
    """SELECT o_orderkey, o_totalprice,
      |  CASE WHEN o_orderkey % 3 = 1 THEN o_orderstatus END AS o_orderstatus
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q136
  // Exactly-once streaming ingest into the VERSIONED lake: the events
  // table replayed as three micro-batches through
  // Streams.versionedIngest — each batch lands as one (appId, batchId)-
  // stamped manifest commit (Versioned.idempotentCommit, the Delta
  // `txn` action on this substrate). The in-query requires force the
  // exactly-once claim: three batches -> exactly three versions, and a
  // crash-replay of the last batch (same batchId re-submitted, which is
  // precisely what a restarted foreachBatch does) must be recognized by
  // its stamp and SKIPPED, not double-appended. The final table must
  // equal the plain batch read — and every micro-batch boundary remains
  // a time-travelable version. Bench note: seconds are fixture +
  // streaming lifecycle (3 batch files, 3 checkpointed commits).
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-ving-src")
    val ckpt = Files.createTempDirectory("graft-ving-ckpt")
    val table = Files.createTempDirectory("graft-ving-table")
    try {
      val events = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      writeIdBatches(events, "event_id", tmp)
      val stream = s.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp.toString)
      val q = graft.streaming.Streams.versionedIngest(stream,
        table.toString, ckpt.toString, appId = "q136")
      try q.processAllAvailable() finally q.stop()
      require(Versioned.latestVersion(s, table.toString).contains(2),
        "expected exactly three stamped versions from three batches")
      val replay = Versioned.idempotentCommit(s, table.toString,
        events.filter(col("event_id") % 3 === 2), "q136", batchId = 2)
      require(replay.isEmpty, "replayed batch 2 double-committed")
      Versioned.read(s, table.toString)
        .orderBy("event_id")
        .localCheckpoint(true)
    } finally {
      Q.deleteRecursively(tmp); Q.deleteRecursively(ckpt)
      Q.deleteRecursively(table)
    }
  }

  private val q136Sql =
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q137
  // Row-level DELETE, copy-on-write (Versioned.deleteWhere): the
  // GDPR-erasure / contamination-removal primitive — DELETE FROM t
  // WHERE k BETWEEN lo AND hi against a range-clustered 4-file table
  // must rewrite ONLY the files whose recorded [min,max] stats can
  // hold a match; every other manifest line republishes VERBATIM (zero
  // data movement), which is what keeps the op O(matching files) at
  // 100 TB. The delete bounds are derived from the data (quartile
  // points of the key span) so the same arithmetic runs on every gate
  // corpus; rows whose predicate is NULL survive (SQL DELETE removes
  // WHERE-TRUE rows only — the oracle's IS NOT TRUE). In-query
  // requires pin the scale shape: stat pruning must rule out at least
  // one file, and the new manifest must carry base lines verbatim.
  private def q137(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-dml-del")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Versioned.commitWithStats(s, tmp.toString,
        orders.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        val pred = col("o_orderkey").between(lo, hi)
        def lines(v: Int): Seq[String] =
          // reconstructed state: a manifest FILE may be a delta record
          Versioned.manifestDataLines(s, tmp.toString, v)
        val before = lines(0)
        val pruned = Versioned.pruneCandidates(
          Versioned.resolvedPredicate(s,
            Versioned.read(s, tmp.toString).schema, pred), before)
        val v = Versioned.deleteWhere(s, tmp.toString, pred)
        if (before.size >= 4 && mx - mn >= 4) {
          // disjoint range clustering: the half-span predicate cannot
          // intersect every nonempty file's range, and empty files
          // carry the always-pruned sentinel
          require(pruned.size < before.size,
            s"stat pruning skipped nothing (${pruned.size}/${before.size})")
          if (v != 0) require(
            lines(v).toSet.intersect(before.toSet).nonEmpty,
            "no base manifest line carried verbatim — delete rewrote " +
              "files the predicate never touched")
        }
      }
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q137Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE (o_orderkey BETWEEN
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 4 FROM orders)
      |         AND
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 2 FROM orders))
      |      IS NOT TRUE
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q138
  // MERGE INTO (upsert), copy-on-write (Versioned.mergeInto): the even
  // orderkeys are the table (4 range-clustered files, key stats
  // recorded); the source reprices the %4==0 keys (updates) and brings
  // the odd keys (inserts). Only files holding a matched key are
  // rewritten — candidates are stat-pruned by the source's key range,
  // then refined by a key-pruned semi join — the rest of the manifest
  // carries verbatim, and the commit's conflict surface is the SOURCE
  // keys alone. The oracle replays the upsert as slice arithmetic over
  // the original table. Negative keys (fuzz corpus) fall in neither
  // slice (truncated % in both engines) and stay out symmetrically.
  private def q138(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-dml-merge")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Versioned.commitWithStats(s, tmp.toString,
        orders.filter(col("o_orderkey") % 2 === 0)
          .repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      val source = orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .unionByName(orders.filter(col("o_orderkey") % 2 === 1))
      val v = Versioned.mergeInto(s, tmp.toString, source,
        Seq("o_orderkey"))
      require(v == 1, s"merge published version $v, expected 1")
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q138Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice * 2
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |WHERE o_orderkey % 2 = 0 OR o_orderkey % 2 = 1
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q139
  // Row-level UPDATE, copy-on-write (Versioned.updateWhere): reprice
  // the middle-quartile orderkeys of a range-clustered 4-file table.
  // Same scale contract as q137's delete: stat pruning must rule out
  // the files whose recorded key range cannot intersect the predicate
  // BEFORE any scan, only the matched files rewrite (through the
  // assignment where the predicate is TRUE, pass-through otherwise —
  // SQL UPDATE semantics, so NULL-predicate rows keep their price),
  // and every untouched manifest line republishes verbatim. The
  // oracle replays the update as CASE arithmetic over the original
  // table; the ×2 reprice is exact in IEEE doubles on both engines.
  private def q139(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-dml-upd")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Versioned.commitWithStats(s, tmp.toString,
        orders.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        val pred = col("o_orderkey").between(lo, hi)
        def lines(v: Int): Seq[String] =
          // reconstructed state: a manifest FILE may be a delta record
          Versioned.manifestDataLines(s, tmp.toString, v)
        val before = lines(0)
        val pruned = Versioned.pruneCandidates(
          Versioned.resolvedPredicate(s,
            Versioned.read(s, tmp.toString).schema, pred), before)
        val v = Versioned.updateWhere(s, tmp.toString, pred,
          Map("o_totalprice" -> (col("o_totalprice") * 2)))
        if (before.size >= 4 && mx - mn >= 4) {
          require(pruned.size < before.size,
            s"stat pruning skipped nothing (${pruned.size}/${before.size})")
          if (v != 0) require(
            lines(v).toSet.intersect(before.toSet).nonEmpty,
            "no base manifest line carried verbatim — update rewrote " +
              "files the predicate never touched")
        }
      }
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q139Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey BETWEEN
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 4 FROM orders)
      |         AND
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 2 FROM orders)
      |    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q140
  // Row-level DELETE, merge-on-read (Versioned.deleteWhereMor): the
  // same middle-quartile delete as q137 plus a second, unprunable
  // modulo delete — but NOT ONE base data file rewrites. Each delete
  // commits only a parquet sidecar of matched (file, row_index)
  // positions and `#dv` manifest pointers; readers anti-join them.
  // The in-query requires force the whole contract: stat pruning
  // still rules files out pre-scan, the data-line set republishes
  // BYTE-IDENTICAL across both commits (the scale claim: a delete
  // moves O(matched rows), never O(matched files)), the sidecar
  // pointers exist, and the two deletes STACK (the second scans
  // visible rows — double-deleted positions dedup). The oracle
  // replays both predicates with SQL three-valued semantics
  // (NULL-keyed rows survive both).
  private def q140(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-dml-mor")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Versioned.commitWithStats(s, tmp.toString,
        orders.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        val pred = col("o_orderkey").between(lo, hi)
        def raw(v: Int): Seq[String] =
          Versioned.manifestSnapshot(s, tmp.toString, v)
        def dataLines(v: Int) =
          Versioned.manifestDataLines(s, tmp.toString, v)
        val before = dataLines(0)
        val pruned = Versioned.pruneCandidates(
          Versioned.resolvedPredicate(s,
            Versioned.read(s, tmp.toString).schema, pred), before)
        val v1 = Versioned.deleteWhereMor(s, tmp.toString, pred)
        val v2 = Versioned.deleteWhereMor(s, tmp.toString,
          col("o_orderkey") % 7 === 0)
        if (before.size >= 4 && mx - mn >= 4) {
          require(pruned.size < before.size,
            s"stat pruning skipped nothing (${pruned.size}/${before.size})")
          val last = math.max(v1, v2)
          if (last != 0) {
            require(dataLines(last) == before,
              "merge-on-read delete rewrote a base data file — the " +
                "commit must move O(matched rows), not O(matched files)")
            require(raw(last).exists(_.startsWith("#dv\t")),
              "no deletion-vector pointer published")
          }
        }
      }
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q140Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE ((o_orderkey BETWEEN
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 4 FROM orders)
      |         AND
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 2 FROM orders))
      |       IS NOT TRUE)
      |  AND ((o_orderkey % 7 = 0) IS NOT TRUE)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q141
  // Row-level UPDATE, merge-on-read (Versioned.updateWhereMor): the
  // %5 orderkeys reprice, but instead of rewriting their files
  // (q139's copy-on-write), the matched positions go into a deletion
  // vector and the repriced copies stage as ONE new file in the same
  // commit — O(matched rows) bytes moved. The in-query requires pin
  // it: every base data line survives into the new manifest, the
  // commit adds `#dv` pointers plus staged lines, and no row is lost
  // or duplicated (the oracle is a full-table CASE reprice).
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-dml-morupd")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Versioned.commitWithStats(s, tmp.toString,
        orders.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      def raw(v: Int): Seq[String] =
        Versioned.manifestSnapshot(s, tmp.toString, v)
      def dataLines(v: Int) =
        Versioned.manifestDataLines(s, tmp.toString, v)
      val before = dataLines(0)
      val v = Versioned.updateWhereMor(s, tmp.toString,
        col("o_orderkey") % 5 === 0,
        Map("o_totalprice" -> (col("o_totalprice") * 2)))
      if (v != 0) {
        require(before.toSet.subsetOf(dataLines(v).toSet),
          "merge-on-read update dropped a base data file — base files " +
            "must survive; only positions re-home")
        require(raw(v).exists(_.startsWith("#dv\t")),
          "no deletion-vector pointer published")
      }
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q141Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 5 = 0
      |    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q142
  // METADATA-ONLY retention delete (Versioned.deleteWhere fast path):
  // the production shape of `DELETE WHERE ts < cutoff` on a 100 TB
  // time-clustered table — when a file's recorded [min,max] stats
  // PROVE every row matches (and its recorded null count is zero: a
  // row can hide from the range as NULL, and SQL DELETE keeps
  // NULL-predicate rows), the manifest line drops with NO scan and NO
  // rewrite. The fixture appends four arithmetic quartile slices of
  // orders as four commits (each slice = its own files with key stats),
  // then deletes the first-quartile slice; the in-query requires force
  // the commit to be PURE METADATA: the new manifest must be a strict
  // subset of the old — zero staged files, zero bytes moved, however
  // large the dropped slice. NULL-keyed rows never enter the table
  // (slice filters are three-valued), which the oracle mirrors with
  // IS NOT NULL.
  private def q142(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-dml-retn")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (mm.isNullAt(0)) {
        // no non-NULL key anywhere: the table is born empty (the slice
        // filters admit nothing), mirroring the oracle's IS NOT NULL
        Versioned.commit(s, tmp.toString,
          orders.filter(col("o_orderkey").isNotNull))
      } else {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val q = (mx - mn) / 4
        val cuts = Seq(mn + q, mn + 2 * q, mn + 3 * q)
        val slices = Seq(
          col("o_orderkey") >= mn && col("o_orderkey") < cuts(0),
          col("o_orderkey") >= cuts(0) && col("o_orderkey") < cuts(1),
          col("o_orderkey") >= cuts(1) && col("o_orderkey") < cuts(2),
          col("o_orderkey") >= cuts(2))
        slices.foreach(p => Versioned.commitWithStats(s, tmp.toString,
          orders.filter(p), "o_orderkey"))                   // v0..v3
        def lines(v: Int): Seq[String] =
          // reconstructed state: a manifest FILE may be a delta record
          Versioned.manifestDataLines(s, tmp.toString, v)
        val before = lines(3)
        val v = Versioned.deleteWhere(s, tmp.toString,
          col("o_orderkey") < cuts(0))
        if (mx - mn >= 8) {
          // distinct quartiles: slice 0 holds at least the mn-keyed
          // row, entirely inside (< cuts(0)) — the delete must land,
          // and land as a manifest-subset commit
          require(v == 4, s"retention delete published version $v")
          val after = lines(4)
          require(after.toSet.subsetOf(before.toSet) &&
            after.size < before.size,
            "retention delete was not metadata-only: it staged " +
              s"rewrites (${before.size} -> ${after.size} lines)")
        }
      }
      Versioned.read(s, tmp.toString)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q142Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_orderkey IS NOT NULL
      |  AND o_orderkey >=
      |    (SELECT min(o_orderkey) +
      |       (max(o_orderkey) - min(o_orderkey)) // 4 FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q143
  // BLOOM-INDEXED point delete (Versioned.commitWithIndex + readEq +
  // deleteWhere): the GDPR delete-by-id shape min/max stats cannot
  // serve — the key is a STRING ("doc-<id>") and every file's ids
  // stripe the whole key space (hash slices), so range pruning keeps
  // everything. Per-file Bloom filters recorded at commit answer
  // `doc_key = 'doc-X'` with "definitely not in this file"; the
  // in-query requires force the scale contract: the point lookup must
  // PLAN fewer files than the table holds, and the delete must carry
  // every bloom-negative file's manifest line VERBATIM (only the
  // file(s) actually holding the key rewrite). The oracle replays the
  // delete arithmetically (remove all rows keyed by min(doc_id));
  // NULL-keyed rows never enter the table (pmod slice filters are
  // three-valued), mirrored by IS NOT NULL.
  private def q143(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom-del")
    try {
      val docs = t(s, dir, "documents")
        .select(concat(lit("doc-"), col("doc_id").cast("string"))
          .as("doc_key"), col("n_chars"), col("doc_id"))
      val mm = docs.agg(min("doc_id"), count(lit(1))).head()
      if (mm.isNullAt(0)) {
        Versioned.commit(s, tmp.toString,
          docs.filter(col("doc_id").isNotNull).drop("doc_id"))
      } else {
        val target = s"doc-${mm.getLong(0)}"
        // size the index FROM THE CORPUS: each of the 4 hash slices
        // holds ~n/4 keys, sized with 2x headroom (floor 1000). A
        // fixed expectedItems would saturate once per-file rows
        // outgrew it (fpp -> 1, every file false-positive) and turn
        // the pruning require below into a scale-dependent failure —
        // the exact sizing rule SCALING.md prescribes for the index.
        val perFile = math.max(1000L, mm.getLong(1) / 2)
        for (f <- 0 until 4)
          Versioned.commitWithIndex(s, tmp.toString,
            docs.filter(pmod(col("doc_id"), lit(4)) === f).drop("doc_id"),
            statCols = Nil, bloomCols = Seq("doc_key"),
            bloomExpectedItems = perFile, bloomFpp = 1e-6)    // v0..v3
        def lines(v: Int): Seq[String] =
          // reconstructed state: a manifest FILE may be a delta record
          Versioned.manifestDataLines(s, tmp.toString, v)
        val before = lines(3)
        val pred = col("doc_key") === target
        val planned = Versioned.plannedFilesEq(s, tmp.toString, pred)
        val v = Versioned.deleteWhere(s, tmp.toString, pred)
        if (before.size >= 4) {
          // 4+ nonempty hash slices: the target id lives in exactly one
          // (same id -> same slice), so its bloom must veto the rest
          require(planned.size < before.size,
            s"bloom pruning planned ${planned.size}/${before.size} " +
              "files for a single-key lookup")
          require(v == 4, s"point delete published version $v")
          require(lines(4).toSet.intersect(before.toSet).size >=
            before.size - planned.size,
            "a bloom-negative file did not carry verbatim through the " +
              "point delete")
        }
      }
      Versioned.read(s, tmp.toString)
        .orderBy("doc_key", "n_chars")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q143Sql =
    """SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS doc_key, n_chars
      |FROM documents
      |WHERE doc_id IS NOT NULL
      |  AND doc_id <> (SELECT min(doc_id) FROM documents)
      |ORDER BY doc_key, n_chars""".stripMargin

  // ---------------------------------------------------------------- q144
  // METADATA-ONLY COUNT(*) (Versioned.rowCountFromMetadata): per-file
  // row counts ride every stats scan as `~r` annotations, so the
  // count of any version answers from the manifest alone — zero data
  // files read at any table size; live deletion vectors add one read
  // of the delta-sized position sidecars. The fixture commits orders
  // with stats, MoR-deletes the %7 keys (so the answer must combine
  // recorded base counts MINUS DV positions — the subtle half), and
  // returns the metadata answer as a one-row frame the oracle
  // recomputes by scanning. In-query requires force the claim: the
  // metadata path must ANSWER (no fallback), and a control equality
  // against the scan count pins the DV arithmetic on every corpus.
  private def q144(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-meta-count")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Versioned.commitWithStats(s, tmp.toString,
        orders.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      Versioned.deleteWhereMor(s, tmp.toString,
        col("o_orderkey") % 7 === 0)
      val cnt = Versioned.rowCountFromMetadata(s, tmp.toString)
      require(cnt.isDefined,
        "metadata count fell back on a fully stats-tracked table")
      require(cnt.get == Versioned.read(s, tmp.toString).count(),
        s"metadata count ${cnt.get} diverges from the scan count")
      s.createDataFrame(Seq(Tuple1(cnt.get))).toDF("cnt")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q144Sql =
    """SELECT CAST(count(*) AS BIGINT) AS cnt FROM orders
      |WHERE (o_orderkey % 7 = 0) IS NOT TRUE""".stripMargin

  // ---------------------------------------------------------------- q145
  // The SQL surface of the lake (graft.sql.GraftCatalog +
  // GraftSqlRule): the q137 (DELETE), q139 (UPDATE) and q138
  // (MERGE INTO) flows driven through spark.sql ALONE against a V2
  // catalog session — the reference's own interaction model (its
  // warehouse layer is SQL strings, transf.py:215-273,
  // main.py:418-434). Each statement must route to the SAME Versioned
  // operator the Scala API calls (asserted via the manifests' #op
  // headers), keep the CoW scale contract (base manifest lines carry
  // verbatim through DELETE/UPDATE — checked when the corpus gives
  // distinct quartiles), and hash-match the same DuckDB arithmetic
  // the three original queries use, unioned under a flow tag.
  private def q145(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-sql-dml")
    val priorDefault = SparkSession.getDefaultSession
    val priorActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.catalog.graft",
        classOf[graft.sql.GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", tmp.toString)
      .getOrCreate()
    try {
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      // materialized once: the fixture reads this frame ~6 times
      // (two commits with range-partitioning sampling, the span agg,
      // the merge source twice) — at bench scale the repeated parquet
      // scans were most of the query's cost
      val orders = t(ext, dir, "orders")
        .select("o_orderkey", "o_totalprice").localCheckpoint(true)
      // ONE range-clustered table carries the q137 delete AND the q139
      // update (distinct quartile bands, chained DML — the second
      // statement runs against the first's commit, which is the real
      // lifecycle anyway); the q138 merge gets its even-keys table.
      // Two commits instead of three keeps the fixture cost at the
      // q143 class rather than the suite's most expensive query.
      Versioned.commitWithStats(ext, s"$tmp/db/dml",
        orders.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      Versioned.commitWithStats(ext, s"$tmp/db/mrg",
        orders.filter(col("o_orderkey") % 2 === 0)
          .repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      def lines(table: String): Seq[String] = {
        val v = Versioned.latestVersion(ext, s"$tmp/db/$table").get
        Versioned.manifestDataLines(ext, s"$tmp/db/$table", v)
      }
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val q1 = mn + (mx - mn) / 4
        val q2 = mn + (mx - mn) / 2
        val q3 = mn + 3 * ((mx - mn) / 4)
        val before = lines("dml")
        ext.sql("DELETE FROM graft.db.dml " +
          s"WHERE o_orderkey BETWEEN $q1 AND $q2")
        val afterDel = lines("dml")
        ext.sql("UPDATE graft.db.dml SET o_totalprice = " +
          s"o_totalprice * 2 WHERE o_orderkey BETWEEN ${q2 + 1} AND $q3")
        if (before.size >= 4 && mx - mn >= 8) {
          // the SQL route must keep the copy-on-write scale contract:
          // files the quartile predicates cannot touch carry verbatim
          require(afterDel.toSet.intersect(before.toSet).nonEmpty,
            "SQL DELETE rewrote files the predicate never touched")
          require(lines("dml").toSet.intersect(afterDel.toSet).nonEmpty,
            "SQL UPDATE rewrote files the predicate never touched")
        }
      }
      orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .unionByName(orders.filter(col("o_orderkey") % 2 === 1))
        .createOrReplaceTempView("q145_src")
      ext.sql("""MERGE INTO graft.db.mrg AS t USING q145_src AS s
                |ON t.o_orderkey = s.o_orderkey
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // every statement must have routed through the lake operators —
      // the commits' #op headers are the audit trail
      def ops(table: String): Set[String] =
        Versioned.history(ext, s"$tmp/db/$table").collect()
          .map(_.getAs[String]("operation")).toSet
      require(ops("mrg").contains("merge"),
        "SQL MERGE INTO did not publish through Versioned.mergeInto")
      if (!mm.isNullAt(0)) {
        require(Versioned.latestVersion(ext, s"$tmp/db/dml").get == 0 ||
          ops("dml").exists(Set("delete", "update")),
          "SQL DML did not publish through the Versioned operators")
      }
      ext.sql("""SELECT 'dml' AS flow, o_orderkey, o_totalprice
                |FROM graft.db.dml
                |UNION ALL
                |SELECT 'mrg' AS flow, o_orderkey, o_totalprice
                |FROM graft.db.mrg
                |ORDER BY flow, o_orderkey, o_totalprice""".stripMargin)
        .localCheckpoint(true)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      priorDefault.foreach(SparkSession.setDefaultSession)
      priorActive.foreach(SparkSession.setActiveSession)
      Q.deleteRecursively(tmp)
    }
  }

  private val q145Sql =
    """WITH span AS (
      |  SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders
      |), cuts AS (
      |  SELECT mn + (mx - mn) // 4 AS q1,
      |         mn + (mx - mn) // 2 AS q2,
      |         mn + 3 * ((mx - mn) // 4) AS q3
      |  FROM span
      |)
      |SELECT 'dml' AS flow, o_orderkey,
      |  CASE WHEN o_orderkey
      |         BETWEEN (SELECT q2 + 1 FROM cuts) AND (SELECT q3 FROM cuts)
      |    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |WHERE (o_orderkey BETWEEN (SELECT q1 FROM cuts)
      |         AND (SELECT q2 FROM cuts)) IS NOT TRUE
      |UNION ALL
      |SELECT 'mrg' AS flow, o_orderkey,
      |  CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice * 2
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |WHERE o_orderkey % 2 = 0 OR o_orderkey % 2 = 1
      |ORDER BY flow, o_orderkey, o_totalprice""".stripMargin

  // ---------------------------------------------------------------- q146
  // SQL maintenance surface of the lake (ProcedureCatalog + the
  // change-feed table-valued function): a full table LIFECYCLE —
  // CTAS (v0) → INSERT of shifted keys (v1) → quartile-band DELETE
  // (v2) → `CALL graft.system.restore('db.mnt', 1)` (v3) — driven
  // through spark.sql alone, then AUDITED from SQL: the result is the
  // row-level change feed over (0, head] via graft_table_changes,
  // aggregated per (commit, change type). The feed must show exactly
  // insert(appended) / delete(band) / insert(band again — the restore
  // resurrects what the delete removed), which the DuckDB oracle
  // replays as slice arithmetic. Scale pins in-query: the feed plan
  // stays DISTRIBUTED (no collected LocalRelation — appends plan as
  // file scans, cost O(delta) at any table size), and the maintenance
  // verbs route through the Versioned operators (history op audit).
  // Conditional corpora: an empty orders table stops at v0 (empty
  // feed); a band no key falls in stops at v1 (insert-only feed) —
  // the oracle's CTEs empty out identically.
  private def q146(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-sql-maint")
    val priorDefault = SparkSession.getDefaultSession
    val priorActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.catalog.graft",
        classOf[graft.sql.GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", tmp.toString)
      .getOrCreate()
    try {
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      t(ext, dir, "orders").select("o_orderkey", "o_totalprice")
        .localCheckpoint(true) // read once; the view is used 4 times
        .createOrReplaceTempView("q146_src")
      ext.sql("CREATE TABLE graft.db.mnt AS " +
        "SELECT o_orderkey, o_totalprice FROM q146_src")          // v0
      val tableDir = s"$tmp/db/mnt"
      val mm = ext.sql(
        "SELECT min(o_orderkey), max(o_orderkey) FROM q146_src").head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        // appended keys shift above the whole base span (injective,
        // collision-free even with negative keys)
        ext.sql("INSERT INTO graft.db.mnt " +
          s"SELECT o_orderkey + ${mx - mn + 1L} AS o_orderkey, " +
          "o_totalprice FROM q146_src WHERE o_orderkey % 3 = 0")  // v1
        val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        ext.sql("DELETE FROM graft.db.mnt " +
          s"WHERE o_orderkey BETWEEN $lo AND $hi")          // v2 (cond)
        if (Versioned.latestVersion(ext, tableDir).contains(2)) {
          val v = ext.sql("CALL graft.system.restore('db.mnt', 1)")
            .head().getInt(0)                                     // v3
          require(v == 3, s"restore published v$v, expected 3")
          val ops = Versioned.history(ext, tableDir).collect()
            .map(_.getAs[String]("operation")).toSet
          require(ops.contains("delete") && ops.contains("restore(v1)"),
            s"SQL maintenance did not route through the Versioned " +
              s"operators: $ops")
        }
      }
      val head = Versioned.latestVersion(ext, tableDir).get
      val feed = ext.sql("SELECT _commit_version, _change_type, " +
        "count(*) AS n, " +
        // Q.centsSum in SQL; CAST to DOUBLE because Spark parses the
        // 100.0 literal as DECIMAL (DuckDB's oracle side reads double)
        "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)" +
        "/100.0 AS amt " +
        s"FROM graft_table_changes('graft.db.mnt', 0, $head, " +
        "'o_orderkey') GROUP BY _commit_version, _change_type " +
        "ORDER BY _commit_version, _change_type")
      // the feed is a PLAN over the table's files, not collected rows
      val locals = feed.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
            if l.data.nonEmpty => l
      }
      require(locals.isEmpty,
        "change-feed TVF collapsed to a collected LocalRelation")
      feed.localCheckpoint(true)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      priorDefault.foreach(SparkSession.setDefaultSession)
      priorActive.foreach(SparkSession.setActiveSession)
      Q.deleteRecursively(tmp)
    }
  }

  private val q146Sql =
    """WITH span AS (
      |  SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders
      |), a AS (
      |  SELECT o_orderkey + (SELECT mx - mn + 1 FROM span) AS k,
      |         o_totalprice AS p
      |  FROM orders WHERE o_orderkey % 3 = 0
      |), d AS (
      |  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
      |  WHERE o_orderkey
      |    BETWEEN (SELECT mn + (mx - mn) // 4 FROM span)
      |        AND (SELECT mn + (mx - mn) // 2 FROM span)
      |), feed AS (
      |  SELECT 1 AS _commit_version, 'insert' AS _change_type, k, p
      |  FROM a
      |  UNION ALL
      |  SELECT 2, 'delete', k, p FROM d
      |  UNION ALL
      |  SELECT 3, 'insert', k, p FROM d
      |)
      |SELECT _commit_version, _change_type, count(*) AS n,
      |       sum(CAST(round(p*100) AS BIGINT))/100.0 AS amt
      |FROM feed
      |GROUP BY _commit_version, _change_type
      |ORDER BY _commit_version, _change_type""".stripMargin

  // ---------------------------------------------------------------- q147
  // General MERGE INTO (Versioned.mergeApply via the SQL surface):
  // the full clause algebra over corpus data — conditional matched
  // UPDATE (reprice only when the source price is higher), matched
  // DELETE (everything else the source claims), conditional NOT
  // MATCHED INSERT (a keyed slice of the source), and NOT MATCHED BY
  // SOURCE UPDATE/DELETE (zero out one target slice, delete another,
  // first-true-clause-wins). Target = even orderkeys; source =
  // %4-multiples repriced ×2 plus the odd keys at half price. The
  // DuckDB oracle replays every branch as slice arithmetic (exact
  // IEEE ops: ×2, ×0.5, literal 0), including the SQL subtleties the
  // clause engine must honor: a NULL-priced matched row fails the
  // conditional update and falls to the DELETE; negative keys use
  // sign-safe `% <> 0` oddness. In-query requires pin the routing
  // (the commit's #op header is the mergeApply publish) and that
  // history survives row-level rewrites.
  private def q147(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-sql-merge2")
    val priorDefault = SparkSession.getDefaultSession
    val priorActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.catalog.graft",
        classOf[graft.sql.GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", tmp.toString)
      .getOrCreate()
    try {
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      t(ext, dir, "orders").select("o_orderkey", "o_totalprice")
        .localCheckpoint(true) // read once; the view is used 3 times
        .createOrReplaceTempView("q147_src")
      ext.sql("CREATE TABLE graft.db.gm AS " +
        "SELECT o_orderkey, o_totalprice FROM q147_src " +
        "WHERE o_orderkey % 2 = 0")                               // v0
      // the source keys itself `k2`, NOT `o_orderkey` — `ON
      // t.o_orderkey = s.k2` exercises the differently-named-key
      // routing (the rule carries (target, source) pairs and the
      // command copies the source key onto the target name, so
      // clause expressions referencing s.k2 still resolve)
      ext.sql("""MERGE INTO graft.db.gm AS t USING (
                |  SELECT o_orderkey AS k2,
                |         o_totalprice * 2 AS o_totalprice
                |  FROM q147_src WHERE o_orderkey % 4 = 0
                |  UNION ALL
                |  SELECT o_orderkey AS k2, o_totalprice * 0.5D
                |  FROM q147_src WHERE o_orderkey % 2 <> 0
                |) AS s
                |ON t.o_orderkey = s.k2
                |WHEN MATCHED AND s.o_totalprice > t.o_totalprice
                |  THEN UPDATE SET o_totalprice = s.o_totalprice
                |WHEN MATCHED THEN DELETE
                |WHEN NOT MATCHED AND s.k2 % 3 = 0
                |  THEN INSERT (o_orderkey, o_totalprice)
                |       VALUES (s.k2, s.o_totalprice)
                |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 5 = 0
                |  THEN UPDATE SET o_totalprice = CAST(0 AS DOUBLE)
                |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 7 = 0
                |  THEN DELETE""".stripMargin)                    // v1
      val tableDir = s"$tmp/db/gm"
      val hist = Versioned.history(ext, tableDir).collect()
      require(hist.map(_.getAs[String]("operation"))
        .contains("merge") || hist.length == 1,
        "general MERGE did not publish through Versioned.mergeApply")
      ext.sql("""SELECT o_orderkey, o_totalprice FROM graft.db.gm
                |ORDER BY o_orderkey, o_totalprice""".stripMargin)
        .localCheckpoint(true)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      priorDefault.foreach(SparkSession.setDefaultSession)
      priorActive.foreach(SparkSession.setActiveSession)
      Q.deleteRecursively(tmp)
    }
  }

  private val q147Sql =
    """WITH t AS (
      |  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
      |  WHERE o_orderkey % 2 = 0
      |)
      |SELECT k AS o_orderkey, p2 AS o_totalprice FROM (
      |  -- matched (k%4=0): update iff 2p > p, else deleted
      |  SELECT k, p * 2 AS p2 FROM t WHERE k % 4 = 0 AND p * 2 > p
      |  UNION ALL
      |  -- not matched by source, first clause: zero out %5 keys
      |  SELECT k, CAST(0 AS DOUBLE) FROM t
      |  WHERE k % 4 <> 0 AND k % 5 = 0
      |  UNION ALL
      |  -- not matched by source, no clause: carry
      |  SELECT k, p FROM t
      |  WHERE k % 4 <> 0 AND k % 5 <> 0 AND k % 7 <> 0
      |  UNION ALL
      |  -- not matched: insert the %3 slice of the odd half-price keys
      |  SELECT o_orderkey, o_totalprice * 0.5 FROM orders
      |  WHERE o_orderkey % 2 <> 0 AND o_orderkey % 3 = 0
      |)
      |ORDER BY o_orderkey, o_totalprice""".stripMargin

  // ---------------------------------------------------------------- q148
  // Streaming SOURCE over the versioned lake (readStream.format(
  // "graft-changes")): offsets are committed version numbers, each
  // micro-batch plans changesBetween over exactly the versions it
  // covers — O(delta) manifest reads and O(changed data) scan per
  // batch, never O(table). The fixture commits two append versions
  // and a row-level delete, then streams the whole feed from
  // startingVersion 0 (v0's content as the snapshot batch, the delete
  // as feed rows); the oracle recomputes the feed from the raw orders
  // arithmetic. Restart-exactly-once and the "latest" anchor are
  // pinned in GraftChangesSourceSpec. Bench note: seconds are
  // streaming lifecycle + a three-commit fixture.
  private def q148(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-feed-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-feed-ckpt")
    val name = "q148_" + java.util.UUID.randomUUID().toString.take(8)
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val tbl = s"$tmp/table"
      Versioned.commit(s, tbl,
        orders.filter(col("o_orderkey") % 3 === 0))            // v0
      Versioned.commitWithStats(s, tbl,
        orders.filter(col("o_orderkey") % 3 === 1), "o_orderkey") // v1
      val vDel = Versioned.deleteWhere(s, tbl,
        col("o_orderkey") % 5 === 0)                           // v2 (or
      // no commit at all when no key matches — the oracle's delete
      // slice is empty in exactly that case)
      val q = graft.streaming.Streams.readChanges(s, tbl,
          Seq("o_orderkey"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      val got = s.table(name)
      // the source must have consumed THROUGH the head version —
      // offsets are version numbers, nothing buffered, nothing behind
      val head = Versioned.latestVersion(s, tbl).get
      require(head == (if (vDel > 1) 2 else 1),
        s"fixture expected head 1 or 2, got $head")
      if (vDel > 1)
        require(got.filter(col("_change_type") === "delete")
          .limit(1).count() == 1,
          "the delete commit must stream as delete feed rows")
      // _commit_timestamp (round 15): every feed row carries its
      // commit's recorded #ts instant — per-version constant,
      // non-null on modern manifests, strictly increasing with the
      // version (the manifest writes instants monotonic). The oracle
      // cannot see wall clocks, so the column is pinned here and
      // dropped from the compared output.
      require(got.columns.contains("_commit_timestamp"),
        "the feed must carry _commit_timestamp")
      val instants = got
        .select("_commit_version", "_commit_timestamp").distinct()
        .collect()
      require(instants.forall(!_.isNullAt(1)),
        "modern commits must stamp a non-null _commit_timestamp")
      require(instants.length == got.select("_commit_version")
        .distinct().count(),
        "_commit_timestamp must be constant per commit version")
      val byV = instants.map(r =>
        (r.getInt(0), r.getTimestamp(1).getTime)).sortBy(_._1)
      require(byV.zip(byV.drop(1)).forall { case ((_, a), (_, b)) =>
        a < b }, "_commit_timestamp must increase with the version")
      val out = got.drop("_commit_timestamp")
        .orderBy("_commit_version", "o_orderkey", "_change_type")
        .localCheckpoint(true)
      out
    } finally {
      s.catalog.dropTempView(name)
      Q.deleteRecursively(tmp); Q.deleteRecursively(ckpt)
    }
  }

  private val q148Sql =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders)
      |SELECT * FROM (
      |  SELECT o_orderkey, o_totalprice,
      |    'insert' AS _change_type, 0 AS _commit_version
      |  FROM o WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'insert', 1
      |  FROM o WHERE o_orderkey % 3 = 1
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'delete', 2
      |  FROM o WHERE o_orderkey % 3 <= 1 AND o_orderkey % 5 = 0
      |)
      |ORDER BY _commit_version, o_orderkey, _change_type""".stripMargin

  // ---------------------------------------------------------------- q149
  // RENAME COLUMN via column mapping: a metadata-only commit changes
  // the logical name while every data file keeps its birth name
  // (#colmap indirection — Delta's column-mapping shape, zero data
  // movement at any table size). The fixture renames the key, then
  // runs a pruned row-level DELETE UNDER THE NEW NAME — stats groups
  // were rewritten to the new logical name, so file skipping keeps
  // working — and reads the head. In-query requires pin what the
  // oracle cannot see: time travel renders v0 under the OLD name,
  // and untouched manifest lines carry verbatim through the
  // post-rename DML.
  private def q149(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-rename")
    try {
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val tbl = s"$tmp/table"
      Versioned.commitWithStats(s, tbl,
        orders.repartitionByRange(4, col("o_orderkey")),
        "o_orderkey")                                          // v0
      Versioned.renameColumn(s, tbl, "o_orderkey", "order_id") // v1
      require(Versioned.read(s, tbl, Some(0)).columns.toSeq ==
        Seq("o_orderkey", "o_totalprice"),
        "time travel must render v0 under its OWN (old) column name")
      require(Versioned.read(s, tbl, Some(1)).columns.toSeq ==
        Seq("order_id", "o_totalprice"),
        "the rename must be visible at its own version")
      val before = Versioned.manifestDataLines(s, tbl, 1)
      // a RANGE delete under the NEW name — the rewritten stats
      // groups must still prune (quartile-to-half span, the q137
      // arithmetic so every gate corpus computes the same bounds)
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        val v = Versioned.deleteWhere(s, tbl,
          col("order_id").between(lo, hi))                     // v2
        if (v > 1 && before.size >= 4 && mx - mn >= 4)
          require(Versioned.manifestDataLines(s, tbl, v).toSet
            .intersect(before.toSet).nonEmpty,
            "post-rename DML must still prune on the rewritten stats " +
              "and carry untouched lines verbatim")
      }
      Versioned.read(s, tbl)
        .orderBy("order_id")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q149Sql =
    """SELECT o_orderkey AS order_id, o_totalprice FROM orders
      |WHERE (o_orderkey BETWEEN
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 4 FROM orders)
      |         AND
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 2 FROM orders))
      |      IS NOT TRUE
      |ORDER BY order_id""".stripMargin

  // ---------------------------------------------------------------- q150
  // DROP COLUMN via the column mapping: a metadata-only commit — the
  // logical column leaves the schema, every data file keeps its bytes
  // (scans stop requesting the physical column; zero data movement at
  // any table size), and a #coldrop tombstone refuses a later column
  // whose physical name would inherit the orphaned bytes. In-query
  // requires pin what the oracle cannot see: time travel renders v0
  // WITH the column, the drop republishes the same data files
  // byte-verbatim (stats ride on an untouched column), post-drop DML
  // still prunes on the surviving stats, and re-adding the dropped
  // name is refused.
  private def q150(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-drop")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val tbl = s"$tmp/table"
      Versioned.commitWithStats(s, tbl,
        orders.repartitionByRange(4, col("o_orderkey")),
        "o_orderkey")                                          // v0
      val before = Versioned.manifestDataLines(s, tbl, 0)
      val v1 = Versioned.dropColumn(s, tbl, "o_custkey")       // v1
      require(v1 == 1, s"drop must publish as v1, got $v1")
      require(Versioned.read(s, tbl, Some(0)).columns.toSeq ==
        Seq("o_orderkey", "o_custkey", "o_totalprice"),
        "time travel must render v0 under its OWN (pre-drop) schema")
      require(Versioned.read(s, tbl).columns.toSeq ==
        Seq("o_orderkey", "o_totalprice"),
        "the drop must be visible at head")
      require(Versioned.manifestDataLines(s, tbl, 1) == before,
        "a drop whose stats ride other columns must republish every " +
          "line byte-verbatim — zero data movement")
      // the tombstone: re-adding the dropped name is refused
      val refused =
        try {
          Versioned.commit(s, tbl, Seq((1L, 2L, 3.0))
            .toDF("o_orderkey", "o_custkey", "o_totalprice"))
          false
        } catch {
          case _: Versioned.CommitConflictException => true
        }
      require(refused, "re-adding a dropped column's name must be " +
        "refused — old files still carry its bytes")
      // post-drop pruned DELETE on the surviving stats (the q137
      // quartile arithmetic, stable across every gate corpus)
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        val v = Versioned.deleteWhere(s, tbl,
          col("o_orderkey").between(lo, hi))                   // v2
        if (v > 1 && before.size >= 4 && mx - mn >= 4)
          require(Versioned.manifestDataLines(s, tbl, v).toSet
            .intersect(before.toSet).nonEmpty,
            "post-drop DML must still prune on the surviving stats " +
              "and carry untouched lines verbatim")
      }
      Versioned.read(s, tbl)
        .orderBy("o_orderkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q150Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE (o_orderkey BETWEEN
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 4 FROM orders)
      |         AND
      |         (SELECT min(o_orderkey) +
      |            (max(o_orderkey) - min(o_orderkey)) // 2 FROM orders))
      |      IS NOT TRUE
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q151
  // `id` COLUMN MAPPING (uuid physical names): the fixture creates a
  // mapped table (declared schema -> mapping commit -> data), proves
  // the data files carry NO logical names (uuid footers only), then
  // runs the exact sequence birth-name mapping must REFUSE — rename a
  // column away and RE-ADD the name with fresh data — and reads head.
  // In-query requires pin what the oracle cannot see: minted footers,
  // the re-added column reading only its own row, old rows null in
  // it, and time travel rendering the pre-rename schema. The output
  // is the original rows (the re-added column null) so the oracle is
  // pure orders arithmetic on every gate corpus.
  private def q151(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-idmap")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val tbl = s"$tmp/table"
      Versioned.commit(s, tbl, orders.limit(0))                // v0
      Versioned.setColumnMapping(s, tbl)                       // v1
      require(Versioned.columnMappingMode(s, tbl).contains("id"))
      Versioned.commitWithStats(s, tbl,
        orders.repartitionByRange(4, col("o_orderkey")),
        "o_orderkey")                                          // v2
      val files = Versioned.manifestDataLines(s, tbl, 2)
        .map(l => s"$tbl/${l.split('\t')(0)}")
      if (files.nonEmpty)
        require(s.read.option("mergeSchema", true).parquet(files: _*)
          .schema.fieldNames.forall(_.startsWith("col-")),
          "id-mode data files must carry minted physical names only")
      Versioned.renameColumn(s, tbl, "o_custkey", "customer")  // v3
      // the round-14 refusal, LIFTED: re-add the renamed-away name
      Versioned.commit(s, tbl, Seq((-1L, -1L, 0.0, 42L))
        .toDF("o_orderkey", "customer", "o_totalprice",
          "o_custkey"))                                        // v4
      val head = Versioned.read(s, tbl)
      require(head.columns.toSeq ==
        Seq("o_orderkey", "customer", "o_totalprice", "o_custkey"),
        s"head schema mismatch: ${head.columns.mkString(", ")}")
      require(head.filter(col("o_custkey") === 42L).count() == 1,
        "the re-added column must read exactly its own fresh row")
      require(Versioned.read(s, tbl, Some(2)).columns.toSeq ==
        Seq("o_orderkey", "o_custkey", "o_totalprice"),
        "time travel must render the pre-rename schema")
      // original rows only: the re-added column is null on all of
      // them BY CONSTRUCTION (old files never carry a new mint)
      head.filter(col("o_custkey").isNull)
        .drop("o_custkey")
        .orderBy("o_orderkey", "customer", "o_totalprice")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q151Sql =
    """SELECT o_orderkey, o_custkey AS customer, o_totalprice
      |FROM orders
      |ORDER BY o_orderkey, customer, o_totalprice""".stripMargin

  // ---------------------------------------------------------------- q152
  // First-class streaming SINK (writeStream.format("graft")) — q136's
  // twin through the PUBLIC Structured Streaming API instead of the
  // foreachBatch helper: the events table replayed as three
  // micro-batches lands as three (appId, batchId)-stamped manifest
  // commits, appId = the streaming query id the engine persists in
  // the checkpoint (GraftSink routes every batch through
  // Versioned.idempotentCommit — Delta's txn action). In-query
  // requires force the exactly-once claim: three batches -> exactly
  // three versions, every version stamped with the query id, and a
  // crash-replay of the last batch (same appId + batchId, what a
  // restarted query re-submits) stamp-skips instead of
  // double-appending. Bench note: seconds are fixture + streaming
  // lifecycle (3 batch files, 3 checkpointed commits).
  private def q152(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-sink-src")
    val ckpt = Files.createTempDirectory("graft-sink-ckpt")
    val table = Files.createTempDirectory("graft-sink-table")
    try {
      val events = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      writeIdBatches(events, "event_id", tmp)
      val q = s.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp.toString)
        .writeStream.format("graft")
        .option("path", table.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      require(Versioned.latestVersion(s, table.toString).contains(2),
        "expected exactly three stamped versions from three batches")
      val apps = Versioned.history(s, table.toString)
        .select("app_id").collect().map(_.getString(0)).distinct.toSeq
      require(apps == Seq(q.id.toString),
        s"every version must stamp the query id, got $apps")
      val replay = Versioned.idempotentCommit(s, table.toString,
        events.filter(col("event_id") % 3 === 2), q.id.toString,
        batchId = 2)
      require(replay.isEmpty, "replayed batch 2 double-committed")
      Versioned.read(s, table.toString)
        .orderBy("event_id")
        .localCheckpoint(true)
    } finally {
      Q.deleteRecursively(tmp); Q.deleteRecursively(ckpt)
      Q.deleteRecursively(table)
    }
  }

  private val q152Sql =
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q153
  // STRING min/max file stats (Delta's truncated string stats on the
  // manifest substrate): orders keyed by a zero-padded string key —
  // the ISO-dates-as-strings / ULID class a long range cannot index —
  // range-clustered into 4 files with `~s`/`~S` bounds recorded, then
  // a row-level DELETE over a STRING BETWEEN. In-query requires pin
  // the scale shape the oracle cannot see: the manifest carries
  // string bound tokens, an above-range point lookup plans ZERO
  // files, and (on well-spread corpora) the BETWEEN refutes at least
  // one file by bounds alone. The oracle replays the delete as the
  // same lpad/BETWEEN arithmetic. Negative keys (fuzz corpus) sort
  // lexicographically, not numerically — identically in both engines,
  // so the compare holds; the pruning require just goes quiet there.
  private def q153(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-str-stats")
    try {
      val keyed = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("k",
          lpad(col("o_orderkey").cast("string"), 12, "0"))
        .select("k", "o_orderkey", "o_totalprice")
      Versioned.commitWithStats(s, tmp.toString,
        keyed.repartitionByRange(4, col("k")), "k")
      val mm = keyed.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (!mm.isNullAt(0)) {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        def pad(v: Long): String = {
          val raw = v.toString
          ("0" * math.max(0, 12 - raw.length)) + raw
        }
        val (lo, hi) = (pad(mn + (mx - mn) / 4), pad(mn + (mx - mn) / 2))
        def lines(v: Int): Seq[String] =
          Versioned.manifestDataLines(s, tmp.toString, v)
        val before = lines(0)
        require(before.forall(l =>
          l.contains("\t~s=") || l.contains("\t~s~") ||
            l.contains("\t~s0")),
          s"string stat groups missing from the manifest: $before")
        // bounds alone must refute a key above every file's max
        require(Versioned.plannedFilesEq(s, tmp.toString,
          col("k") === "~~~").isEmpty,
          "an above-range string key must plan zero files")
        val pred = col("k").between(lo, hi)
        val pruned = Versioned.pruneCandidates(
          Versioned.resolvedPredicate(s,
            Versioned.read(s, tmp.toString).schema, pred), before)
        val v = Versioned.deleteWhere(s, tmp.toString, pred)
        if (mn >= 0 && mx - mn >= 4 && before.size >= 4) {
          // disjoint string clustering over non-negative keys: the
          // half-span BETWEEN cannot intersect every nonempty file
          require(pruned.size < before.size,
            s"string stats pruned nothing (${pruned.size}/${before.size})")
          if (v != 0) require(
            lines(v).toSet.intersect(before.toSet).nonEmpty,
            "no base manifest line carried verbatim — delete rewrote " +
              "files the string bounds never admitted")
        }
      }
      Versioned.read(s, tmp.toString)
        .orderBy("k", "o_orderkey", "o_totalprice")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(tmp)
  }

  private val q153Sql =
    """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx
      |           FROM orders)
      |SELECT lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS k,
      |       o_orderkey, o_totalprice
      |FROM orders, b
      |WHERE (lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
      |         BETWEEN lpad(CAST(mn + (mx - mn) // 4 AS VARCHAR), 12, '0')
      |             AND lpad(CAST(mn + (mx - mn) // 2 AS VARCHAR), 12, '0'))
      |      IS NOT TRUE
      |ORDER BY k, o_orderkey, o_totalprice""".stripMargin

  // ---------------------------------------------------------------- q154
  // Keyed streaming UPSERT — Update output mode on the graft sink
  // (q152's twin for the CDC-consuming-aggregation shape): a stateful
  // per-user event count streams in Update mode, so each trigger
  // emits ONLY the keys it changed and the sink routes every batch
  // through Versioned.idempotentMerge under the stream's (queryId,
  // batchId) stamp — each emitted row OVERWRITES its key's previous
  // state instead of appending beside it (Delta's streaming-upsert
  // foreachBatch recipe, as a first-class output mode). The fixture
  // kills the query between batches and restarts it on the same
  // checkpoint; in-query requires force the exactly-once claim (same
  // query id across the restart, one version per batch, a replayed
  // merge stamp-skips), and the final merged table hash-matches the
  // ONE-SHOT aggregate the oracle computes. NULL keys are filtered on
  // both sides (SQL MERGE: NULL keys match nothing — they would
  // insert per trigger, which is the documented non-upsert shape).
  // Bench note: seconds are fixture + two streaming lifecycles.
  private def q154(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft-upsert-src")
    val stage = Files.createTempDirectory("graft-upsert-stage")
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt")
    val table = Files.createTempDirectory("graft-upsert-table")
    try {
      val events = t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select("event_id", "user_id")
      writeIdBatches(events, "event_id", stage)
      // per-batch aggregation state at this scale doesn't need 32
      // shuffle partitions (= 32 state stores per trigger) — the q108
      // streaming pin, see Q.streamParts
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Q.streamParts)
      try {
      def run(): String = {
        val q = s.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src.toString)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"))
          .writeStream.format("graft")
          .outputMode("update")
          .option("keyCols", "user_id")
          .option("path", table.toString)
          .option("checkpointLocation", ckpt.toString)
          .start()
        try q.processAllAvailable() finally q.stop()
        q.id.toString
      }
      // phase 1: two micro-batches, then the query is killed
      Files.move(stage.resolve("b0.parquet"), src.resolve("b0.parquet"))
      Files.move(stage.resolve("b1.parquet"), src.resolve("b1.parquet"))
      val id1 = run()
      // data lands while the query is down; the restart keeps the
      // query id (the idempotence key lives in the checkpoint)
      Files.move(stage.resolve("b2.parquet"), src.resolve("b2.parquet"))
      val id2 = run()
      require(id1 == id2, "restart must keep the streaming query id")
      require(Versioned.latestVersion(s, table.toString).contains(2),
        "expected exactly one merged version per micro-batch")
      val apps = Versioned.history(s, table.toString)
        .select("app_id").collect().map(_.getString(0)).distinct.toSeq
      require(apps == Seq(id1),
        s"every version must stamp the query id, got $apps")
      // a crash-replay of the last batch stamp-skips the MERGE too
      require(Versioned.idempotentMerge(s, table.toString,
        s.range(1).select(lit(-1L).as("user_id"),
          lit(999L).as("n_events")),
        Seq("user_id"), id1, batchId = 2).isEmpty,
        "replayed Update batch merged twice")
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      Versioned.read(s, table.toString)
        .orderBy("user_id")
        .localCheckpoint(true)
    } finally {
      Q.deleteRecursively(src); Q.deleteRecursively(stage)
      Q.deleteRecursively(ckpt); Q.deleteRecursively(table)
    }
  }

  private val q154Sql =
    """SELECT user_id, count(*) AS n_events FROM events
      |WHERE user_id IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q155
  // WRITE-TIME CLUSTERING (graft.cluster.cols / CREATE TABLE …
  // CLUSTER BY — Delta's liquid-clustering declaration on this
  // substrate): a table declared clustered on o_orderkey receives a
  // deliberately SHUFFLED append, and the commit itself
  // range-partitions + sorts its files (compactCommit's clusterBy
  // recipe at append time), so per-file min/max stats are born
  // disjoint and a narrow key window plans O(matching files) from
  // the FIRST insert — no OPTIMIZE pass. This is the
  // partition-column replacement: same pruning a hive partition
  // filter gives, no small-file explosion, no partition-evolution
  // rewrites. In-query requires pin the scale shape the oracle
  // cannot see: on a multi-file append the narrow window plans
  // STRICTLY fewer files than the table holds. The oracle replays
  // the identity projection.
  private def q155(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val table = java.nio.file.Files
      .createTempDirectory("graft-cluster-table")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // CREATE-path rule: stats tracked from birth, clustering
      // declared before any data lands
      Versioned.commitWithStats(s, table.toString, orders.limit(0),
        Seq("o_orderkey"), replace = false)                      // v0
      Versioned.setPolicy(s, table.toString,
        clusterBy = Some(Seq("o_orderkey")))                     // v1
      // the shuffled append: round-robin order — unclustered, every
      // file would span the whole key space and pruning would keep
      // all of them
      Versioned.commit(s, table.toString, orders.repartition(8)) // v2
      val full = Versioned.read(s, table.toString)
      val nFiles = full.inputFiles.length
      val bounds = orders.agg(min("o_orderkey"), max("o_orderkey"))
        .head()
      if (!bounds.isNullAt(0) && nFiles > 1) {
        val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
        if (mx > mn + 8) { // a real key range to prune on
          val lo = mn + (mx - mn) / 4
          val hi = lo + math.max(1L, (mx - mn) / 20L)
          val narrow = Versioned.readPruned(s, table.toString,
            "o_orderkey", lo, hi)
          require(narrow.inputFiles.length < nFiles,
            s"clustered append must prune: narrow window planned " +
              s"${narrow.inputFiles.length} of $nFiles files")
        }
      }
      full.orderBy("o_orderkey", "o_custkey", "o_totalprice")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(table)
  }

  private val q155Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  // ---------------------------------------------------------------- q156
  // SUBSET COMPACTION (Versioned.compactSubset — the schedulable
  // OPTIMIZE of production formats): a clustered table accumulates
  // exactly the three debts a 100 TB table does — small files from
  // dribble appends, a deletion vector from a MoR delete, and
  // cross-commit key overlap write-time clustering cannot merge (each
  // commit range-sorts only its own rows) — then ONE bounded
  // maintenance commit selects those files (size floor ∪ DV fraction),
  // rewrites only them under the table's declared clustering, and
  // republishes everything else verbatim. In-query requires pin the
  // scale claims the oracle cannot see: the unselected bulk file's
  // manifest line carries byte-identically, the DV materializes (head
  // carries none), the change feed over the compact nets ZERO rows,
  // and the whole history stays time-travelable. The oracle replays
  // the surviving rows.
  private def q156(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val table = java.nio.file.Files
      .createTempDirectory("graft-subset-compact")
    try {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // v0: declared schema + clustering + stats from birth
      Versioned.commitWithStats(s, table.toString, orders.limit(0),
        Seq("o_orderkey"), replace = false)
      Versioned.setPolicy(s, table.toString,
        clusterBy = Some(Seq("o_orderkey")))
      // v2: the clustered bulk (one commit, range-sorted at write)
      Versioned.commit(s, table.toString, orders)
      // v3..v5: small dribble appends whose key ranges OVERLAP the
      // bulk — the small-file + cross-commit-overlap debt
      (0 until 3).foreach { i =>
        Versioned.commit(s, table.toString,
          orders.filter(pmod(col("o_orderkey"), lit(100)) === i)
            .withColumn("o_totalprice", col("o_totalprice") + 1000000)
            .coalesce(1))
      }
      // v6: MoR delete -> DV debt on whichever files hold the slice
      val preDel = Versioned.latestVersion(s, table.toString).get
      val vDel = Versioned.deleteWhereMor(s, table.toString,
        pmod(col("o_orderkey"), lit(100)) === 3)
      val hadDv = vDel > preDel
      // maintenance pass 1: materialize exactly the DV debt — the
      // dribble files hold no slice-3 rows, so they must carry
      if (hadDv) {
        val pre = Versioned.manifestDataLines(s, table.toString, vDel)
        val debt = Versioned.dvDebt(s, table.toString, Some(vDel))
          .filter(col("deleted") > 0).select("file")
          .collect().map(_.getString(0)).toSet
        val clean = pre.filterNot(l => debt.contains(l.takeWhile(_ != '\t')))
        val v1 = Versioned.compactSubset(s, table.toString,
          dvDebtAbove = Some(0.0001))
        require(v1 == vDel + 1,
          s"expected one DV-maintenance commit, got $v1 over $vDel")
        val after = Versioned.manifestDataLines(s, table.toString, v1)
        require(clean.forall(after.contains),
          "DV-free files must republish verbatim under a dv_debt " +
            "selection")
        require(Versioned.dvDebt(s, table.toString)
          .filter(col("deleted") > 0).isEmpty,
          "the DV must materialize with its file's rewrite")
        require(Versioned.changesBetween(s, table.toString, v1, v1, Nil)
          .isEmpty,
          "a compaction changes no row: the feed must net zero")
        require(Versioned.read(s, table.toString, Some(vDel)).count() ==
          Versioned.read(s, table.toString, Some(v1)).count(),
          "time travel across the compact must hold the row count")
      }
      // maintenance pass 2: bin-pack the dribble below the floor,
      // carrying every big file's line verbatim. Expected selection
      // derives from the ACTUAL file sizes, so the claim holds on
      // every gate corpus (empty/tiny included).
      val floor = 64L << 10
      val head1 = Versioned.latestVersion(s, table.toString).get
      val lines1 = Versioned.manifestDataLines(s, table.toString, head1)
      val sizes = Versioned.read(s, table.toString).inputFiles.toSeq
        .map(u => new java.io.File(new java.net.URI(u)))
        .map(f => f.getName -> f.length()).toMap
      def sizeOf(line: String): Long = {
        val rel = line.takeWhile(_ != '\t')
        sizes.getOrElse(rel.substring(rel.lastIndexOf('/') + 1), 0L)
      }
      val (smallL, bigL) = lines1.partition(sizeOf(_) < floor)
      val v2 = Versioned.compactSubset(s, table.toString,
        smallFileBytes = Some(floor), targetBytes = 1L << 30)
      if (smallL.size >= 2) {
        require(v2 == head1 + 1, s"bin-pack must commit: $v2/$head1")
        val after = Versioned.manifestDataLines(s, table.toString, v2)
        require(after.size < lines1.size,
          s"bin-pack must shrink the file count " +
            s"(${lines1.size} -> ${after.size})")
        require(bigL.forall(after.contains),
          "every above-floor file's manifest line must republish " +
            "verbatim under a small-file selection")
      }
      Versioned.read(s, table.toString)
        .orderBy("o_orderkey", "o_custkey", "o_totalprice")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(table)
  }

  private val q156Sql =
    """WITH bulk AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |), dribble AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice + 1000000 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 100 IN (0, 1, 2)
      |), unioned AS (
      |  SELECT * FROM bulk UNION ALL SELECT * FROM dribble
      |)
      |SELECT * FROM unioned WHERE o_orderkey % 100 <> 3
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  // ---------------------------------------------------------------- q157
  // CDC DELETES through the first-class sink (q154's twin for a feed
  // that carries deletes — Versioned.idempotentMergeCdc behind
  // .option("opColumn", …)): the events table replayed as a keyed CDC
  // log (seq = event_id, op = 'D' on error events — q105's
  // convention), streamed in Update mode through the graft sink,
  // killed between batches and restarted on the same checkpoint. The
  // sink applies cdcIngest's max-semilattice per trigger as ONE
  // key-pruned MERGE: within-batch rows pre-compact by seq, a
  // matched key updates only when the incoming (seq, op, payload)
  // struct wins, tombstones are RETAINED so a late update older than
  // an applied delete loses instead of resurrecting — which is what
  // lets the final table hash-match the ONE-SHOT log compaction the
  // oracle computes, even though the mod-3 batch split delivers seqs
  // out of order. In-query requires pin the exactly-once claims
  // (same query id across the restart, every version stamped, a
  // replayed batch stamp-skips). Bench note: seconds are fixture +
  // two streaming lifecycles.
  private def q157(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft-cdc-src")
    val stage = Files.createTempDirectory("graft-cdc-stage")
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt")
    val table = Files.createTempDirectory("graft-cdc-table")
    try {
      val feed = t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id").as("seq"),
          when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")).as("op"),
          col("event_type").as("v"), col("event_id"))
      writeIdBatches(feed, "event_id", stage)
      // the sink's per-batch CDC merge joins at this scale don't need
      // 32 shuffle partitions — the q108 streaming pin, Q.streamParts
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Q.streamParts)
      try {
      def run(): String = {
        val q = s.readStream
          .schema(feed.drop("event_id").schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src.toString)
          .writeStream.format("graft")
          .outputMode("update")
          .option("keyCols", "user_id")
          .option("opColumn", "op")
          .option("seqColumn", "seq")
          .option("path", table.toString)
          .option("checkpointLocation", ckpt.toString)
          .start()
        try q.processAllAvailable() finally q.stop()
        q.id.toString
      }
      // phase 1: two micro-batches, then the query is killed
      Files.move(stage.resolve("b0.parquet"), src.resolve("b0.parquet"))
      Files.move(stage.resolve("b1.parquet"), src.resolve("b1.parquet"))
      val id1 = run()
      // the third batch lands while the query is down — its seqs
      // interleave BELOW already-applied ones (event_id % 3 split),
      // exercising the late-arrival half of the semilattice
      Files.move(stage.resolve("b2.parquet"), src.resolve("b2.parquet"))
      val id2 = run()
      require(id1 == id2, "restart must keep the streaming query id")
      // every committed version is stamped with the query id; when
      // every batch carried rows there is exactly one per batch
      val hist = Versioned.history(s, table.toString)
      require(hist.select("app_id").collect()
        .forall(r => r.getString(0) == id1),
        "every CDC version must stamp the query id")
      // one pass answers "did every mod-3 batch carry rows" (was three
      // limit(1).count() probes — three scans of the feed)
      val batchesSeen = feed
        .select(countDistinct(pmod(col("event_id"), lit(3))).as("n"))
        .head().getLong(0)
      if (batchesSeen == 3)
        require(Versioned.latestVersion(s, table.toString).contains(2),
          "expected exactly one CDC-merge version per micro-batch")
      // a crash-replay at the recorded high-water stamp-skips
      Versioned.txnHighWater(s, table.toString, id1).foreach { hw =>
        require(Versioned.idempotentMergeCdc(s, table.toString,
          s.range(1).select(lit(-1L).as("user_id"), lit(0L).as("seq"),
            lit("U").as("op"), lit("x").as("v")),
          Seq("user_id"), "seq", "op", "D", id1, batchId = hw).isEmpty,
          "replayed CDC batch merged twice")
      }
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      Versioned.read(s, table.toString)
        .orderBy("user_id")
        .localCheckpoint(true)
    } finally {
      Q.deleteRecursively(src); Q.deleteRecursively(stage)
      Q.deleteRecursively(ckpt); Q.deleteRecursively(table)
    }
  }

  private val q157Sql =
    """SELECT user_id, seq, op, v FROM (
      |  SELECT user_id, event_id AS seq,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    event_type AS v
      |  FROM events WHERE user_id IS NOT NULL)
      |QUALIFY row_number()
      |  OVER (PARTITION BY user_id ORDER BY seq DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q158
  // NAMED TAGS (Versioned.tag — durable refs over the pin substrate):
  // the reproducible-training-snapshot idiom. A table is tagged
  // 'train-snap' at its first fill, then mutated (append + CoW
  // delete) and partially expired — and the tag still addresses the
  // EXACT original rows: it renders in history, resolves through
  // changesBetween refs, holds the retention floor against expire,
  // and survives a restore pointing at its original version. The
  // oracle replays the tagged snapshot's content; everything the
  // oracle cannot see (floor arithmetic, by-ref feed equality,
  // history rendering) is pinned by in-query requires.
  private def q158(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Versioned
    val table = java.nio.file.Files.createTempDirectory("graft-tags")
    try {
      val cust = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      Versioned.commit(s, table.toString, cust)                  // v0
      Versioned.tag(s, table.toString, "train-snap")             // -> 0
      // the table moves on: an append and a CoW delete
      Versioned.commit(s, table.toString,
        cust.withColumn("c_custkey", col("c_custkey") + 1000000)) // v1
      Versioned.deleteWhere(s, table.toString,
        pmod(col("c_custkey"), lit(10)) === 0)                   // v2?
      val head = Versioned.latestVersion(s, table.toString).get
      // history renders the tag at its version
      val tagged = Versioned.history(s, table.toString)
        .filter(col("version") === 0).select("tags")
        .head().getSeq[String](0)
      require(tagged == Seq("train-snap"),
        s"history must render the tag, got $tagged")
      // by-ref change feed == by-version change feed
      if (head > 0) {
        val byRef = Versioned.changesBetween(s, table.toString,
          "train-snap", head.toString, Seq("c_custkey")).count()
        val byVer = Versioned.changesBetween(s, table.toString,
          0, head, Seq("c_custkey")).count()
        require(byRef == byVer,
          s"by-ref feed must equal by-version ($byRef vs $byVer)")
      }
      // expire under keepLast=1 may drop nothing below the tag floor
      val (dropped, _) = Versioned.expire(s, table.toString,
        keepLast = 1)
      require(dropped == 0,
        s"the tag floor must hold version 0 against expire: $dropped")
      val v = Versioned.tagVersion(s, table.toString, "train-snap")
      require(v.contains(0), s"tag must keep naming version 0: $v")
      Versioned.read(s, table.toString, v)
        .orderBy("c_custkey")
        .localCheckpoint(true)
    } finally Q.deleteRecursively(table)
  }

  private val q158Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_cdc_replay" -> (q105 _),
    "q128_stats_pruned_read" -> (q128 _),
    "q107_skew_advisor" -> (q107 _),
    "q108_stream_enrich" -> (q108 _),
    "q109_time_travel" -> (q109 _),
    "q111_streaming_cdc" -> (q111 _),
    "q112_versioned_purge" -> (q112 _),
    "q113_version_diff" -> (q113 _),
    "q114_export_pipeline" -> (q114 _),
    "q115_ivm_refresh" -> (q115 _),
    "q133_concurrent_commits" -> (q133 _),
    "q134_change_feed" -> (q134 _),
    "q135_schema_evolution" -> (q135 _),
    "q136_versioned_stream_ingest" -> (q136 _),
    "q137_lake_delete_where" -> (q137 _),
    "q138_lake_merge_into" -> (q138 _),
    "q139_lake_update_where" -> (q139 _),
    "q140_lake_delete_mor" -> (q140 _),
    "q141_lake_update_mor" -> (q141 _),
    "q142_lake_retention_delete" -> (q142 _),
    "q143_lake_bloom_point_delete" -> (q143 _),
    "q144_lake_metadata_count" -> (q144 _),
    "q145_sql_lake_dml" -> (q145 _),
    "q146_sql_lake_maintenance" -> (q146 _),
    "q147_sql_general_merge" -> (q147 _),
    "q148_lake_stream_source" -> (q148 _),
    "q149_lake_rename_column" -> (q149 _),
    "q150_lake_drop_column" -> (q150 _),
    "q151_lake_id_mapping" -> (q151 _),
    "q152_lake_stream_sink" -> (q152 _),
    "q153_lake_string_stats" -> (q153 _),
    "q154_lake_stream_upsert" -> (q154 _),
    "q155_lake_cluster_by" -> (q155 _),
    "q156_lake_subset_compact" -> (q156 _),
    "q157_lake_cdc_sink" -> (q157 _),
    "q158_lake_tags" -> (q158 _))

  val oracles: Map[String, String] = Map(
    "q105_cdc_replay" -> q105Sql,
    "q107_skew_advisor" -> q107Sql,
    "q108_stream_enrich" -> q108Sql,
    "q109_time_travel" -> q109Sql,
    "q111_streaming_cdc" -> q111Sql,
    "q112_versioned_purge" -> q112Sql,
    "q113_version_diff" -> q113Sql,
    "q114_export_pipeline" -> q114Sql,
    "q115_ivm_refresh" -> q115Sql,
    "q128_stats_pruned_read" -> q128Sql,
    "q133_concurrent_commits" -> q133Sql,
    "q134_change_feed" -> q134Sql,
    "q135_schema_evolution" -> q135Sql,
    "q136_versioned_stream_ingest" -> q136Sql,
    "q137_lake_delete_where" -> q137Sql,
    "q138_lake_merge_into" -> q138Sql,
    "q139_lake_update_where" -> q139Sql,
    "q140_lake_delete_mor" -> q140Sql,
    "q141_lake_update_mor" -> q141Sql,
    "q142_lake_retention_delete" -> q142Sql,
    "q143_lake_bloom_point_delete" -> q143Sql,
    "q144_lake_metadata_count" -> q144Sql,
    "q145_sql_lake_dml" -> q145Sql,
    "q146_sql_lake_maintenance" -> q146Sql,
    "q147_sql_general_merge" -> q147Sql,
    "q148_lake_stream_source" -> q148Sql,
    "q149_lake_rename_column" -> q149Sql,
    "q150_lake_drop_column" -> q150Sql,
    "q151_lake_id_mapping" -> q151Sql,
    "q152_lake_stream_sink" -> q152Sql,
    "q153_lake_string_stats" -> q153Sql,
    "q154_lake_stream_upsert" -> q154Sql,
    "q155_lake_cluster_by" -> q155Sql,
    "q156_lake_subset_compact" -> q156Sql,
    "q157_lake_cdc_sink" -> q157Sql,
    "q158_lake_tags" -> q158Sql)
}
