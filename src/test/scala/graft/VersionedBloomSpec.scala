package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.lake.Versioned

/** Per-file Bloom-filter index on the versioned lake
  * ([[Versioned.commitWithIndex]] / [[Versioned.readEq]]): equality
  * pruning for the key classes min/max ranges cannot index — point
  * lookups and GDPR deletes by a high-cardinality or STRING id. The
  * spec pins the aggregate's sketch guarantees (no false negatives,
  * exact merge), the manifest plumbing (pointers, sidecar lifecycle
  * through DML / compaction / restore / expire), and the pruning
  * soundness rules (absent filter = cannot prune; a bloom veto is
  * final). Filters in these tests use fpp = 1e-6, so a false positive
  * flipping a planned-file assertion is a ~1e-5 event — deterministic
  * in practice.
  */
class VersionedBloomSpec extends SparkSuite {
  import spark.implicits._

  private val FPP = 1e-6

  private def rawLines(dir: String, v: Int): Seq[String] =
    Versioned.manifestSnapshot(spark, dir, v)
  private def dataLines(dir: String, v: Int): Seq[String] =
    rawLines(dir, v).filterNot(_.startsWith("#"))
  private def bloomPtrs(dir: String, v: Int): Seq[String] =
    rawLines(dir, v).filter(_.startsWith("#bloom\t"))

  /** 40 docs in 4 files keyed by an interleaved STRING id — every
    * file's ids stripe the whole key space, so no range statistic can
    * tell the files apart; only the blooms can. Four single-file
    * append commits (hash repartitioning can collapse buckets); the
    * fixture's head version is 3. */
  private def stripedTable(dir: String): Int = {
    for (f <- 0L until 4L) {
      val df = (0L until 40L).filter(_ % 4 == f)
        .map(i => (s"doc-$i", i)).toDF("key", "n").coalesce(1)
      Versioned.commitWithIndex(spark, dir, df, statCols = Nil,
        bloomCols = Seq("key"), bloomExpectedItems = 1000L, bloomFpp = FPP)
    }
    assert(dataLines(dir, 3).size == 4, "fixture wants 4 data files")
    assert(bloomPtrs(dir, 3).size == 4, "fixture wants 4 bloom pointers")
    3
  }

  test("BloomSketch aggregate: per-group filters with NO false " +
      "negatives, exact cross-partition merge, NULLs skipped") {
    val df = (0L until 1000L).map(i => (i % 7, s"v$i"))
      .toDF("g", "s").repartition(8) // force map-side partials + merge
    val got = df.groupBy("g")
      .agg(graft.functions.BloomAgg.bloomSketch(col("s"), 200L, FPP)
        .as("bf"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(got.size == 7)
    for (g <- 0L until 7L) {
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(got(g)))
      // every member answers true (no false negatives, any merge order)
      (0L until 1000L).filter(_ % 7 == g).foreach(i =>
        assert(bf.mightContainString(s"v$i"), s"false negative v$i in $g"))
      // non-members essentially all answer false. NOTE the sketch's
      // practical floor: positions are (h1 + i*h2) mod bits over
      // 32-bit murmur halves, so two strings whose hash pair collides
      // MOD THE BIT COUNT false-positive regardless of the configured
      // fpp (measured: "v1284" against group 6's 143 members in 5760
      // bits — ~1e-4 per probe at this size, deterministic). A false
      // positive is a wasted scan, never a wrong answer.
      val fp = (1000L until 2000L).count(i => bf.mightContainString(s"v$i"))
      assert(fp <= 2, s"$fp false positives — far above the collision floor")
    }
    // long items hash as longs; nulls contribute nothing
    val withNulls = Seq(Some(1L), None, Some(2L)).toDF("x")
      .agg(graft.functions.BloomAgg.bloomSketch(col("x"), 100L, FPP))
      .head().getAs[Array[Byte]](0)
    val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(withNulls))
    assert(bf.mightContainLong(1L) && bf.mightContainLong(2L) &&
      !bf.mightContainLong(3L))
  }

  test("readEq plans O(1) files for a string point lookup where no " +
      "range statistic could prune anything") {
    val dir = tmpDir() + "/bloom-point"
    stripedTable(dir)
    val planned = Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-13")
    assert(planned.size == 1, s"expected 1 planned file, got $planned")
    assert(Versioned.readEq(spark, dir, col("key") === "doc-13")
      .as[(String, Long)].collect().toSeq == Seq(("doc-13", 13L)))
    // an absent key plans ZERO files and still returns a schema'd empty
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-999").isEmpty)
    val miss = Versioned.readEq(spark, dir, col("key") === "doc-999")
    assert(miss.columns.toSeq == Seq("key", "n") && miss.count() == 0)
    // IN-lists prune to the union of their members' files
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key").isin("doc-1", "doc-6")).size == 2) // files 1 and 2
    // a non-equality shape cannot use the bloom: conservative full plan
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key") > "doc-5").size == 4)
  }

  test("numeric blooms veto equality probes that slip through " +
      "overlapping min/max ranges") {
    val dir = tmpDir() + "/bloom-num"
    // both files span [0, 39] in range terms; parity separates them
    for (par <- 0L until 2L)
      Versioned.commitWithIndex(spark, dir,
        (0L until 40L).filter(_ % 2 == par).map(i => (i, s"row$i"))
          .toDF("id", "s").coalesce(1),
        statCols = Seq("id"), bloomCols = Seq("id"),
        bloomExpectedItems = 1000L, bloomFpp = FPP)
    assert(dataLines(dir, 1).size == 2)
    // ranges alone keep both files; the bloom rules out the wrong parity
    assert(Versioned.plannedFilesEq(spark, dir, col("id") === 7L).size == 1)
    assert(Versioned.plannedFilesEq(spark, dir, col("id") === 100L).isEmpty,
      "range should already prune out-of-range; bloom must not undo it")
    assert(Versioned.readEq(spark, dir, col("id") === 7L)
      .as[(Long, String)].collect().toSeq == Seq((7L, "row7")))
  }

  test("GDPR delete-by-id: deleteWhere consults the bloom index, " +
      "rewrites only the one file holding the key, re-measures its " +
      "filter, and every other pointer survives") {
    val dir = tmpDir() + "/bloom-gdpr"
    val head = stripedTable(dir)
    val before = dataLines(dir, head)
    val v = Versioned.deleteWhere(spark, dir, col("key") === "doc-13")
    assert(v == head + 1)
    val after = dataLines(dir, v)
    assert(before.toSet.intersect(after.toSet).size == 3,
      "only the bloom-positive file may rewrite")
    assert(Versioned.read(spark, dir).count() == 39)
    // the rewrite carries a fresh filter: the old key is gone from the
    // index, its file-mates are still found in one planned file
    assert(bloomPtrs(dir, v).size == 4)
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-13").isEmpty)
    val planned = Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-17") // same original file (17 % 4 == 1)
    assert(planned.size == 1)
    assert(Versioned.readEq(spark, dir, col("key") === "doc-17")
      .as[(String, Long)].collect().toSeq == Seq(("doc-17", 17L)))
  }

  test("appends carry the head's pointers and index their own files " +
      "under the TABLE's config; a replace drops stale pointers but " +
      "keeps the policy") {
    val dir = tmpDir() + "/bloom-append"
    val head = stripedTable(dir)
    Versioned.commitWithIndex(spark, dir,
      Seq(("doc-100", 100L)).toDF("key", "n"), statCols = Nil,
      bloomCols = Seq("key"), bloomExpectedItems = 1000L, bloomFpp = FPP)
    assert(bloomPtrs(dir, head + 1).size == 5, "4 carried + 1 new pointer")
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-100").size == 1)
    // index config is TABLE policy: a plain append's files get indexed
    // under the carried config too — one un-indexed writer must not
    // degrade point-lookup pruning toward O(table)
    Versioned.commit(spark, dir, Seq(("doc-200", 200L)).toDF("key", "n"))
    assert(bloomPtrs(dir, head + 2).size == 6,
      "5 carried + 1 built under the table's carried bloom config")
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-999").isEmpty,
      "every file is indexed — an absent key must prune everywhere")
    assert(Versioned.readEq(spark, dir,
      col("key") === "doc-200").count() == 1)
    // replace: full-table authority — stale pointers drop with their
    // files, but the CONFIG carries (policy outlives the data it
    // happened to describe), so the replace's own file is indexed
    Versioned.commit(spark, dir, Seq(("fresh", 0L)).toDF("key", "n"),
      replace = true)
    assert(bloomPtrs(dir, head + 3).size == 1,
      "old pointers dropped; the staged file indexed under the policy")
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-100").isEmpty, "replaced keys prune to nothing")
    assert(Versioned.readEq(spark, dir, col("key") === "fresh").count() == 1)
  }

  test("the index's declared sizing is table policy: recorded in the " +
      "manifest and honored by rewrites — never a default that could " +
      "silently saturate") {
    val dir = tmpDir() + "/bloom-cfg"
    val head = stripedTable(dir) // declared at (1000, 1e-6)
    def cfgLines(v: Int) = rawLines(dir, v).filter(_.startsWith("#bloomcfg\t"))
    assert(cfgLines(head) == Seq(s"#bloomcfg\tkey\t1000\t$FPP"))
    // a rewrite re-measures at the RECORDED sizing: the rebuilt file's
    // filter must have the declared shape, not the 100k default
    val v = Versioned.deleteWhere(spark, dir, col("key") === "doc-13")
    assert(cfgLines(v) == cfgLines(head), "rewrite lost the index config")
    val declaredBits = BloomFilter.create(1000L, FPP).bitSize()
    val rebuiltRel = dataLines(dir, v).filterNot(dataLines(dir, head).contains)
    assert(rebuiltRel.size == 1)
    val ptr = bloomPtrs(dir, v).map(_.split('\t'))
      .find(_(1) == rebuiltRel.head.split('\t')(0)).get
    val bits = spark.read.parquet(s"$dir/${ptr(3)}")
      .filter(col("file") === ptr(1)).select("bits")
      .head().getAs[Array[Byte]](0)
    val rebuilt = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))
    assert(rebuilt.bitSize() == declaredBits,
      s"rebuilt filter has ${rebuilt.bitSize()} bits, declared " +
        s"$declaredBits — the rewrite ignored the recorded sizing")
    // the config survives metadata commits and restores too
    Versioned.addCheck(spark, dir, "n_ok", "n >= 0")
    assert(cfgLines(v + 1) == cfgLines(head))
    Versioned.restore(spark, dir, head)
    assert(cfgLines(v + 2) == cfgLines(head))
  }

  test("two racing indexed appends both land and both keys stay " +
      "findable — pointer carry holds through CAS retries") {
    val dir = tmpDir() + "/bloom-race"
    stripedTable(dir)
    val t1 = new Thread(() =>
      Versioned.commitWithIndex(spark, dir,
        Seq(("doc-500", 500L)).toDF("key", "n"), statCols = Nil,
        bloomCols = Seq("key"), bloomExpectedItems = 1000L,
        bloomFpp = FPP))
    val t2 = new Thread(() =>
      Versioned.commitWithIndex(spark, dir,
        Seq(("doc-600", 600L)).toDF("key", "n"), statCols = Nil,
        bloomCols = Seq("key"), bloomExpectedItems = 1000L,
        bloomFpp = FPP))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(Versioned.latestVersion(spark, dir).contains(5))
    assert(bloomPtrs(dir, 5).size == 6, "a CAS retry dropped a pointer")
    for (k <- Seq("doc-500", "doc-600", "doc-13"))
      assert(Versioned.plannedFilesEq(spark, dir,
        col("key") === k).size == 1, s"lookup of $k lost its pruning")
    assert(Versioned.read(spark, dir).count() == 42)
  }

  test("compaction re-measures the index; expire collects a dropped " +
      "version's sidecars and keeps live ones; restore republishes " +
      "pointers") {
    val dir = tmpDir() + "/bloom-lifecycle"
    val head = stripedTable(dir)
    val v1 = Versioned.compactCommit(spark, dir)
    assert(v1 == head + 1)
    assert(bloomPtrs(dir, v1).nonEmpty,
      "compaction silently dropped the bloom index")
    assert(Versioned.readEq(spark, dir, col("key") === "doc-13")
      .as[(String, Long)].collect().toSeq == Seq(("doc-13", 13L)))
    // restore back to the 4-file layout: pointers ride along
    val v2 = Versioned.restore(spark, dir, head)
    assert(v2 == head + 2 && bloomPtrs(dir, v2).size == 4)
    assert(Versioned.plannedFilesEq(spark, dir,
      col("key") === "doc-13").size == 1)
    // expire everything but the head: the dropped manifests'
    // now-unreferenced sidecars go with them; the head (= the striped
    // layout's files and sidecars, via restore) keeps working
    val (dropped, deleted) = Versioned.expire(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
    assert(dropped == head + 2 && deleted > 0)
    assert(Versioned.readEq(spark, dir, col("key") === "doc-13")
      .as[(String, Long)].collect().toSeq == Seq(("doc-13", 13L)))
    assert(Versioned.read(spark, dir).count() == 40)
  }

  test("bloom probing is executor-side: a point lookup over many " +
      "megabyte-class filters ships only boolean verdicts to the " +
      "driver, never filter bytes") {
    val dir = tmpDir() + "/bloom-exec"
    // 4 single-file commits, each filter sized AND FILLED at 500k
    // items (~600 KB serialized, ~half the bits set — row-batch lz4
    // cannot shrink it, so if those bytes cross the wire they are
    // visible; a sparse filter would compress away and hide a
    // driver-side collect from the byte accounting below). The
    // round-11 driver-side collect pulled every surviving file's
    // filter into the driver; the distributed probe must return only
    // (file, col, value, boolean) rows.
    val n = 500000L
    for (f <- 0L until 4L) {
      val df = spark.range(f * n, (f + 1) * n)
        .select(concat(lit("doc-"), col("id")).as("key"), col("id").as("n"))
        .coalesce(1)
      Versioned.commitWithIndex(spark, dir, df, statCols = Nil,
        bloomCols = Seq("key"), bloomExpectedItems = n, bloomFpp = 0.01)
    }
    val filterBytes = bloomPtrs(dir, 3).map(_.split('\t')(3)).distinct
      .map(rel => new java.io.File(dir, rel).length()).sum
    assert(filterBytes > (512L << 10),
      s"fixture wants megabyte-class sidecars, got $filterBytes bytes")
    // capture every byte path a task result can take to the driver:
    // small results ship direct (taskMetrics.resultSize); anything
    // over spark.task.maxDirectResultSize ships as a TASK-RESULT
    // BLOCK the driver then fetches — collect()'s compressed row
    // batches land there once they hold real filter entropy. If
    // filter bytes leave the executors by either path, a large entry
    // appears; verdicts are a few hundred bytes.
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) results.add(e.taskMetrics.resultSize)
      override def onBlockUpdated(
          e: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit =
        if (e.blockUpdatedInfo.blockId
            .isInstanceOf[org.apache.spark.storage.TaskResultBlockId])
          results.add(
            math.max(e.blockUpdatedInfo.memSize, e.blockUpdatedInfo.diskSize))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val planned = Versioned.plannedFilesEq(spark, dir,
        col("key") === "doc-21")
      assert(planned.size >= 1 && planned.size < 4,
        s"expected a bloom-pruned plan, got $planned")
      // listener events are posted asynchronously; give the bus time
      // to drain before reading the captured sizes
      Thread.sleep(3000)
    } finally spark.sparkContext.removeSparkListener(listener)
    val worst = results.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    info(s"task result sizes during probe: max=${worst.max} n=${worst.length}")
    assert(worst.nonEmpty, "the probe ran no tasks?")
    assert(worst.max < (128L << 10),
      s"a task shipped ${worst.max} bytes to the driver — filter " +
        "bytes are leaving the executors")
    // and the lookup itself still answers exactly
    assert(Versioned.readEq(spark, dir, col("key") === "doc-21")
      .as[(String, Long)].collect().toSeq == Seq(("doc-21", 21L)))
  }
}
