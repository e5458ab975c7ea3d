package graft

import org.apache.spark.sql.functions._

import graft.lake.Versioned
import graft.lake.Versioned.{CheckViolationException, CommitConflictException}

/** Merge-on-read deletion vectors ([[Versioned.deleteWhereMor]] /
  * [[Versioned.updateWhereMor]]): row-level DML that moves O(matched
  * ROWS) bytes — the base files never rewrite; a parquet sidecar
  * records (file, row_index) pairs and every reader anti-joins them.
  * The spec pins five layers: the zero-rewrite manifest contract
  * (asserted against raw manifest text), SQL row semantics (NULL
  * predicate keeps; deletes stack and double-deletes dedup), the
  * materialization points (copy-on-write DML, merge, compaction — no
  * resurrection anywhere), the concurrency matrix (deletes compose
  * with appends and with each other; every rewrite×delete and
  * update×anything interleave conflicts, from BOTH sides), and the
  * retention/restore/change-feed integration.
  */
class VersionedDvSpec extends SparkSuite {
  import spark.implicits._

  private def rawManifest(dir: String, v: Int): Seq[String] =
    Versioned.manifestSnapshot(spark, dir, v)
  private def dataLines(dir: String, v: Int): Seq[String] =
    rawManifest(dir, v).filterNot(_.startsWith("#"))
  test("a metadata-only commit (addCheck/dropCheck) carries the " +
      "head's deletion vectors — it must not resurrect deleted rows") {
    val dir = tmpDir() + "/dv-addcheck"
    Versioned.commit(spark, dir,
      (0L until 10L).map(i => (i, i * 10L)).toDF("id", "v"))
    assert(Versioned.deleteWhereMor(spark, dir, col("id") < 3) == 1)
    assert(Versioned.read(spark, dir).count() == 7)
    Versioned.addCheck(spark, dir, "v_nonneg", "v >= 0")          // v2
    assert(Versioned.read(spark, dir).count() == 7,
      "addCheck's metadata commit resurrected MoR-deleted rows")
    Versioned.dropCheck(spark, dir, "v_nonneg")                   // v3
    assert(Versioned.read(spark, dir).count() == 7,
      "dropCheck's metadata commit resurrected MoR-deleted rows")
    assert(Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == (3L until 10L))
  }

  private def dvLines(dir: String, v: Int): Seq[String] =
    rawManifest(dir, v).filter(_.startsWith("#dv\t"))

  /** 40 rows in 4 range-clustered files: ids [0,10), [10,20), … with
    * per-file id stats recorded. */
  private def rangedTable(dir: String): Unit = {
    val df = (0L until 40L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
    Versioned.commitWithStats(spark, dir, df, "id")
    assert(dataLines(dir, 0).size == 4, "fixture wants 4 data files")
  }
  private def ids(dir: String, v: Option[Int] = None): Seq[Long] =
    Versioned.read(spark, dir, v).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq

  test("MoR delete: zero data-file rewrite, exact rows, time travel") {
    val dir = tmpDir() + "/dv-basic"
    rangedTable(dir)
    val v = Versioned.deleteWhereMor(spark, dir,
      col("id").between(10, 19))
    assert(v == 1)
    // THE contract: every data line republishes verbatim — the commit
    // wrote only the sidecar and the manifest
    assert(dataLines(dir, 1) == dataLines(dir, 0))
    assert(dvLines(dir, 1).nonEmpty && dvLines(dir, 0).isEmpty)
    assert(ids(dir) == ((0L to 9L) ++ (20L to 39L)))
    // time travel: the base version still reads every row
    assert(ids(dir, Some(0)) == (0L to 39L))
  }

  test("MoR delete: WHERE-TRUE rows only — NULL predicate keeps") {
    val dir = tmpDir() + "/dv-null"
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("id", "s")
    Versioned.commitWithStats(spark, dir, df, "id")
    Versioned.deleteWhereMor(spark, dir, col("id") === 1L)
    val left = Versioned.read(spark, dir).select("s").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(left == Seq("b", "c"), "NULL-predicate row must survive")
  }

  test("MoR delete: no match is a commit-free no-op; pruning is real") {
    val dir = tmpDir() + "/dv-noop"
    rangedTable(dir)
    assert(Versioned.deleteWhereMor(spark, dir, col("id") > 1000L) == 0)
    assert(Versioned.latestVersion(spark, dir).contains(0))
    // the same stat pruner as copy-on-write rules files out pre-scan
    val m = dataLines(dir, 0)
    val pred = Versioned.resolvedPredicate(spark,
      Versioned.read(spark, dir).schema, col("id").between(10, 19))
    assert(Versioned.pruneCandidates(pred, m).size < m.size)
  }

  test("MoR deletes stack; overlapping (double) deletes dedup") {
    val dir = tmpDir() + "/dv-stack"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id").between(10, 15))
    Versioned.deleteWhereMor(spark, dir, col("id").between(13, 22))
    assert(ids(dir) == ((0L to 9L) ++ (23L to 39L)))
    assert(Versioned.read(spark, dir).count() == 27)
  }

  test("readPruned applies DVs on kept files") {
    val dir = tmpDir() + "/dv-pruned"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id") === 12L)
    val got = Versioned.readPruned(spark, dir, "id", 10L, 14L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 11L, 13L, 14L))
  }

  test("compaction materializes DVs: same rows, no #dv lines") {
    val dir = tmpDir() + "/dv-compact"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id").between(10, 19))
    val before = ids(dir)
    val v = Versioned.compactCommit(spark, dir)
    assert(dvLines(dir, v).isEmpty, "compaction must materialize DVs")
    assert(ids(dir) == before)
    assert(ids(dir, Some(1)) == before, "pre-compact version intact")
  }

  test("copy-on-write DML over a DV'd file materializes, never " +
      "resurrects") {
    val dir = tmpDir() + "/dv-cow"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id").between(10, 13))
    // CoW UPDATE rewrites the same [10,20) file: the DV'd rows must
    // stay gone and the file's DV pointer must drop (materialized)
    val v = Versioned.updateWhere(spark, dir,
      col("id").between(14, 19), Map("s" -> upper(col("s"))))
    assert(dvLines(dir, v).isEmpty)
    assert(ids(dir) == ((0L to 9L) ++ (14L to 39L)))
    val upd = Versioned.read(spark, dir)
      .filter(col("s") === lit("ROW15")).count()
    assert(upd == 1)
  }

  test("mergeInto over a DV'd file does not resurrect") {
    val dir = tmpDir() + "/dv-merge"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id") === 15L)
    Versioned.mergeInto(spark, dir,
      Seq((16L, "merged")).toDF("id", "s"), Seq("id"))
    assert(ids(dir) == (0L to 39L).filterNot(_ == 15L))
    assert(Versioned.read(spark, dir)
      .filter(col("s") === "merged").count() == 1)
  }

  test("composition: appends carry (as-of-base, not rescanned); " +
      "delete×delete unions") {
    val dir = tmpDir() + "/dv-compose"
    rangedTable(dir)
    // an append lands AFTER the delete's base — its rows match the
    // predicate but must survive (the delete scanned version 0)
    Versioned.commit(spark, dir,
      Seq((15L, "late")).toDF("id", "s"), replace = false)
    val v = Versioned.deleteWhereMor(spark, dir,
      col("id").between(10, 19), baseVersion = Some(0))
    assert(v == 2)
    assert(Versioned.read(spark, dir)
      .filter(col("s") === "late").count() == 1)
    // two deletes from the SAME base both publish: position sets union
    val v2 = Versioned.deleteWhereMor(spark, dir,
      col("id").between(30, 34), baseVersion = Some(0))
    assert(v2 == 3)
    assert(ids(dir).filterNot(_ == 15L) ==
      ((0L to 9L) ++ (20L to 29L) ++ (35L to 39L)))
  }

  test("conflict both ways: rewrite×MoR-delete") {
    // side 1: MoR delete lands, then a CoW delete from the stale base
    // rewrites the DV'd file — publishing would resurrect (lost
    // delete); must conflict
    val a = tmpDir() + "/dv-conflict-a"
    rangedTable(a)
    Versioned.deleteWhereMor(spark, a, col("id") === 12L)
    intercept[CommitConflictException] {
      Versioned.deleteWhere(spark, a, col("id") === 14L,
        baseVersion = Some(0))
    }
    // side 2: CoW delete lands, then a MoR delete from the stale base
    // targets positions in a file that no longer exists; must conflict
    val b = tmpDir() + "/dv-conflict-b"
    rangedTable(b)
    Versioned.deleteWhere(spark, b, col("id") === 14L)
    intercept[CommitConflictException] {
      Versioned.deleteWhereMor(spark, b, col("id") === 12L,
        baseVersion = Some(0))
    }
  }

  test("MoR update: positions re-home, CHECKs re-validate, strict " +
      "serialization") {
    val dir = tmpDir() + "/dv-update"
    rangedTable(dir)
    val v = Versioned.updateWhereMor(spark, dir,
      col("id").between(10, 12), Map("s" -> upper(col("s"))))
    assert(v == 1)
    // old data lines all survive; ONE commit adds both the DV and the
    // re-homed copies
    assert(dataLines(dir, 0).toSet.subsetOf(dataLines(dir, 1).toSet))
    assert(dvLines(dir, 1).nonEmpty)
    assert(ids(dir) == (0L to 39L), "update moves rows, loses none")
    assert(Versioned.read(spark, dir)
      .filter(col("s").isin("ROW10", "ROW11", "ROW12")).count() == 3)
    // CHECK constraints catch a violating rewrite before publish
    Versioned.addCheck(spark, dir, "s_nonempty", "length(s) > 0")
    intercept[CheckViolationException] {
      Versioned.updateWhereMor(spark, dir, col("id") === 20L,
        Map("s" -> lit("")))
    }
    // a PINNED base stays strict: the caller asked for that snapshot,
    // so any interleaved commit conflicts instead of silently
    // re-deriving from a head the caller never saw
    intercept[CommitConflictException] {
      Versioned.updateWhereMor(spark, dir, col("id") === 21L,
        Map("s" -> lit("x")), baseVersion = Some(0))
    }
  }

  test("MoR update retries from the new head under append traffic: " +
      "the appends and the updates ALL land, serial-equivalent") {
    val dir = tmpDir() + "/dv-upd-retry"
    rangedTable(dir)
    // an appender hammers the head (its own commits retry-on-lost-race
    // by design) while five MoR updates run — each update's CAS window
    // almost surely loses at least once, and each must re-derive from
    // the new head and converge instead of throwing
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val appender = new Thread(() => {
      try {
        var i = 1000L
        while (!stop.get()) {
          Versioned.commit(spark, dir,
            Seq((i, s"row$i")).toDF("id", "s"))
          appended.add(i); i += 1
        }
      } catch { case t: Throwable => failed.set(t) }
    })
    appender.start()
    try {
      for (k <- 10L to 14L)
        Versioned.updateWhereMor(spark, dir, col("id") === k,
          Map("s" -> lit(s"moved$k")))
    } finally { stop.set(true); appender.join() }
    assert(failed.get() == null, s"appender died: ${failed.get()}")
    assert(!appended.isEmpty, "fixture wants real append traffic")
    val got = Versioned.read(spark, dir).as[(Long, String)]
      .collect().toMap
    val appendedIds = appended.toArray(Array.empty[java.lang.Long])
      .map(_.toLong).toSet
    assert(got.keySet == (0L to 39L).toSet ++ appendedIds,
      "every base row and every appended row must survive the races")
    for (k <- 10L to 14L)
      assert(got(k) == s"moved$k", s"update of id=$k was lost")
    assert(appendedIds.forall(i => got(i) == s"row$i"),
      "appended rows must carry through the update retries untouched")
  }

  test("racing MoR updates on DISJOINT files both land — even from a " +
      "pinned base — and replay to the serial oracle; overlapping " +
      "pinned updates still throw typed") {
    val dir = tmpDir() + "/dv-upd-disjoint"
    rangedTable(dir) // 4 files: [0,10) [10,20) [20,30) [30,40)
    // writer B lands first, touching only the [20,30) file
    assert(Versioned.updateWhereMor(spark, dir, col("id") === 25L,
      Map("s" -> lit("b25"))) == 1)
    // writer A pinned at base 0 touches only the [10,20) file —
    // DISJOINT from B's scan, so its staged DV + copies are still
    // byte-exact and the fast-forward composes them onto v1 (DV
    // union + both staged file sets), instead of throwing
    assert(Versioned.updateWhereMor(spark, dir, col("id") === 15L,
      Map("s" -> lit("a15")), baseVersion = Some(0)) == 2)
    val got = Versioned.read(spark, dir).as[(Long, String)]
      .collect().toMap
    // serial oracle: base content with both edits applied, in any
    // order (they commute — disjoint rows)
    val want = (0L until 40L).map(i => i -> (i match {
      case 25L => "b25"
      case 15L => "a15"
      case _ => s"row$i"
    })).toMap
    assert(got == want, "disjoint racing updates must replay serial")
    // an OVERLAPPING pinned update (same [10,20) file A re-homed)
    // still conflicts, typed: its staged positions are stale
    intercept[CommitConflictException] {
      Versioned.updateWhereMor(spark, dir, col("id") === 16L,
        Map("s" -> lit("c16")), baseVersion = Some(0))
    }
    // ... while the same update UNPINNED re-derives and lands
    assert(Versioned.updateWhereMor(spark, dir, col("id") === 16L,
      Map("s" -> lit("c16"))) == 3)
    assert(Versioned.read(spark, dir)
      .filter(col("s") === "c16").count() == 1)
  }

  test("conflict: MoR delete vs interleaved MoR update (attribution)") {
    val dir = tmpDir() + "/dv-upd-race"
    rangedTable(dir)
    // the update re-homes rows in the [10,20) file; a delete that
    // scanned that file from the pre-update base could strand the
    // staged copies — must conflict, even though no file was removed
    Versioned.updateWhereMor(spark, dir, col("id").between(10, 12),
      Map("s" -> upper(col("s"))))
    intercept[CommitConflictException] {
      Versioned.deleteWhereMor(spark, dir, col("id") === 11L,
        baseVersion = Some(0))
    }
  }

  test("retention: live sidecars survive grace-0 expiry; dead ones " +
      "collect with their versions") {
    val dir = tmpDir() + "/dv-expire"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id").between(10, 19))
    def sidecars(): Int = {
      val root = java.nio.file.Paths.get(dir, "data")
      val all = java.nio.file.Files.walk(root).iterator()
      val dvRels = dvLines(dir,
        Versioned.latestVersion(spark, dir).get).map(_.split('\t')(2))
      var n = 0
      all.forEachRemaining(p => if (dvRels.exists(r =>
        p.toString.endsWith(r.split('/').last))) n += 1)
      n
    }
    assert(sidecars() == dvLines(dir, 1).map(_.split('\t')(2))
      .distinct.size)
    // head (v1) references the sidecar: grace 0 must NOT collect it
    Versioned.expire(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    assert(ids(dir) == ((0L to 9L) ++ (20L to 39L)),
      "deleted rows must stay deleted after expiry")
    // compaction materializes; expiring down to the compacted head
    // collects the now-unreferenced sidecar AND the old base files
    Versioned.compactCommit(spark, dir)
    Versioned.expire(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    val left = java.nio.file.Files.walk(
      java.nio.file.Paths.get(dir, "data")).iterator()
    var parquets = 0
    left.forEachRemaining(p =>
      if (p.toString.endsWith(".parquet")) parquets += 1)
    assert(parquets == dataLines(dir,
      Versioned.latestVersion(spark, dir).get).size,
      "only the compacted head's files may remain")
  }

  test("restore: a DV'd version restores with its deletes; restoring " +
      "past a delete resurrects (that is the undo)") {
    val dir = tmpDir() + "/dv-restore"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id").between(10, 19))
    Versioned.commit(spark, dir,
      (100L to 105L).map(i => (i, s"row$i")).toDF("id", "s"),
      replace = true) // v2: a bad replace
    val v3 = Versioned.restore(spark, dir, 1)
    assert(v3 == 3)
    assert(ids(dir) == ((0L to 9L) ++ (20L to 39L)),
      "restored version keeps its deletion vectors")
    val v4 = Versioned.restore(spark, dir, 0)
    assert(v4 == 4)
    assert(ids(dir) == (0L to 39L),
      "restore to the pre-delete version undoes the delete")
  }

  test("change feed: a DV commit reads as exactly its deleted rows; " +
      "a restore past it as the resurrection; MoR update as pairs") {
    val dir = tmpDir() + "/dv-feed"
    rangedTable(dir)
    Versioned.deleteWhereMor(spark, dir, col("id").between(10, 14))
    val f1 = Versioned.changesBetween(spark, dir, 0, 1, Seq("id"))
      .collect()
    assert(f1.length == 5 &&
      f1.forall(_.getAs[String]("_change_type") == "delete"))
    assert(f1.map(_.getAs[Long]("id")).sorted.toSeq == (10L to 14L))
    Versioned.restore(spark, dir, 0)
    val f2 = Versioned.changesBetween(spark, dir, 1, 2, Seq("id"))
      .collect()
    assert(f2.length == 5 &&
      f2.forall(_.getAs[String]("_change_type") == "insert"),
      "dropping a DV (restore) feeds as resurrection inserts")
    Versioned.updateWhereMor(spark, dir, col("id") === 30L,
      Map("s" -> lit("moved")))
    val f3 = Versioned.changesBetween(spark, dir, 2, 3, Seq("id"))
      .collect()
    assert(f3.map(_.getAs[String]("_change_type")).sorted.toSeq ==
      Seq("update_postimage", "update_preimage"),
      "a MoR update feeds as one pre/post pair, not delete+insert")
    assert(f3.forall(_.getAs[Long]("id") == 30L))
  }

  test("dvDebt: per-file deleted-position fraction from the manifest " +
      "— the compaction-scheduling signal, cleared by compactCommit") {
    val dir = tmpDir() + "/dv-debt"
    rangedTable(dir) // 4 files x 10 rows with ~r row counts recorded
    val clean = Versioned.dvDebt(spark, dir).collect()
    assert(clean.length == 4 && clean.forall(r =>
      r.getAs[Long]("deleted") == 0L &&
        r.getAs[Double]("fraction") == 0.0))
    // two stacked deletes against the [10,20) file: 5 + 2 positions
    Versioned.deleteWhereMor(spark, dir, col("id").between(10, 14))
    Versioned.deleteWhereMor(spark, dir, col("id").between(15, 16))
    val debt = Versioned.dvDebt(spark, dir).collect()
      .map(r => (r.getAs[Long]("deleted"), r.getAs[Double]("fraction")))
    val hot = debt.filter(_._1 > 0L)
    assert(hot.toSeq == Seq((7L, 0.7)),
      s"expected one file at 7/10 debt, got ${debt.toSeq}")
    // the policy read: which files pay for a rewrite at a threshold
    assert(Versioned.dvDebt(spark, dir)
      .filter(col("fraction") >= 0.3).count() == 1)
    assert(Versioned.dvDebt(spark, dir)
      .filter(col("fraction") >= 0.8).count() == 0)
    // compaction materializes the DVs: debt returns to zero and the
    // row count stays exact
    Versioned.compactCommit(spark, dir)
    val after = Versioned.dvDebt(spark, dir).collect()
    assert(after.forall(_.getAs[Long]("deleted") == 0L))
    assert(Versioned.read(spark, dir).count() == 33)
  }

  test("100 stacked deletion vectors on one file: reads stay exact, " +
      "the metadata count stays exact, and dvDebt reports the full " +
      "stack — the retention-drip worst case") {
    val dir = tmpDir() + "/dv-stack"
    // 400 rows in 4 range files of 100; every point delete below hits
    // file [0,100), so its DVs stack 100 deep — the nightly-drip shape
    // a DV-based format must survive between compactions
    val df = (0L until 400L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
    Versioned.commitWithStats(spark, dir, df, "id")
    for (k <- 0L until 100L)
      Versioned.deleteWhereMor(spark, dir, col("id") === k)
    assert(Versioned.latestVersion(spark, dir).contains(100))
    val head = Versioned.latestVersion(spark, dir).get
    assert(dvLines(dir, head).size == 100, "one DV pointer per delete")
    // the read unions all 100 position sidecars and stays exact
    assert(ids(dir) == (100L until 400L))
    // so does the manifest-only count (base rows minus DV positions)
    assert(Versioned.rowCountFromMetadata(spark, dir).contains(300L))
    // the advisor sees the whole stack concentrated on one file
    val debt = Versioned.dvDebt(spark, dir).collect()
      .map(r => (r.getAs[Long]("deleted"), r.getAs[Double]("fraction")))
    assert(debt.count(_._1 > 0L) == 1 && debt.contains((100L, 1.0)),
      s"expected one fully-deleted file, got ${debt.toSeq}")
    // one compaction clears the whole stack; history stays travelable
    Versioned.compactCommit(spark, dir)
    assert(ids(dir) == (100L until 400L))
    assert(Versioned.dvDebt(spark, dir).collect()
      .forall(_.getAs[Long]("deleted") == 0L))
    assert(Versioned.read(spark, dir, Some(50)).count() == 350,
      "mid-stack versions must remain time-travelable")
  }
}
