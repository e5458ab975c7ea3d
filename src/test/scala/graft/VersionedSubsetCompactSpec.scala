package graft

import org.apache.spark.sql.functions._

import graft.lake.Versioned
import graft.lake.Versioned.CommitConflictException

/** Round-18 SUBSET compaction ([[Versioned.compactSubset]]): select
  * files by debt signal (small-file floor / DV fraction / stats
  * predicate), rewrite ONLY those, republish the rest verbatim. The
  * properties under test are the ones that make maintenance
  * schedulable at 100 TB: cost and conflict surface are O(selected),
  * untouched manifest lines carry byte-identically, the change feed
  * nets zero rows, and concurrent commits on UNSELECTED files compose
  * where a whole-table compact would conflict.
  */
class VersionedSubsetCompactSpec extends SparkSuite {
  import spark.implicits._

  private def rows(lo: Int, hi: Int, tag: String) =
    (lo until hi).map(i => (i.toLong, tag)).toDF("id", "s")

  test("small-file bin-pack: merges only files below the floor; the " +
      "big file's manifest line republishes verbatim, content exact, " +
      "history intact") {
    val dir = tmpDir() + "/bin-pack"
    // one BIG commit (many rows, 1 file) + four small dribble commits
    Versioned.commitWithStats(spark, dir,
      rows(0, 20000, "big").coalesce(1), "id")                    // v0
    (0 until 4).foreach(i =>
      Versioned.commitWithStats(spark, dir,
        rows(20000 + i * 10, 20010 + i * 10, s"s$i").coalesce(1), "id"))
    val head0 = Versioned.latestVersion(spark, dir).get
    val linesBefore = Versioned.manifestDataLines(spark, dir, head0)
    assert(linesBefore.size == 5)
    val bigLine = linesBefore.head // v0's file leads the manifest
    val v = Versioned.compactSubset(spark, dir,
      smallFileBytes = Some(64L << 10), targetBytes = 1L << 30)
    assert(v == head0 + 1)
    val linesAfter = Versioned.manifestDataLines(spark, dir, v)
    // 4 small files -> 1; the big file untouched, line VERBATIM
    assert(linesAfter.size == 2, s"expected 2 lines, got $linesAfter")
    assert(linesAfter.contains(bigLine),
      "the unselected big file's manifest line must carry verbatim")
    val got = Versioned.read(spark, dir).as[(Long, String)]
      .collect().toSet
    val want = ((0 until 20000).map(i => (i.toLong, "big")) ++
      (0 until 4).flatMap(i => (20000 + i * 10 until 20010 + i * 10)
        .map(j => (j.toLong, s"s$i")))).toSet
    assert(got == want)
    // time travel to the pre-compaction head still reads 5 files
    assert(Versioned.read(spark, dir, Some(head0)).inputFiles.length == 5)
    // a compaction changes no row: the keyless change feed nets zero
    assert(Versioned.changesBetween(spark, dir, v, v, Nil).count() == 0)
    assert(Versioned.history(spark, dir).filter(col("version") === v)
      .select("operation").head().getString(0) == "compact-subset")
  }

  test("selection below any gain is a no-op: empty selection and a " +
      "single small file with no DVs both return the base unchanged") {
    val dir = tmpDir() + "/no-op"
    Versioned.commit(spark, dir, rows(0, 20000, "big").coalesce(1))  // v0
    Versioned.commit(spark, dir, rows(20000, 20010, "s").coalesce(1)) // v1
    // floor below every file: nothing selected
    assert(Versioned.compactSubset(spark, dir,
      smallFileBytes = Some(1L)) == 1)
    // floor catches exactly one file, no DVs, no clustering: churn
    assert(Versioned.compactSubset(spark, dir,
      smallFileBytes = Some(64L << 10)) == 1)
    assert(Versioned.latestVersion(spark, dir).contains(1))
  }

  test("dv-debt selection: rewrites exactly the DV-carrying file, " +
      "materializes its deletes, leaves the clean files' lines alone") {
    val dir = tmpDir() + "/dv-debt"
    Versioned.commitWithStats(spark, dir,
      rows(0, 100, "a").coalesce(1), "id")                          // v0
    Versioned.commitWithStats(spark, dir,
      rows(100, 200, "b").coalesce(1), "id")                        // v1
    // MoR delete: DV lands on the first file only
    val vDel = Versioned.deleteWhereMor(spark, dir, col("id") < 10)  // v2
    val mDel = Versioned.manifestDataLines(spark, dir, vDel)
    assert(mDel.size == 2)
    // identify the DV-free file by its recorded id range, not its
    // uuid path (hex names contain any letter you grep for)
    val cleanLine = mDel.find(_.contains("\tid\t100\t199")).get
    val v = Versioned.compactSubset(spark, dir,
      dvDebtAbove = Some(0.05), targetBytes = 1L << 30)
    assert(v == vDel + 1)
    val after = Versioned.manifestDataLines(spark, dir, v)
    assert(after.size == 2)
    assert(after.contains(cleanLine),
      "the DV-free file's line must republish verbatim")
    // DVs materialized: head carries none, content reflects the delete
    assert(Versioned.dvDebt(spark, dir).filter(col("deleted") > 0)
      .count() == 0)
    assert(Versioned.read(spark, dir).count() == 190)
    assert(Versioned.read(spark, dir).filter(col("id") < 10).count() == 0)
  }

  test("where-selection + clusterBy: merges exactly the files the " +
      "predicate's stats admit and the rewrite lands range-disjoint " +
      "(readPruned plans fewer files after)") {
    val dir = tmpDir() + "/where-cluster"
    // four round-robin files: every stat range spans the key space
    (0 until 4).foreach { i =>
      val ids = (0 until 64).filter(_ % 4 == i)
      Versioned.commitWithStats(spark, dir,
        ids.map(id => (id.toLong, s"w$i")).toDF("id", "s")
          .repartition(1), "id")
    }
    // one DISJOINT high-range file the predicate cannot admit
    Versioned.commitWithStats(spark, dir,
      rows(1000, 1100, "hi").coalesce(1), "id")                     // v4
    val preLines = Versioned.manifestDataLines(spark, dir, 4)
    val hiLine = preLines.last
    assert(Versioned.readPruned(spark, dir, "id", 0L, 3L)
      .inputFiles.length == 4) // all overlapping files planned
    val v = Versioned.compactSubset(spark, dir,
      where = Some(col("id") < 64),
      clusterBy = Some(Seq("id")), targetBytes = 1L)
    val after = Versioned.manifestDataLines(spark, dir, v)
    assert(after.contains(hiLine),
      "the stats-excluded file must republish verbatim")
    val narrow = Versioned.readPruned(spark, dir, "id", 0L, 3L)
    assert(narrow.inputFiles.length < 4,
      s"clustered subset rewrite must prune, planned " +
        s"${narrow.inputFiles.length}")
    assert(narrow.select("id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
    assert(Versioned.read(spark, dir).count() == 164)
  }

  test("maxFiles caps the bite, DV debt outranks size: the DV'd file " +
      "compacts first, the rest wait for the next run") {
    val dir = tmpDir() + "/max-files"
    (0 until 3).foreach(i =>
      Versioned.commitWithStats(spark, dir,
        rows(i * 100, i * 100 + 100, s"f$i").coalesce(1), "id"))
    Versioned.deleteWhereMor(spark, dir, col("id") === 5L) // DV on f0
    val head0 = Versioned.latestVersion(spark, dir).get
    val v = Versioned.compactSubset(spark, dir,
      smallFileBytes = Some(1L << 30), // selects all three
      maxFiles = Some(1), targetBytes = 1L << 30)
    assert(v == head0 + 1)
    // only ONE file rewrote — and it was the DV-debt one: the head
    // carries no DVs and two of the three original lines
    val before = Versioned.manifestDataLines(spark, dir, head0)
    val after = Versioned.manifestDataLines(spark, dir, v)
    assert(after.size == 3)
    assert(before.toSet.intersect(after.toSet).size == 2)
    assert(Versioned.dvDebt(spark, dir).filter(col("deleted") > 0)
      .count() == 0)
    assert(Versioned.read(spark, dir).count() == 299)
  }

  test("stale-base publish composes with interleaved commits on " +
      "UNSELECTED files: an append and a CoW delete land between " +
      "selection and publish, and the swap carries both") {
    val dir = tmpDir() + "/compose"
    Versioned.commitWithStats(spark, dir,
      rows(0, 20000, "big").coalesce(1), "id")                      // v0
    (0 until 3).foreach(i =>
      Versioned.commitWithStats(spark, dir,
        rows(20000 + i * 10, 20010 + i * 10, s"s$i").coalesce(1), "id"))
    val base = Versioned.latestVersion(spark, dir).get       // v3
    // interleaved, AFTER the selection snapshot: an append and a CoW
    // delete that rewrites the UNSELECTED big file
    Versioned.commit(spark, dir, rows(9000, 9010, "late").coalesce(1))
    Versioned.deleteWhere(spark, dir, col("id") < 100)        // big file
    // whole-table compact FROM THE SAME STALE BASE would conflict: its
    // carried big-file line no longer exists in the head
    val v = Versioned.compactSubset(spark, dir,
      smallFileBytes = Some(64L << 10), targetBytes = 1L << 30,
      baseVersion = Some(base))
    assert(Versioned.latestVersion(spark, dir).contains(v))
    val got = Versioned.read(spark, dir).as[(Long, String)]
      .collect().toSet
    val want = ((100 until 20000).map(i => (i.toLong, "big")) ++
      (0 until 3).flatMap(i => (20000 + i * 10 until 20010 + i * 10)
        .map(j => (j.toLong, s"s$i"))) ++
      (9000 until 9010).map(i => (i.toLong, "late"))).toSet
    assert(got == want, "the swap must carry the interleaved append " +
      "AND the interleaved delete's rewrite")
    // and the bin-pack still happened: 3 small -> 1
    assert(Versioned.read(spark, dir).inputFiles.length == 3)
  }

  test("conflict surface is the SELECTED files: an interleaved rewrite " +
      "of a selected file, or a DV landing on one, refuses loudly") {
    val dir = tmpDir() + "/conflict"
    Versioned.commitWithStats(spark, dir,
      rows(0, 100, "a").coalesce(1), "id")                          // v0
    Versioned.commitWithStats(spark, dir,
      rows(100, 200, "b").coalesce(1), "id")                        // v1
    val base = Versioned.latestVersion(spark, dir).get
    // interleaved CoW delete rewrites file b — which the selection
    // (floor catches everything) claims
    Versioned.deleteWhere(spark, dir, col("id") === 150L)
    intercept[CommitConflictException] {
      Versioned.compactSubset(spark, dir,
        smallFileBytes = Some(1L << 30), baseVersion = Some(base))
    }
    // fresh selection from the new head succeeds
    val v = Versioned.compactSubset(spark, dir,
      smallFileBytes = Some(1L << 30), targetBytes = 1L << 30)
    assert(Versioned.read(spark, dir, Some(v)).count() == 199)
    // late DV: select at a two-file head, then a MoR delete stamps a
    // selected file before publish — the staged copies would
    // resurrect the deleted row, so the swap must refuse
    Versioned.commitWithStats(spark, dir,
      rows(200, 300, "c").coalesce(1), "id")
    val base2 = Versioned.latestVersion(spark, dir).get
    Versioned.deleteWhereMor(spark, dir, col("id") === 42L)
    intercept[CommitConflictException] {
      Versioned.compactSubset(spark, dir,
        smallFileBytes = Some(1L << 30), baseVersion = Some(base2))
    }
    assert(Versioned.read(spark, dir).count() == 298)
  }

  test("overlapsAbove selects the cross-commit overlap cohort on the " +
      "declared cluster key: interleaved files merge to disjoint " +
      "ranges, the disjoint file carries verbatim, undeclared " +
      "clustering refuses") {
    val dir = tmpDir() + "/overlaps"
    Versioned.commitWithStats(spark, dir,
      rows(0, 10, "x").limit(0), Seq("id"), replace = false)    // v0
    Versioned.setPolicy(spark, dir, clusterBy = Some(Seq("id")))
    // two interleaved commits (even/odd ids — ranges overlap) + one
    // disjoint high-range commit; each lands one file
    Versioned.commit(spark, dir, (0 until 100).filter(_ % 2 == 0)
      .map(i => (i.toLong, "even")).toDF("id", "s").coalesce(1))
    Versioned.commit(spark, dir, (0 until 100).filter(_ % 2 == 1)
      .map(i => (i.toLong, "odd")).toDF("id", "s").coalesce(1))
    Versioned.commit(spark, dir, rows(5000, 5100, "hi").coalesce(1))
    val head = Versioned.latestVersion(spark, dir).get
    val before = Versioned.manifestDataLines(spark, dir, head)
    val hiLine = before.find(_.contains("\tid\t5000\t5099")).get
    val v = Versioned.compactSubset(spark, dir,
      overlapsAbove = Some(1), targetBytes = 1L << 30)
    val after = Versioned.manifestDataLines(spark, dir, v)
    assert(after.contains(hiLine),
      "the overlap-free file's line must republish verbatim")
    assert(after.size == 3, // zero-row v0 file + merged pair + hi
      s"the overlapping pair must merge: $after")
    assert(Versioned.read(spark, dir).count() == 200)
    // post-merge the table carries no overlap debt: a second run
    // finds nothing and returns the head unchanged
    assert(Versioned.compactSubset(spark, dir,
      overlapsAbove = Some(1)) == v)
    // without declared clustering the selector refuses loudly
    val dir2 = tmpDir() + "/overlaps-none"
    Versioned.commit(spark, dir2, rows(0, 10, "x"))
    val e = intercept[IllegalArgumentException](
      Versioned.compactSubset(spark, dir2, overlapsAbove = Some(1)))
    assert(e.getMessage.contains("cluster"))
  }

  test("stats and blooms survive the subset rewrite at recorded " +
      "sizing: readPruned file-skips and the rewritten file carries " +
      "fresh bloom pointers") {
    val dir = tmpDir() + "/stats-survive"
    Versioned.commitWithIndex(spark, dir,
      rows(0, 100, "a").coalesce(1), Seq("id"), Seq("s"))
    Versioned.commitWithIndex(spark, dir,
      rows(100, 200, "b").coalesce(1), Seq("id"), Seq("s"))
    Versioned.commitWithIndex(spark, dir,
      rows(200, 300, "c").coalesce(1), Seq("id"), Seq("s"))
    val v = Versioned.compactSubset(spark, dir,
      where = Some(col("id") < 200), targetBytes = 1L << 30)
    // two low files merged into one; stats re-measured so the high
    // window still plans exactly the untouched file
    assert(Versioned.read(spark, dir).inputFiles.length == 2)
    assert(Versioned.readPruned(spark, dir, "id", 250, 260)
      .inputFiles.length == 1)
    assert(Versioned.readPruned(spark, dir, "id", 0, 10)
      .inputFiles.length == 1)
    // bloom pointers: the rewritten file re-measured its indexed col
    val blooms = Versioned.manifestSnapshot(spark, dir, v)
      .filter(_.startsWith("#bloom\t"))
    assert(blooms.size == 2,
      s"expected one bloom pointer per surviving file, got $blooms")
  }
}
