package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier}

import org.apache.spark.sql.functions._

import graft.lake.Versioned
import graft.lake.Versioned.CommitConflictException

/** Round-11 multi-writer protocol for [[graft.lake.Versioned]]: racing
  * committers (append×append, append×replace, append×compaction),
  * deterministic stale-base replace validation (merge on disjoint keys,
  * conflict on overlap or interleaved replace), reader-pinned expiry,
  * and the orphan-file grace window. Thread tests use a CyclicBarrier so
  * both writers enter the commit protocol together — the interleaving
  * itself stays scheduler-chosen, which is the point: the FINAL state
  * must be identical no matter who wins each version.
  */
class VersionedConcurrencySpec extends SparkSuite {
  import spark.implicits._

  private def rows(lo: Int, hi: Int, tag: String) =
    (lo until hi).map(i => (i.toLong, tag)).toDF("id", "s")

  /** Run each thunk on its own thread; rethrow the first failure. */
  private def inParallel(thunks: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = thunks.map(f => new Thread(() =>
      try f() catch { case t: Throwable => errs.add(t); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

  test("racing appends: every commit lands, no version lost, final " +
      "state is the union regardless of winner order") {
    val dir = tmpDir() + "/race-aa"
    val barrier = new CyclicBarrier(2)
    val perWriter = 3
    inParallel(
      () => { barrier.await()
        (0 until perWriter).foreach(i =>
          Versioned.commit(spark, dir, rows(i * 10, i * 10 + 10, "A"))) },
      () => { barrier.await()
        (0 until perWriter).foreach(i =>
          Versioned.commit(spark, dir, rows(100 + i * 10, 110 + i * 10, "B"))) })
    // 6 commits -> versions 0..5, none clobbered
    assert(Versioned.latestVersion(spark, dir).contains(2 * perWriter - 1))
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    val want = ((0 until 30).map(i => (i.toLong, "A")) ++
      (100 until 130).map(i => (i.toLong, "B"))).toSet
    assert(got == want)
    // every intermediate version still reads cleanly (no torn manifest)
    (0 until 2 * perWriter).foreach(v =>
      Versioned.read(spark, dir, Some(v)).count())
  }

  test("four-writer commit storm: 16 racing appends all land, versions " +
      "dense, every snapshot readable, final state exact") {
    val dir = tmpDir() + "/race-storm"
    val nWriters = 4
    val perWriter = 4
    val barrier = new CyclicBarrier(nWriters)
    inParallel((0 until nWriters).map { w =>
      () => { barrier.await()
        (0 until perWriter).foreach { i =>
          Versioned.commit(spark, dir,
            rows(w * 1000 + i * 100, w * 1000 + i * 100 + 50, s"w$w"))
        } }
    }: _*)
    val latest = Versioned.latestVersion(spark, dir)
    assert(latest.contains(nWriters * perWriter - 1),
      s"lost a version under contention: $latest")
    val got = Versioned.read(spark, dir).count()
    assert(got == nWriters * perWriter * 50L)
    // version chain is strictly append-monotone: each version has at
    // least as many rows as its predecessor (appends never drop data)
    val counts = (0 until nWriters * perWriter)
      .map(v => Versioned.read(spark, dir, Some(v)).count())
    assert(counts == counts.sorted, s"non-monotone chain: $counts")
  }

  test("stale-base replace with disjoint keys merges the interleaved " +
      "append (serializes as replace-then-append)") {
    val dir = tmpDir() + "/replace-merge"
    Versioned.commit(spark, dir, rows(0, 10, "even"))          // v0
    Versioned.commit(spark, dir, rows(100, 110, "odd"))        // v1 appended
    // a replace derived from v0 (stale base), keys disjoint from v1's
    val v2 = Versioned.commitReplace(spark, dir,
      rows(0, 10, "even2"), keyCols = Seq("id"), baseVersion = Some(0))
    assert(v2 == 2)
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    val want = ((0 until 10).map(i => (i.toLong, "even2")) ++
      (100 until 110).map(i => (i.toLong, "odd"))).toSet
    assert(got == want)
  }

  test("stale-base replace with overlapping keys throws a typed " +
      "conflict, and the head is untouched") {
    val dir = tmpDir() + "/replace-conflict"
    Versioned.commit(spark, dir, rows(0, 10, "base"))          // v0
    Versioned.commit(spark, dir, rows(5, 15, "later"))         // v1 overlaps
    intercept[CommitConflictException] {
      Versioned.commitReplace(spark, dir, rows(0, 10, "mine"),
        keyCols = Seq("id"), baseVersion = Some(0))
    }
    assert(Versioned.latestVersion(spark, dir).contains(1))
    assert(Versioned.read(spark, dir).count() == 20)
  }

  test("stale-base replace with an EMPTY frame merges to just the " +
      "interleaved appends (zero staged files must not crash validation)") {
    val dir = tmpDir() + "/replace-empty"
    Versioned.commit(spark, dir, rows(0, 10, "base"))          // v0
    Versioned.commit(spark, dir, rows(100, 110, "later"))      // v1
    // truncate-to-empty derived from v0, with v1 interleaved: the
    // result must be exactly v1's appended rows (replace-then-append)
    val v2 = Versioned.commitReplace(spark, dir,
      rows(0, 0, "none"), keyCols = Seq("id"), baseVersion = Some(0))
    assert(v2 == 2)
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    assert(got == (100 until 110).map(i => (i.toLong, "later")).toSet)
  }

  test("replace interleaved with another replace conflicts even on " +
      "disjoint keys (both claimed full-table authority)") {
    val dir = tmpDir() + "/replace-replace"
    Versioned.commit(spark, dir, rows(0, 10, "base"))                 // v0
    Versioned.commit(spark, dir, rows(50, 60, "other"), replace = true) // v1
    intercept[CommitConflictException] {
      Versioned.commitReplace(spark, dir, rows(200, 210, "mine"),
        keyCols = Seq("id"), baseVersion = Some(0))
    }
  }

  test("racing append × validated replace: both land, final state is " +
      "replace-rows + appended-rows whoever wins") {
    val dir = tmpDir() + "/race-ar"
    Versioned.commit(spark, dir, rows(0, 10, "even"))          // v0
    val barrier = new CyclicBarrier(2)
    inParallel(
      () => { barrier.await()
        Versioned.commit(spark, dir, rows(100, 110, "odd")); () },
      () => { barrier.await()
        Versioned.commitReplace(spark, dir, rows(0, 10, "even2"),
          keyCols = Seq("id"), baseVersion = Some(0)); () })
    assert(Versioned.latestVersion(spark, dir).contains(2))
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    val want = ((0 until 10).map(i => (i.toLong, "even2")) ++
      (100 until 110).map(i => (i.toLong, "odd"))).toSet
    assert(got == want)
  }

  test("racing append × restore: both land, the append linearizes " +
      "after the restore whoever wins the version race") {
    val dir = tmpDir() + "/race-restore"
    Versioned.commit(spark, dir, rows(0, 10, "good"))          // v0
    Versioned.commitReplace(spark, dir, rows(500, 501, "bad"),
      keyCols = Seq("id"))                                     // v1: oops
    val barrier = new CyclicBarrier(2)
    inParallel(
      () => { barrier.await()
        Versioned.commit(spark, dir, rows(100, 110, "new")); () },
      () => { barrier.await()
        Versioned.restore(spark, dir, 0); () })
    assert(Versioned.latestVersion(spark, dir).contains(3))
    // the bad row is gone, the good rows are back, the concurrent
    // append's rows survive — as if the append happened after the undo
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    val want = ((0 until 10).map(i => (i.toLong, "good")) ++
      (100 until 110).map(i => (i.toLong, "new"))).toSet
    assert(got == want)
  }

  test("restore racing a replace: exactly one full-table authority " +
      "wins; the loser throws the typed conflict") {
    val dir = tmpDir() + "/race-restore-replace"
    Versioned.commit(spark, dir, rows(0, 10, "v0"))            // v0
    Versioned.commit(spark, dir, rows(10, 20, "v1"))           // v1
    val barrier = new CyclicBarrier(2)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    inParallel(
      () => { barrier.await()
        try { Versioned.restore(spark, dir, 0); () }
        catch { case _: CommitConflictException =>
          conflicts.incrementAndGet(); () } },
      () => { barrier.await()
        try { Versioned.commitReplace(spark, dir, rows(900, 905, "re"),
          keyCols = Seq("id")); () }
        catch { case _: CommitConflictException =>
          conflicts.incrementAndGet(); () } })
    // a true interleave conflicts exactly one side (both claimed
    // full-table authority); a serial schedule lets both land, the
    // second simply rewriting the first's head. Either way the final
    // table is ONE writer's coherent full state — never a silent
    // hybrid of half a restore and half a replace
    assert(conflicts.get() <= 1)
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    val restored = (0 until 10).map(i => (i.toLong, "v0")).toSet
    val replaced = (900 until 905).map(i => (i.toLong, "re")).toSet
    assert(got == restored || got == replaced)
  }

  test("addCheck racing a violating append: exactly one wins — the " +
      "append is validated by the declaration or rejected by it, " +
      "never admitted past it") {
    val dir = tmpDir() + "/race-check"
    Versioned.commit(spark, dir, rows(0, 10, "ok"))            // v0
    val barrier = new CyclicBarrier(2)
    var appendErr: Option[Throwable] = None
    var checkErr: Option[Throwable] = None
    inParallel(
      () => { barrier.await()
        try { Versioned.commit(spark, dir,
          Seq((-1L, "neg")).toDF("id", "s")); () }
        catch { case t: Versioned.CheckViolationException =>
          appendErr = Some(t); () } },
      () => { barrier.await()
        try { Versioned.addCheck(spark, dir, "id_pos", "id >= 0"); () }
        catch { case t: Versioned.CheckViolationException =>
          checkErr = Some(t); () } })
    val negIn = Versioned.read(spark, dir).filter($"id" < 0).count() > 0
    val checkOn = Versioned.checks(spark, dir).nonEmpty
    // coherent outcomes only: the violating row is in and the check
    // failed to install (append won the race), or the check is on and
    // the row was rejected (declaration won) — NEVER both, which
    // would be a constrained table carrying a violating row
    assert(negIn != checkOn,
      s"incoherent: negIn=$negIn checkOn=$checkOn " +
        s"appendErr=$appendErr checkErr=$checkErr")
    if (negIn) assert(checkErr.isDefined && appendErr.isEmpty)
    else assert(appendErr.isDefined && checkErr.isEmpty)
  }

  test("pinned reader survives expire; unpin releases retention") {
    val dir = tmpDir() + "/pins"
    Versioned.commit(spark, dir, rows(0, 10, "v0"))
    val pin = Versioned.pin(spark, dir)            // pins v0
    Versioned.commit(spark, dir, rows(10, 20, "v1"))
    Versioned.commit(spark, dir, rows(20, 30, "v2"), replace = true)
    // retention wants to keep only v2, but the pin outranks it
    val (d1, f1) = Versioned.expire(spark, dir, keepLast = 1)
    assert(d1 == 0 && f1 == 0)
    assert(Versioned.read(spark, dir, Some(pin.version)).count() == 10)
    Versioned.unpin(spark, dir, pin)
    val (d2, f2) = Versioned.expire(spark, dir, keepLast = 1)
    assert(d2 == 2 && f2 > 0)
    intercept[Exception] { Versioned.read(spark, dir, Some(0)).count() }
    assert(Versioned.read(spark, dir).count() == 10)
  }

  test("withPinnedRead: the pin is released on success AND on failure, " +
      "and holds retention off for the duration") {
    val dir = tmpDir() + "/pin-bracket"
    Versioned.commit(spark, dir, rows(0, 10, "v0"))
    Versioned.commit(spark, dir, rows(10, 20, "v1"), replace = true)
    val n = Versioned.withPinnedRead(spark, dir, Some(0)) { v0 =>
      // retention inside the bracket cannot drop the pinned v0
      val (d, _) = Versioned.expire(spark, dir, keepLast = 1)
      assert(d == 0)
      v0.count()
    }
    assert(n == 10L)
    // pin released on exit: retention proceeds
    assert(Versioned.expire(spark, dir, keepLast = 1)._1 == 1)
    // failure path: the pin must not leak a permanent retention floor
    Versioned.commit(spark, dir, rows(20, 30, "v2"))
    intercept[RuntimeException] {
      Versioned.withPinnedRead(spark, dir) { _ =>
        throw new RuntimeException("reader died")
      }
    }
    assert(Versioned.expire(spark, dir, keepLast = 1)._1 == 1)
  }

  test("expire-during-read: a reader that pins mid-retention either " +
      "pins safely or fails loudly — never reads a half-deleted version") {
    val dir = tmpDir() + "/pin-race"
    Versioned.commit(spark, dir, rows(0, 10, "v0"))
    Versioned.commit(spark, dir, rows(10, 20, "v1"))
    val started = new CountDownLatch(1)
    @volatile var pinned: Option[Versioned.ReadPin] = None
    @volatile var pinErr: Option[Throwable] = None
    inParallel(
      () => { started.countDown()
        Versioned.expire(spark, dir, keepLast = 1); () },
      () => { started.await()
        try pinned = Some(Versioned.pin(spark, dir, Some(0)))
        catch { case t: IllegalArgumentException => pinErr = Some(t) } })
    pinned match {
      case Some(p) =>   // pin won the lock first: v0 must be fully readable
        assert(Versioned.read(spark, dir, Some(p.version)).count() == 10)
        Versioned.unpin(spark, dir, p)
      case None =>      // expire won: the pin failed loudly, v0 is gone
        assert(pinErr.isDefined)
    }
  }

  test("expire grace window: never-referenced staging files survive " +
      "until the grace age, dropped-manifest files go immediately") {
    val dir = tmpDir() + "/grace"
    Versioned.commit(spark, dir, rows(0, 10, "v0"))
    Versioned.commit(spark, dir, rows(10, 20, "v1"), replace = true)
    // simulate a concurrent writer's in-flight staging: a parquet file
    // in a commit dir that no manifest references yet
    val staged = new java.io.File(s"$dir/data/c-inflight")
    rows(900, 905, "staged").coalesce(1).write.parquet(staged.toString)
    val (_, del1) = Versioned.expire(spark, dir, keepLast = 1)
    assert(del1 > 0)  // v0's files: referenced by the dropped manifest
    assert(staged.listFiles().exists(_.getName.endsWith(".parquet")),
      "in-flight staging was collected inside the grace window")
    val (_, del2) = Versioned.expire(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
    assert(del2 > 0 && !staged.exists())  // grace elapsed -> collected
    assert(Versioned.read(spark, dir).count() == 10)
  }

  test("compactCommit: files shrink, bytes preserved, pre-compaction " +
      "version still readable; racing append merges in") {
    val dir = tmpDir() + "/compact"
    Versioned.commit(spark, dir, rows(0, 200, "x").repartition(8))   // v0
    Versioned.commit(spark, dir, rows(200, 400, "y").repartition(8)) // v1
    val before = Versioned.read(spark, dir).inputFiles.length
    assert(before >= 16)
    val barrier = new CyclicBarrier(2)
    inParallel(
      () => { barrier.await()
        Versioned.compactCommit(spark, dir, targetBytes = 1L << 30); () },
      () => { barrier.await()
        Versioned.commit(spark, dir, rows(400, 410, "z")); () })
    assert(Versioned.latestVersion(spark, dir).contains(3))
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    val want = ((0 until 200).map(i => (i.toLong, "x")) ++
      (200 until 400).map(i => (i.toLong, "y")) ++
      (400 until 410).map(i => (i.toLong, "z"))).toSet
    assert(got == want)
    // the compacted layout really is smaller than the 16 input files
    // (+ the racer's appended files at most)
    assert(Versioned.read(spark, dir).inputFiles.length < before)
    // time travel: v1 (pre-compaction) still reads its original state
    assert(Versioned.read(spark, dir, Some(1)).count() == 400)
  }

  test("compactCommit inherits the base version's stats column: " +
      "readPruned still file-skips after the rewrite") {
    val dir = tmpDir() + "/compact-stats"
    // three range-clustered stats commits -> 3 prunable files
    Versioned.commitWithStats(spark, dir,
      rows(0, 100, "a").coalesce(1), "id")
    Versioned.commitWithStats(spark, dir,
      rows(100, 200, "b").coalesce(1), "id")
    Versioned.commitWithStats(spark, dir,
      rows(200, 300, "c").coalesce(1), "id")
    assert(Versioned.readPruned(spark, dir, "id", 150, 160)
      .inputFiles.length == 1)
    // compact 3 -> 1; the inherited stats column must be re-recorded
    // on the rewritten file, so a selective read still prunes (here:
    // one file total, and a disjoint range plans ZERO files)
    Versioned.compactCommit(spark, dir, targetBytes = 1L << 30)
    val hit = Versioned.readPruned(spark, dir, "id", 150, 160)
    assert(hit.inputFiles.length == 1)
    assert(hit.count() == 11)
    assert(Versioned.readPruned(spark, dir, "id", 5000, 6000)
      .inputFiles.isEmpty)
  }

  test("clustered compactCommit: an append-ordered history whose stat " +
      "ranges all overlap re-clusters into range-disjoint files and " +
      "readPruned plans O(matching files)") {
    val dir = tmpDir() + "/compact-cluster"
    // four appends, one file each, EVERY file spanning the whole key
    // range (round-robin ids) — the worst case for data skipping: all
    // stat ranges overlap [i, 28+i], pruning can skip nothing
    (0 until 4).foreach { i =>
      val ids = (0 until 32).filter(_ % 4 == i)
      Versioned.commitWithStats(spark, dir,
        ids.map(id => (id.toLong, s"w$i")).toDF("id", "s")
          .repartition(1), "id")
    }
    assert(Versioned.readPruned(spark, dir, "id", 0L, 3L)
      .inputFiles.length == 4)            // every file overlaps [0, 3]
    // clustered rewrite: same bytes, but each output file now owns a
    // disjoint id range and records tight min/max
    Versioned.compactCommit(spark, dir, targetBytes = 1L,
      clusterBy = Seq("id"))
    val after = Versioned.readPruned(spark, dir, "id", 0L, 3L)
    assert(after.inputFiles.length < 4,
      s"clustering should shrink the planned file set, still " +
        s"${after.inputFiles.length}")
    assert(after.select("id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
    // nothing lost, history intact: head and the pre-cluster version
    // both hold the full table
    assert(Versioned.read(spark, dir).count() == 32)
    assert(Versioned.read(spark, dir, Some(3)).count() == 32)
  }

  test("multi-column stats: readPruned skips files on EITHER recorded " +
      "column, and compaction re-measures every tracked column") {
    val dir = tmpDir() + "/multi-stats"
    // three single-file commits, disjoint in BOTH id and w
    (0 until 3).foreach { k =>
      val df = (k * 100 until (k + 1) * 100)
        .map(i => (i.toLong, k.toLong)).toDF("id", "w").repartition(1)
      Versioned.commitWithStats(spark, dir, df, Seq("id", "w"),
        replace = false)
    }
    assert(Versioned.readPruned(spark, dir, "id", 150, 160)
      .inputFiles.length == 1)
    val byW = Versioned.readPruned(spark, dir, "w", 1, 1)
    assert(byW.inputFiles.length == 1)
    assert(byW.count() == 100)
    // a column with no recorded stats is never pruned (still correct)
    assert(Versioned.readPruned(spark, dir, "id", 5000, 6000)
      .inputFiles.isEmpty)
    // compaction (3 files -> 1) re-records BOTH columns on the rewrite
    Versioned.compactCommit(spark, dir, targetBytes = 1L << 30)
    assert(Versioned.readPruned(spark, dir, "w", 1, 1).count() == 100)
    assert(Versioned.readPruned(spark, dir, "w", 50, 60)
      .inputFiles.isEmpty)
    assert(Versioned.readPruned(spark, dir, "id", 5000, 6000)
      .inputFiles.isEmpty)
  }

  test("z-ordered compaction prunes on EITHER dimension where " +
      "lexicographic clustering prunes only the leading key") {
    val dir = tmpDir() + "/compact-z"
    val grid = (for { x <- 0 until 8; y <- 0 until 8 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    Versioned.commitWithStats(spark, dir, grid.repartition(4),
      Seq("x", "y"), replace = false)
    // lexicographic (x, y): four x-slab files, each carrying EVERY y —
    // a y-only predicate cannot skip a single file
    Versioned.compactCommit(spark, dir, targetBytes = 1L,
      clusterBy = Seq("x", "y"))
    assert(Versioned.readPruned(spark, dir, "x", 0, 1)
      .inputFiles.length < 4)                       // leading key: tight
    val lexY = Versioned.readPruned(spark, dir, "y", 0, 1)
    assert(lexY.inputFiles.length == 4)             // trailing: useless
    assert(lexY.count() == 16)
    // z-order: every file owns a compact region of the (x, y) plane,
    // so BOTH dimensions prune
    Versioned.compactCommit(spark, dir, targetBytes = 1L,
      clusterBy = Seq("x", "y"), zOrder = true)
    val zy = Versioned.readPruned(spark, dir, "y", 0, 1)
    val zx = Versioned.readPruned(spark, dir, "x", 0, 1)
    assert(zy.inputFiles.length < 4,
      s"y-pruning should skip z-ordered files, planned ${zy.inputFiles.length}")
    assert(zx.inputFiles.length < 4)
    assert(zy.count() == 16 && zx.count() == 16)    // pruning, not loss
    assert(Versioned.read(spark, dir).count() == 64)
  }
}
