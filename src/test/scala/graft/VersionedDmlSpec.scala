package graft

import org.apache.spark.sql.functions._

import graft.lake.Versioned
import graft.lake.Versioned.{CheckViolationException, CommitConflictException}

/** Row-level DML on the versioned lake ([[Versioned.deleteWhere]] /
  * [[Versioned.mergeInto]]): copy-on-write file rewrites that must touch
  * ONLY the files containing matched rows — every other manifest line
  * republishes verbatim, stats included. The spec pins four layers:
  * the stat-range pruner's interval logic, the delete/upsert row
  * semantics (NULL predicate keeps; NULL key inserts), the file-level
  * copy-on-write contract (asserted against the raw manifest text), and
  * the concurrency protocol (interleaved appends carry, interleaved
  * replaces and key-overlapping appends conflict).
  */
class VersionedDmlSpec extends SparkSuite {
  import spark.implicits._

  private def manifestLines(dir: String, v: Int): Seq[String] =
    Versioned.manifestDataLines(spark, dir, v)

  /** 40 rows in 4 range-clustered files: ids [0,10), [10,20), … with
    * per-file id stats recorded — the fixture every pruning test uses. */
  private def rangedTable(dir: String): Unit = {
    val df = (0L until 40L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
    Versioned.commitWithStats(spark, dir, df, "id")
    assert(manifestLines(dir, 0).size == 4, "fixture wants 4 data files")
  }

  test("statsCanMatch: sound interval logic, conservative elsewhere") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("other", LongType), StructField("s", StringType)))
    val st = Seq(Versioned.StatGroup("id", 10L, 19L, None))
    def can(c: org.apache.spark.sql.Column) =
      Versioned.statsCanMatch(
        Versioned.resolvedPredicate(spark, schema, c), st)
    assert(can(col("id") === 15) && !can(col("id") === 9) &&
      !can(col("id") === 20))
    assert(can(col("id") < 11) && !can(col("id") < 10))
    assert(can(col("id") <= 10) && !can(col("id") <= 9))
    assert(can(col("id") > 18) && !can(col("id") > 19))
    assert(can(col("id") >= 19) && !can(col("id") >= 20))
    assert(can(lit(5) < col("id")) && !can(lit(19) < col("id")))
    // And needs both sides possible; Or either
    assert(!can(col("id") > 5 && col("id") < 8))
    assert(can(col("id") > 5 && col("id") < 12))
    assert(can(col("id") < 5 || col("id") > 15))
    assert(!can(col("id") < 5 || col("id") > 25))
    assert(can(col("id").isin(1, 15)) && !can(col("id").isin(1, 25)))
    assert(can(col("id") <=> 12) && !can(col("id") <=> 9))
    // unknowns stay candidates: untracked column, string literal,
    // IsNull, Not (ranges prove possibility, not impossibility)
    assert(can(col("other") === 99))
    assert(can(col("id") === "x"))
    assert(can(col("id").isNull))
    assert(can(!(col("id") === 15)))
    // sentinel (all-NULL / zero-row file) prunes on any comparison
    val sentinel =
      Seq(Versioned.StatGroup("id", Long.MaxValue, Long.MinValue, None))
    def canS(c: org.apache.spark.sql.Column) =
      Versioned.statsCanMatch(
        Versioned.resolvedPredicate(spark, schema, c), sentinel)
    assert(!canS(col("id") === 15))
    assert(canS(col("id").isNull))
  }

  test("deleteWhere rewrites only the files holding matches; every " +
      "other manifest line carries verbatim, stats included") {
    val dir = tmpDir() + "/del-cow"
    rangedTable(dir)
    val before = manifestLines(dir, 0)
    // ids 12..17 live entirely in file [10,20): stat-pruning must rule
    // the other three files out before any scan
    val pred = col("id").between(12, 17)
    val cand = Versioned.pruneCandidates(
      Versioned.resolvedPredicate(spark,
        Versioned.read(spark, dir).schema, pred),
      manifestLines(dir, 0))
    assert(cand.size == 1, s"expected 1 stat-candidate file, got $cand")
    val v = Versioned.deleteWhere(spark, dir, pred)
    assert(v == 1)
    val after = manifestLines(dir, 1)
    // three of four base lines carried byte-identical
    assert(before.toSet.intersect(after.toSet).size == 3)
    assert(!after.contains(before.toSet.diff(after.toSet).head))
    val got = Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted
    assert(got.toSeq == (0L until 40L).filterNot(i => i >= 12 && i <= 17))
    // the rewrite re-measured the inherited id stats (line carries them)
    val rewritten = after.filterNot(before.contains)
    assert(rewritten.nonEmpty && rewritten.forall(_.contains("\tid\t")))
  }

  test("deleteWhere: NULL predicate keeps its row (SQL DELETE deletes " +
      "only WHERE-TRUE rows)") {
    val dir = tmpDir() + "/del-null"
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
      .toDF("id", "v")
    Versioned.commit(spark, dir, df)
    Versioned.deleteWhere(spark, dir, col("v") > 10)
    val got = Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted
    assert(got.toSeq == Seq(1L, 2L)) // NULL v survives
  }

  test("deleteWhere: a provably-unmatched predicate is a NO-OP — no " +
      "commit, no scan candidates, head version unchanged") {
    val dir = tmpDir() + "/del-noop"
    rangedTable(dir)
    assert(Versioned.pruneCandidates(
      Versioned.resolvedPredicate(spark,
        Versioned.read(spark, dir).schema, col("id") > 100),
      manifestLines(dir, 0)).isEmpty)
    assert(Versioned.deleteWhere(spark, dir, col("id") > 100) == 0)
    // matching no rows despite surviving pruning (predicate on an
    // untracked column) is also a no-op, after the refinement scan
    assert(Versioned.deleteWhere(spark, dir, col("s") === "nope") == 0)
    assert(Versioned.latestVersion(spark, dir).contains(0))
  }

  test("deleteWhere feeds changesBetween exactly the deleted rows") {
    val dir = tmpDir() + "/del-cdc"
    rangedTable(dir)
    Versioned.deleteWhere(spark, dir, col("id").between(12, 17))
    val feed = Versioned.changesBetween(spark, dir, 0, 1, Seq("id"))
    val evs = feed.select("_change_type", "id").as[(String, Long)]
      .collect().sorted
    assert(evs.toSeq == (12L to 17L).map(("delete", _)))
  }

  test("deleteWhere as-of-base: an interleaved append carries — even " +
      "rows the predicate would have selected (delete-then-append " +
      "serialization); an interleaved replace conflicts") {
    val dir = tmpDir() + "/del-race"
    Versioned.commit(spark, dir,
      (0L until 10L).map(i => (i, "A")).toDF("id", "s"))        // v0
    Versioned.commit(spark, dir,
      (0L until 5L).map(i => (i, "B")).toDF("id", "s"))         // v1 append
    val v = Versioned.deleteWhere(spark, dir, col("id") < 5,
      baseVersion = Some(0))
    assert(v == 2)
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    assert(got == ((5L until 10L).map((_, "A")) ++
      (0L until 5L).map((_, "B"))).toSet)
    // interleaved replace: both writers claimed the base files
    Versioned.commit(spark, dir,
      Seq((99L, "Z")).toDF("id", "s"), replace = true)          // v3
    intercept[CommitConflictException] {
      Versioned.deleteWhere(spark, dir, col("id") >= 0,
        baseVersion = Some(2))
    }
  }

  test("updateWhere rewrites only matched files, applies assignments " +
      "to WHERE-TRUE rows only, and feeds CDC update pairs") {
    val dir = tmpDir() + "/upd-cow"
    rangedTable(dir)
    val before = manifestLines(dir, 0)
    val v = Versioned.updateWhere(spark, dir,
      col("id").between(12, 14), Map("s" -> concat(col("s"), lit("!"))))
    assert(v == 1)
    assert(before.toSet.intersect(manifestLines(dir, 1).toSet).size == 3)
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toMap
    assert(got.size == 40)
    assert(got(12L) == "row12!" && got(14L) == "row14!")
    assert(got(11L) == "row11" && got(15L) == "row15") // same file, unhit
    val feed = Versioned.changesBetween(spark, dir, 0, 1, Seq("id"))
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(feed == Map("update_preimage" -> 3L, "update_postimage" -> 3L))
    // NULL predicate passes through untouched
    val dir2 = tmpDir() + "/upd-null"
    Versioned.commit(spark, dir2,
      Seq((1L, Some(5L)), (2L, None)).toDF("id", "v"))
    Versioned.updateWhere(spark, dir2, col("v") < 10,
      Map("v" -> (col("v") + 100)))
    assert(Versioned.read(spark, dir2).as[(Long, Option[Long])]
      .collect().toMap == Map(1L -> Some(105L), 2L -> None))
  }

  test("updateWhere guards: CHECK constraints re-validate the rewrite; " +
      "assigning a new column is rejected; no-match is a no-op") {
    val dir = tmpDir() + "/upd-guard"
    Versioned.commit(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    Versioned.addCheck(spark, dir, "v_pos", "v > 0") // v1
    intercept[CheckViolationException] {
      Versioned.updateWhere(spark, dir, col("id") === 1,
        Map("v" -> lit(-1L)))
    }
    intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, dir, col("id") === 1,
        Map("brand_new" -> lit(1L)))
    }
    assert(Versioned.updateWhere(spark, dir, col("id") === 99,
      Map("v" -> lit(0L))) == 1) // no-match: head (v1) unchanged
    assert(Versioned.read(spark, dir).as[(Long, Long)].collect().toMap ==
      Map(1L -> 10L, 2L -> 20L))
  }

  test("mergeInto: updates replace matched keys, inserts append, " +
      "untouched files carry verbatim, CDC reads update pairs + inserts") {
    val dir = tmpDir() + "/merge-cow"
    rangedTable(dir)
    val before = manifestLines(dir, 0)
    // keys 12..14 update (file [10,20) only), keys 100..101 insert
    val src = (Seq((12L, "u12"), (13L, "u13"), (14L, "u14"),
      (100L, "n100"), (101L, "n101"))).toDF("id", "s")
    val v = Versioned.mergeInto(spark, dir, src, Seq("id"))
    assert(v == 1)
    val after = manifestLines(dir, 1)
    assert(before.toSet.intersect(after.toSet).size == 3,
      "only the matched file may be rewritten")
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toMap
    assert(got.size == 42)
    assert(got(12L) == "u12" && got(13L) == "u13" && got(14L) == "u14")
    assert(got(100L) == "n100" && got(101L) == "n101")
    assert(got(11L) == "row11" && got(0L) == "row0")
    val feed = Versioned.changesBetween(spark, dir, 0, 1, Seq("id"))
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(feed == Map("insert" -> 2L, "update_preimage" -> 3L,
      "update_postimage" -> 3L), s"unexpected feed mix: $feed")
  }

  test("mergeInto: NULL-keyed source rows match nothing and insert") {
    val dir = tmpDir() + "/merge-nullkey"
    Versioned.commit(spark, dir,
      Seq((Some(1L), "a"), (Some(2L), "b")).toDF("id", "s"))
    Versioned.mergeInto(spark, dir,
      Seq((Option.empty[Long], "nk"), (Some(2L), "B")).toDF("id", "s"),
      Seq("id"))
    val got = Versioned.read(spark, dir).as[(Option[Long], String)]
      .collect().toSet
    assert(got == Set((Some(1L), "a"), (Some(2L), "B"), (None, "nk")))
  }

  test("mergeInto evolves the schema: a source-only column joins the " +
      "table nullable; untouched historical rows null-fill") {
    val dir = tmpDir() + "/merge-evolve"
    Versioned.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    Versioned.mergeInto(spark, dir,
      Seq((2L, "B", 7L), (3L, "c", 9L)).toDF("id", "s", "extra"),
      Seq("id"))
    val got = Versioned.read(spark, dir)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "B", Some(7L)),
      (3L, "c", Some(9L))))
  }

  test("mergeInto concurrency: an interleaved append carries when its " +
      "keys are disjoint from the source, conflicts when they overlap") {
    val dir = tmpDir() + "/merge-race"
    Versioned.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    Versioned.commit(spark, dir, Seq((50L, "x")).toDF("id", "s")) // v1
    // disjoint: append carries, merge lands
    val v = Versioned.mergeInto(spark, dir,
      Seq((2L, "B2")).toDF("id", "s"), Seq("id"), baseVersion = Some(0))
    assert(v == 2)
    val got = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (50L, "x")))
    // overlap: the appended key IS a source key -> conflict
    Versioned.commit(spark, dir, Seq((60L, "y")).toDF("id", "s")) // v3
    intercept[CommitConflictException] {
      Versioned.mergeInto(spark, dir,
        Seq((60L, "Y")).toDF("id", "s"), Seq("id"), baseVersion = Some(2))
    }
  }

  test("mergeInto rejects a key-duplicated source (SQL MERGE " +
      "cardinality rule) and validates CHECK constraints on the delta") {
    val dir = tmpDir() + "/merge-guard"
    Versioned.commit(spark, dir, Seq((1L, 10L)).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, dir,
        Seq((2L, 1L), (2L, 2L)).toDF("id", "v"), Seq("id"))
    }
    Versioned.addCheck(spark, dir, "v_pos", "v > 0")
    intercept[CheckViolationException] {
      Versioned.mergeInto(spark, dir,
        Seq((1L, -5L)).toDF("id", "v"), Seq("id"))
    }
    // nothing published by either rejected merge
    assert(Versioned.latestVersion(spark, dir).contains(1)) // v1 = addCheck
    assert(Versioned.read(spark, dir).as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L)))
  }

  test("statsMustMatchAll: ∀-proofs need a zero null count; sound " +
      "interval logic with the quantifier flipped; sentinel is vacuous") {
    import org.apache.spark.sql.types._
    import Versioned.StatGroup
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("other", LongType), StructField("s", StringType)))
    def must(c: org.apache.spark.sql.Column, g: Seq[StatGroup]) =
      Versioned.statsMustMatchAll(
        Versioned.resolvedPredicate(spark, schema, c), g)
    val clean = Seq(StatGroup("id", 10L, 19L, Some(0L)))
    // ∀ col < v needs max < v (the possibility prover needed min < v)
    assert(must(col("id") < 20, clean) && !must(col("id") < 19, clean))
    assert(must(col("id") <= 19, clean) && !must(col("id") <= 18, clean))
    assert(must(col("id") > 9, clean) && !must(col("id") > 10, clean))
    assert(must(col("id") >= 10, clean) && !must(col("id") >= 11, clean))
    assert(must(lit(20) > col("id"), clean) &&
      !must(lit(19) > col("id"), clean))
    // equality / In: provable only for a single-point file
    val point = Seq(StatGroup("id", 7L, 7L, Some(0L)))
    assert(must(col("id") === 7, point) && !must(col("id") === 7, clean))
    assert(must(col("id").isin(5, 7), point) &&
      !must(col("id").isin(5, 8), point))
    // And needs both ∀-sides; Or either
    assert(must(col("id") >= 10 && col("id") < 20, clean))
    assert(!must(col("id") >= 10 && col("id") < 15, clean))
    assert(must(col("id") < 5 || col("id") > 5, clean))
    assert(!must(col("id") < 5 || col("id") > 25, clean))
    // a possible NULL defeats every ∀-proof (SQL DELETE keeps NULL
    // rows); so does a pre-annotation line with no recorded count
    val nullish = Seq(StatGroup("id", 10L, 19L, Some(1L)))
    val legacy = Seq(StatGroup("id", 10L, 19L, None))
    assert(!must(col("id") < 20, nullish) && !must(col("id") < 20, legacy))
    // unknown shapes under-claim: untracked column, string literal,
    // IsNull, Not
    assert(!must(col("other") === 99, clean))
    assert(!must(col("id") === "x", clean))
    assert(!must(col("id").isNotNull, clean))
    assert(!must(!(col("id") === 50), clean))
    // zero-row sentinel with no nulls: vacuously all-matching
    val empty = Seq(StatGroup("id", Long.MaxValue, Long.MinValue, Some(0L)))
    assert(must(col("id") < 0, empty))
    // all-NULL sentinel (rows exist, all hidden): never provable
    val allNull = Seq(StatGroup("id", Long.MaxValue, Long.MinValue, Some(5L)))
    assert(!must(col("id") < 0, allNull))
  }

  test("timestamp stats: both provers require unit agreement — a " +
      "microsecond range never compares against a plain literal and " +
      "vice versa") {
    import org.apache.spark.sql.types._
    import Versioned.StatGroup
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("v", LongType)))
    def can(c: org.apache.spark.sql.Column, g: Seq[StatGroup]) =
      Versioned.statsCanMatch(
        Versioned.resolvedPredicate(spark, schema, c), g)
    def must(c: org.apache.spark.sql.Column, g: Seq[StatGroup]) =
      Versioned.statsMustMatchAll(
        Versioned.resolvedPredicate(spark, schema, c), g)
    def tsLit(epochSec: Long) = lit(java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(epochSec)))
    // file covering [100 s, 200 s], recorded in MICROSECONDS + ~u
    val micros = Seq(
      StatGroup("ts", 100_000_000L, 200_000_000L, Some(0L), micros = true))
    // matching units: exact interval logic in microseconds
    assert(can(col("ts") < tsLit(150), micros))
    assert(!can(col("ts") < tsLit(100), micros))
    assert(can(col("ts") === tsLit(200), micros))
    assert(!can(col("ts") === tsLit(201), micros))
    assert(must(col("ts") < tsLit(201), micros))
    assert(!must(col("ts") < tsLit(200), micros))
    // the round-11 corruption shape: the same range recorded as plain
    // SECONDS (no ~u — a pre-fix manifest line) against a microsecond
    // timestamp literal. ∃-prover keeps the file (conservative: the
    // old behavior pruned reads wrongly); ∀-prover must NOT "prove"
    // the match that dropped post-cutoff rows.
    val secs = Seq(StatGroup("ts", 100L, 200L, Some(0L)))
    assert(can(col("ts") < tsLit(150), secs))
    assert(can(col("ts") > tsLit(10_000), secs)) // old code pruned this
    assert(!must(col("ts") < tsLit(10_000), secs)) // old code "proved" it
    // plain literal against a microsecond range: same conservatism
    assert(can(col("v") === 5, micros.map(_.copy(col = "v"))))
    assert(!must(col("v") < 1_000_000_000L, micros.map(_.copy(col = "v"))))
  }

  test("timestamp statCol: retention delete on ts < cutoff is " +
      "metadata-only, prunes in microseconds, and keeps every " +
      "post-cutoff row") {
    val dir = tmpDir() + "/del-ts"
    // 40 rows, ts = id hours since epoch, 4 range-clustered files of
    // 10 ids each with per-file ts stats recorded (in microseconds)
    val df = spark.range(40)
      .select(col("id"), timestamp_seconds(col("id") * 3600).as("ts"))
      .repartitionByRange(4, col("ts"))
    Versioned.commitWithStats(spark, dir, df, "ts")
    val before = manifestLines(dir, 0)
    assert(before.size == 4 && before.forall(_.contains("\t~u")),
      s"expected 4 files with ~u-annotated ts stats: $before")
    // cutoff = 10 h: file [0,10) is wholly before it, file [10,20)
    // starts exactly AT it (10 h < 10 h is false — must survive)
    val cutoff = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(10L * 3600))
    val pred = col("ts") < lit(cutoff)
    val resolved = Versioned.resolvedPredicate(spark,
      Versioned.read(spark, dir).schema, pred)
    assert(Versioned.pruneCandidates(resolved, before).size == 1,
      "microsecond interval logic must rule out the three later files")
    assert(Versioned.dropCandidates(resolved, before).size == 1,
      "the first file must PROVE an all-rows match (metadata-only drop)")
    val v = Versioned.deleteWhere(spark, dir, pred)
    assert(v == 1)
    val after = manifestLines(dir, 1)
    assert(after.toSet.subsetOf(before.toSet) && after.size == 3,
      "retention delete must be a pure manifest-subset commit")
    val got = Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted
    assert(got.toSeq == (10L until 40L),
      "every row at or after the cutoff must survive")
  }

  test("mergeInto on a timestamp key: recorded microsecond stats " +
      "prune files correctly and the upsert stays exact") {
    val dir = tmpDir() + "/merge-ts"
    val base = spark.range(20)
      .select(timestamp_seconds(col("id") * 3600).as("k"),
        (col("id") * 10).as("v"))
      .repartitionByRange(2, col("k"))
    Versioned.commitWithStats(spark, dir, base, "k")
    // source updates k = 5 h and inserts k = 100 h: only the first
    // file's range [0 h, 10 h) can hold the match
    val src = Seq((5L * 3600, 999L), (100L * 3600, 1000L))
      .toDF("sec", "v")
      .select(timestamp_seconds(col("sec")).as("k"), col("v"))
    val v = Versioned.mergeInto(spark, dir, src, Seq("k"),
      statCol = Some("k"))
    assert(v == 1)
    val got = Versioned.read(spark, dir)
      .select(unix_timestamp(col("k")).as("sec"), col("v"))
      .as[(Long, Long)].collect().toMap
    assert(got(5L * 3600) == 999L, "matched key must update")
    assert(got(100L * 3600) == 1000L, "unmatched key must insert")
    assert(got.size == 21)
    // the untouched file [10 h, 20 h) carried verbatim — the stat
    // prune understood the microsecond unit instead of comparing the
    // source's second-cast range against it
    val before = manifestLines(dir, 0)
    val after = manifestLines(dir, 1)
    assert(before.toSet.intersect(after.toSet).size == 1,
      "exactly one base file (the unmatched range) must carry verbatim")
  }

  test("deleteWhere metadata-only fast path: a file whose stats prove " +
      "an all-rows match drops from the manifest with zero scan and " +
      "zero staged files") {
    val dir = tmpDir() + "/del-meta"
    rangedTable(dir)
    val before = manifestLines(dir, 0)
    // ids < 10 are exactly file [0,10): the commit is PURE METADATA —
    // the new manifest is a strict subset of the old, no staging dir
    val v = Versioned.deleteWhere(spark, dir, col("id") < 10)
    assert(v == 1)
    val after = manifestLines(dir, 1)
    assert(after.toSet.subsetOf(before.toSet),
      "metadata-only delete staged new files")
    assert(after.size == 3 && before.size == 4)
    val got = Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted
    assert(got.toSeq == (10L until 40L))
    // the change feed still reports the dropped file's rows as deletes
    val feed = Versioned.changesBetween(spark, dir, 0, 1, Seq("id"))
      .select("_change_type", "id").as[(String, Long)].collect().sorted
    assert(feed.toSeq == (0L until 10L).map(("delete", _)))
  }

  test("deleteWhere mixes metadata drops with copy-on-write rewrites: " +
      "wholly-matched files drop, partially-matched files rewrite, the " +
      "rest carries verbatim") {
    val dir = tmpDir() + "/del-mixed"
    rangedTable(dir)
    val before = manifestLines(dir, 0)
    val v = Versioned.deleteWhere(spark, dir, col("id") < 15)
    assert(v == 1)
    val after = manifestLines(dir, 1)
    // files [20,30) and [30,40) carry verbatim; [0,10) dropped without
    // a rewrite; [10,20) rewrote to its surviving half
    assert(before.toSet.intersect(after.toSet).size == 2)
    val staged = after.filterNot(before.contains)
    assert(staged.size == 1 && staged.head.contains("\tid\t"),
      s"expected exactly one re-measured rewrite, got $staged")
    assert(Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == (15L until 40L))
  }

  test("deleteWhere fast path never fires on a file that can hide a " +
      "NULL: the recorded null count routes it through the rewrite") {
    val dir = tmpDir() + "/del-meta-null"
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    Versioned.commitWithStats(spark, dir,
      df.coalesce(1), "id")
    val before = manifestLines(dir, 0)
    assert(before.size == 1 && before.head.contains("~n1"),
      s"fixture wants one file recording one NULL: $before")
    // stats say [1,3] ⊆ (< 100) — but the NULL row must survive, so
    // the file must NOT drop wholesale
    val v = Versioned.deleteWhere(spark, dir, col("id") < 100)
    assert(v == 1)
    val after = manifestLines(dir, 1)
    assert(after.size == 1 && !before.contains(after.head),
      "expected a rewrite (not a metadata drop, not a carry)")
    assert(Versioned.read(spark, dir).select("id")
      .as[Option[Long]].collect().toSeq == Seq(None))
  }

  test("deleteWhere metadata drop composes with deletion vectors: a " +
      "DV'd file drops wholesale and only its VISIBLE rows feed") {
    val dir = tmpDir() + "/del-meta-dv"
    rangedTable(dir)
    // MoR-delete id=3 first (a DV on file [0,10)), then drop the file
    assert(Versioned.deleteWhereMor(spark, dir, col("id") === 3) == 1)
    val v = Versioned.deleteWhere(spark, dir, col("id") < 10)
    assert(v == 2)
    assert(manifestLines(dir, 2).size == 3)
    assert(Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == (10L until 40L))
    // id=3 fed as a delete at the MoR commit; the metadata drop feeds
    // the remaining nine — never a double delete
    val feed = Versioned.changesBetween(spark, dir, 1, 2, Seq("id"))
      .select("_change_type", "id").as[(String, Long)].collect().sorted
    assert(feed.toSeq ==
      (0L until 10L).filterNot(_ == 3L).map(("delete", _)))
  }

  test("rowCountFromMetadata: COUNT(*) from the manifest alone — DML " +
      "re-measures it, DV positions subtract, time travel counts each " +
      "version, untracked lines force the all-or-nothing fallback") {
    val dir = tmpDir() + "/meta-count"
    rangedTable(dir)
    assert(Versioned.rowCountFromMetadata(spark, dir) == Some(40L))
    // copy-on-write rewrite re-measures the rewritten file's count
    Versioned.deleteWhere(spark, dir, col("id").between(12, 17))  // v1
    assert(Versioned.rowCountFromMetadata(spark, dir) == Some(34L))
    // metadata-only drop subtracts the whole file
    Versioned.deleteWhere(spark, dir, col("id") < 10)             // v2
    assert(Versioned.rowCountFromMetadata(spark, dir) == Some(24L))
    // merge-on-read: base lines keep their counts; DV positions subtract
    Versioned.deleteWhereMor(spark, dir, col("id") % 2 === 0)     // v3
    assert(Versioned.rowCountFromMetadata(spark, dir) ==
      Some(Versioned.read(spark, dir).count()))
    // every version stays countable (time travel)
    assert(Versioned.rowCountFromMetadata(spark, dir, Some(0)) == Some(40L))
    assert(Versioned.rowCountFromMetadata(spark, dir, Some(2)) == Some(24L))
    // a plain append INHERITS the table's stat policy, so the
    // metadata count SURVIVES it (the round-13 contract: one
    // untracked writer must not kill COUNT(*) for every later version)
    Versioned.commit(spark, dir, Seq((99L, "x")).toDF("id", "s")) // v4
    assert(Versioned.rowCountFromMetadata(spark, dir) ==
      Some(Versioned.read(spark, dir).count()))
    // an append that omits EVERY tracked column cannot be measured —
    // that (and only that) poisons the metadata answer, because a
    // partial count would be a wrong count
    Versioned.commit(spark, dir, Seq("y").toDF("s"))              // v5
    assert(Versioned.rowCountFromMetadata(spark, dir).isEmpty)
    assert(Versioned.rowCountFromMetadata(spark, dir, Some(4)).isDefined,
      "older fully-tracked versions must stay countable")
  }

  test("history: one metadata-only row per version, newest first, " +
      "naming the commit primitive that created it") {
    val dir = tmpDir() + "/meta-history"
    rangedTable(dir)                                              // v0
    Versioned.commit(spark, dir, Seq((100L, "x")).toDF("id", "s")) // v1
    Versioned.deleteWhere(spark, dir, col("id").between(12, 14))  // v2
    Versioned.deleteWhereMor(spark, dir, col("id") === 20)        // v3
    Versioned.updateWhere(spark, dir, col("id") === 21,
      Map("s" -> lit("u")))                                       // v4
    Versioned.mergeInto(spark, dir,
      Seq((200L, "m")).toDF("id", "s"), Seq("id"))                // v5
    Versioned.addCheck(spark, dir, "id_ok", "id >= 0")            // v6
    Versioned.compactCommit(spark, dir)                           // v7
    Versioned.restore(spark, dir, 5)                              // v8
    val h = Versioned.history(spark, dir)
      .select("version", "operation").as[(Int, String)].collect().toSeq
    assert(h == Seq((8, "restore(v5)"), (7, "compact"),
      (6, "add-check(id_ok)"), (5, "merge"), (4, "update"),
      (3, "delete-mor"), (2, "delete"), (1, "append"), (0, "append")),
      s"unexpected history: $h")
    // shape columns: the MoR delete's version carries a DV; the base
    // row count renders only where it is a pure metadata read
    val byV = Versioned.history(spark, dir)
      .select("version", "n_dvs", "row_count")
      .as[(Int, Int, Option[Long])].collect().map(t => t._1 -> t).toMap
    assert(byV(3)._2 == 1 && byV(3)._3.isEmpty) // DV'd: count needs I/O
    assert(byV(0)._3 == Some(40L))
    assert(byV(1)._3 == Some(41L),
      "v1's plain append inherits the stat policy and stays countable")
  }

  test("mergeInto into nothing / into an empty version is a pure insert") {
    val dir = tmpDir() + "/merge-empty"
    val src = Seq((1L, "a")).toDF("id", "s")
    assert(Versioned.mergeInto(spark, dir, src, Seq("id")) == 0)
    assert(Versioned.read(spark, dir).count() == 1)
    val dir2 = tmpDir() + "/merge-empty2"
    Versioned.commit(spark, dir2,
      spark.emptyDataset[(Long, String)].toDF("id", "s"))
    assert(Versioned.mergeInto(spark, dir2, src, Seq("id")) == 1)
    assert(Versioned.read(spark, dir2).as[(Long, String)].collect()
      .toSeq == Seq((1L, "a")))
  }
}
