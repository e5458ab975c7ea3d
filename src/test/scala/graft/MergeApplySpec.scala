package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.Versioned
import graft.lake.Versioned._

/** General MERGE ([[Versioned.mergeApply]]): the full SQL clause
  * algebra — conditional matched UPDATE/DELETE, conditional NOT
  * MATCHED INSERT, NOT MATCHED BY SOURCE UPDATE/DELETE — with SQL
  * evaluation order (first true clause in each group wins), SQL
  * NULL semantics (NULL conditions don't apply; NULL keys match
  * nothing), the MERGE cardinality rule, and the copy-on-write scale
  * contract (only files holding an applied row rewrite; candidate
  * sets are group-scoped: source key range for MATCHED, clause
  * predicates for NOT MATCHED BY SOURCE). The SQL translation parity
  * (same clauses through `spark.sql` MERGE INTO) is pinned in
  * [[GraftCatalogSpec]].
  */
class MergeApplySpec extends SparkSuite {

  private def manifestLines(dir: String, v: Int): Seq[String] =
    Versioned.manifestDataLines(spark, dir, v)

  test("full clause algebra: conditional update, matched delete, " +
      "conditional insert, not-matched-by-source update and delete") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    // target: keys 0..9, value = key * 10
    Versioned.commitWithStats(s,
      dir, (0L until 10L).map(k => (k, k * 10.0)).toDF("k", "v"), "k")
    // source: keys 0..3 (matched) and 20..23 (unmatched)
    val src = Seq(
      (0L, 100.0),  // matched, s.v > t.v  -> UPDATE to 100
      (1L, 5.0),    // matched, s.v <= t.v -> DELETE
      (2L, 200.0),  // matched, s.v > t.v  -> UPDATE to 200
      (3L, 3.0),    // matched, s.v <= t.v -> DELETE
      (20L, 7.0),   // unmatched, even     -> INSERT
      (21L, 8.0),   // unmatched, odd      -> no clause, dropped
      (22L, 9.0)    // unmatched, even     -> INSERT
    ).toDF("k", "v")
    // targets without a source row: k 4..9
    //   k % 5 == 0 (5)            -> NMBS UPDATE v = -1
    //   else k % 2 == 0 (4,6,8)   -> NMBS DELETE
    //   else (7,9)                -> carry
    val v1 = Versioned.mergeApply(s, dir, src, Seq("k"), Seq(
      WhenMatchedUpdate(Some(col("__s.v") > col("v")),
        Map("v" -> col("__s.v"))),
      WhenMatchedDelete(None),
      WhenNotMatchedInsert(Some(col("__s.k") % 2 === 0),
        Map("k" -> col("__s.k"), "v" -> col("__s.v"))),
      WhenNotMatchedBySourceUpdate(Some(col("k") % 5 === 0),
        Map("v" -> lit(-1.0))),
      WhenNotMatchedBySourceDelete(Some(col("k") % 2 === 0))))
    assert(v1 == 1)
    val got = Versioned.read(s, dir).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq(
      0L -> 100.0, 2L -> 200.0,          // matched updates
      5L -> -1.0,                        // NMBS update (5%5==0)
      7L -> 70.0, 9L -> 90.0,            // carried
      20L -> 7.0, 22L -> 9.0))           // inserts
  }

  test("first true clause wins within a group (SQL evaluation order)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    Versioned.commitWithStats(s,
      dir, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), "k")
    val src = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    // both clauses match k=1 (v=10 > 5 and unconditional): the FIRST
    // applies; k=2 falls through to the second
    val v = Versioned.mergeApply(s, dir, src, Seq("k"), Seq(
      WhenMatchedUpdate(Some(col("v") > 15.0), Map("v" -> lit(111.0))),
      WhenMatchedUpdate(None, Map("v" -> lit(222.0)))))
    assert(v == 1)
    assert(Versioned.read(s, dir).orderBy("k")
      .as[(Long, Double)].collect().toSeq ==
      Seq(1L -> 222.0, 2L -> 111.0))
  }

  test("cardinality rule: duplicate source keys are rejected; " +
      "NULL source keys match nothing and flow to INSERT") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    Versioned.commitWithStats(s,
      dir, Seq((1L, 1.0)).toDF("k", "v"), "k")
    val dup = Seq((1L, 1.0), (1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      Versioned.mergeApply(s, dir, dup, Seq("k"), Seq(
        WhenMatchedUpdate(None, Map("v" -> col("__s.v"))))))
    assert(e.getMessage.contains("duplicate keys"))
    // NULL keys: match nothing (SQL equality), insert — and however
    // many there are, they are NOT a cardinality violation
    val nullKey = Seq((Option.empty[Long], 9.0),
      (Option.empty[Long], 8.0), (Some(1L), 5.0)).toDF("k", "v")
    val v = Versioned.mergeApply(s, dir, nullKey, Seq("k"), Seq(
      WhenMatchedUpdate(None, Map("v" -> col("__s.v"))),
      WhenNotMatchedInsert(None,
        Map("k" -> col("__s.k"), "v" -> col("__s.v")))))
    assert(v == 1)
    assert(Versioned.read(s, dir).orderBy(col("k").asc_nulls_first,
        col("v"))
      .as[(Option[Long], Double)].collect().toSeq ==
      Seq(None -> 8.0, None -> 9.0, Some(1L) -> 5.0))
    // key columns resolve case-insensitively against the source (the
    // SQL route admits ON t.k = s.K)
    val v2 = Versioned.mergeApply(s, dir,
      Seq((1L, 7.0)).toDF("K", "v"), Seq("k"), Seq(
        WhenMatchedUpdate(None, Map("v" -> col("__s.v")))))
    assert(v2 == 2)
    assert(Versioned.read(s, dir).filter(col("k") === 1L)
      .head().getDouble(1) == 7.0)
  }

  test("copy-on-write contract: files outside the source key range " +
      "and outside the NMBS predicates carry verbatim") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    // 4 range-clustered files over keys 0..99
    Versioned.commitWithStats(s, dir,
      (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "v")
        .repartitionByRange(4, col("k")), "k")
    val before = manifestLines(dir, 0)
    assert(before.size == 4)
    // source keys 0..9 (first file only); NMBS condition k >= 990
    // (no file) — so exactly ONE file can be touched
    val src = (0L until 10L).map(k => (k, -1.0)).toDF("k", "v")
    val v = Versioned.mergeApply(s, dir, src, Seq("k"), Seq(
      WhenMatchedUpdate(None, Map("v" -> col("__s.v"))),
      WhenNotMatchedBySourceUpdate(Some(col("k") >= 990L),
        Map("v" -> lit(0.0)))))
    assert(v == 1)
    val after = manifestLines(dir, 1)
    val carried = after.toSet.intersect(before.toSet)
    assert(carried.size == 3,
      s"expected 3 of 4 base files carried verbatim, got " +
        s"${carried.size}:\nbefore=$before\nafter=$after")
    // and the rows are right: keys 0..9 repriced, the rest untouched
    assert(Versioned.read(s, dir).filter(col("v") === -1.0).count()
      == 10)
    assert(Versioned.read(s, dir).count() == 100)
  }

  test("composite keys prune per-column: a two-key merge confined to " +
      "one file's range carries the other files verbatim") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    // 4 range-clustered files on k1; k2 is the second key component
    Versioned.commitWithStats(s, dir,
      (0L until 100L).map(k => (k, k % 10L, k * 1.0))
        .toDF("k1", "k2", "v")
        .repartitionByRange(4, col("k1")), "k1")
    val before = manifestLines(dir, 0)
    assert(before.size == 4)
    // source keys confined to k1 in 0..9 — the per-column bounding
    // box must rule out every other file even though k2 spans 0..9
    val src = (0L until 10L).map(k => (k, k % 10L, -1.0))
      .toDF("k1", "k2", "v")
    val v = Versioned.mergeApply(s, dir, src, Seq("k1", "k2"), Seq(
      WhenMatchedUpdate(None, Map("v" -> col("__s.v")))))
    assert(v == 1)
    val carried = manifestLines(dir, 1).toSet.intersect(before.toSet)
    assert(carried.size == 3,
      s"composite-key range prune must carry 3 of 4 files, " +
        s"carried ${carried.size}")
    assert(Versioned.read(s, dir).filter(col("v") === -1.0).count()
      == 10)
  }

  test("timestamp-keyed merge: the microsecond key box filters " +
      "correctly (no unit mismatch) and untouched files carry") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
    def ts(h: Long) = java.sql.Timestamp.from(base.plusSeconds(h * 3600))
    Versioned.commitWithStats(s, dir,
      (0L until 96L).map(h => (ts(h), h * 1.0)).toDF("t", "v")
        .repartitionByRange(4, col("t")), "t")
    val before = {
      val p = java.nio.file.Paths.get(dir, "_manifest", "v00000.txt")
      val src = scala.io.Source.fromFile(p.toFile, "UTF-8")
      try src.getLines().filter(l => l.nonEmpty && !l.startsWith("#"))
        .toList
      finally src.close()
    }
    assert(before.size == 4)
    // source keys confined to the first day (first file's range)
    val src = (0L until 12L).map(h => (ts(h), -1.0)).toDF("t", "v")
    val v = Versioned.mergeApply(s, dir, src, Seq("t"), Seq(
      WhenMatchedUpdate(None, Map("v" -> col("__s.v")))))
    assert(v == 1)
    val after = manifestLines(dir, 1)
    assert(after.toSet.intersect(before.toSet).size == 3,
      "timestamp key-range prune must carry 3 of 4 files")
    assert(Versioned.read(s, dir).filter(col("v") === -1.0).count()
      == 12)
    assert(Versioned.read(s, dir).count() == 96)
  }

  test("insert-only and no-op merges: no clause applied anywhere " +
      "publishes nothing; insert-only publishes just the delta") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    Versioned.commitWithStats(s,
      dir, Seq((1L, 1.0)).toDF("k", "v"), "k")
    // source matches nothing and the insert condition rejects it
    val src = Seq((50L, 5.0)).toDF("k", "v")
    val v0 = Versioned.mergeApply(s, dir, src, Seq("k"), Seq(
      WhenMatchedDelete(None),
      WhenNotMatchedInsert(Some(lit(false)), Map("k" -> col("__s.k")))))
    assert(v0 == 0, "no applied clause must be a commit-free no-op")
    // insert-only merge: base file carries verbatim
    val v1 = Versioned.mergeApply(s, dir, src, Seq("k"), Seq(
      WhenNotMatchedInsert(None,
        Map("k" -> col("__s.k"), "v" -> col("__s.v")))))
    assert(v1 == 1)
    assert(manifestLines(dir, 1).toSet
      .intersect(manifestLines(dir, 0).toSet).nonEmpty,
      "insert-only merge rewrote the base file")
    assert(Versioned.read(s, dir).count() == 2)
    // unassigned insert columns are NULL
    val v2 = Versioned.mergeApply(s, dir,
      Seq((60L, 6.0)).toDF("k", "v"), Seq("k"), Seq(
        WhenNotMatchedInsert(None, Map("k" -> col("__s.k")))))
    assert(v2 == 2)
    assert(Versioned.read(s, dir).filter(col("k") === 60L)
      .select("v").head().isNullAt(0))
  }

  test("guards: schema stays fixed, '__s' is reserved, CHECK " +
      "constraints validate the staged rows") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    Versioned.commitWithStats(s,
      dir, Seq((1L, 1.0)).toDF("k", "v"), "k")
    val src = Seq((1L, -5.0)).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException](
      Versioned.mergeApply(s, dir, src, Seq("k"), Seq(
        WhenMatchedUpdate(None, Map("nope" -> lit(1))))))
    assert(e1.getMessage.contains("not a table column"))
    val e2 = intercept[IllegalArgumentException](
      Versioned.mergeApply(s, dir,
        src.withColumn("__s", lit(1)), Seq("k"), Seq(
          WhenMatchedDelete(None))))
    assert(e2.getMessage.contains("__s"))
    Versioned.addCheck(s, dir, "v_nonneg", "v >= 0")
    val e3 = intercept[Exception](
      Versioned.mergeApply(s, dir, src, Seq("k"), Seq(
        WhenMatchedUpdate(None, Map("v" -> col("__s.v"))))))
    assert(e3.getMessage.toLowerCase.contains("check"),
      s"expected a CHECK violation, got: ${e3.getMessage}")
  }
}
