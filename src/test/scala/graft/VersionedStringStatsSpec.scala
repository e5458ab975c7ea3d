package graft

import org.apache.spark.sql.functions._

import graft.lake.Versioned

/** STRING min/max file stats (Delta's truncated string stats on this
  * manifest substrate): a StringType stat column records per-file
  * `~s`/`~S` bound tokens — prefix-truncated lower bound,
  * prefix-plus-increment upper bound — so range predicates over
  * string keys (ISO dates-as-strings, ULIDs, URL prefixes) plan
  * O(matching files) instead of scanning the table. Soundness split:
  * truncated bounds may PRUNE (∃-refutation through a one-sided
  * bound stays sound) but never PROVE an all-rows match (the
  * metadata-only DELETE ∀-prover demands exact, untruncated, finite
  * bounds). The all-NULL sentinel `~s0` prunes every comparison,
  * like the inverted numeric range.
  */
class VersionedStringStatsSpec extends SparkSuite {
  import spark.implicits._

  private def headLines(dir: String): Seq[String] =
    Versioned.manifestDataLines(spark, dir,
      Versioned.latestVersion(spark, dir).get)

  private def planned(dir: String,
      pred: org.apache.spark.sql.Column): Set[String] =
    Versioned.plannedFilesEq(spark, dir, pred).toSet

  /** One single-file append per letter group — deterministic file
    * spans (a range partitioner's sampled boundaries would not align
    * with the letter groups the asserts reason about). */
  private def letterTable(dir: String, letters: Seq[Char]): Unit =
    letters.foreach { l =>
      val rows = (0 until 10).map(i => (s"$l$i", (l - 'a') * 10L + i))
      Versioned.commitWithStats(spark, dir,
        rows.toDF("k", "v").coalesce(1), "k")
    }

  test("a string stat column records ~s/~S bounds; BETWEEN / range " +
      "predicates plan O(matching files); equality composes with the " +
      "bounds; the row filter stays the semantics") {
    val dir = tmpDir() + "/str-range"
    letterTable(dir, Seq('a', 'b', 'c', 'd')) // 4 files: a0..a9 … d0..d9
    val all = headLines(dir)
    assert(all.size == 4, "fixture wants 4 letter-clustered files")
    assert(all.forall(_.contains("\t~s=")),
      "string stat groups must carry exact ~s lower bounds: " + all.head)
    assert(all.forall(_.contains("\t~S=")),
      "string stat groups must carry exact ~S upper bounds")
    // a selective BETWEEN plans exactly the one file holding the range
    val between = planned(dir, col("k") >= "b0" && col("k") <= "b5")
    assert(between.size == 1,
      s"string BETWEEN must plan O(matching files), planned $between")
    // point lookups refute through the bounds (no bloom index here)
    assert(planned(dir, col("k") === "c3").size == 1)
    assert(planned(dir, col("k") === "zz").isEmpty,
      "an out-of-range string key must plan zero files")
    // one-sided ranges
    assert(planned(dir, col("k") < "b0").size == 1)   // the a-file
    assert(planned(dir, col("k") >= "d0").size == 1)  // the d-file
    // IN over strings: the union of per-value verdicts
    assert(planned(dir, col("k").isin("a1", "d7")).size == 2)
    // the filter is still the semantics
    assert(Versioned.readEq(spark, dir, col("k") >= "b2" &&
      col("k") < "c0").count() == 8)
  }

  test("metadata-only DELETE on a string key: exact bounds prove " +
      "whole files, NULL-predicate rows survive") {
    val dir = tmpDir() + "/str-del"
    // the a-file carries a NULL key (so it is never ∀-provable);
    // the b and c files are null-free with exact bounds
    Versioned.commitWithStats(spark, dir,
      ((0 until 10).map(i => (Option(s"a$i"), i.toLong)) :+
        ((Option.empty[String], 99L))).toDF("k", "v").coalesce(1), "k")
    letterTable(dir, Seq('b', 'c'))
    val pre = headLines(dir)
    assert(pre.size == 3)
    // DELETE WHERE k BETWEEN 'b0' AND 'c9': both matched files have
    // exact bounds inside the range and zero nulls — the ∀-prover
    // drops them as pure manifest surgery; the a-file is refuted by
    // its own bounds and never even scans
    val head = Versioned.latestVersion(spark, dir).get
    val v = Versioned.deleteWhere(spark, dir,
      col("k") >= "b0" && col("k") <= "c9")
    assert(v == head + 1)
    val post = headLines(dir)
    assert(post.size == 1 && pre.contains(post.head),
      "a provable string delete must drop whole lines verbatim, " +
        s"got $post")
    // the NULL-keyed row survives (SQL DELETE keeps NULL-predicate
    // rows) along with the rest of the a-file
    val left = Versioned.read(spark, dir).select("v")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(left == ((0L until 10L) :+ 99L),
      s"expected the a-file plus the NULL row, got $left")
  }

  test("truncation: >32-code-point keys record truncated bounds that " +
      "still prune soundly, and the ∀-prover refuses them") {
    val dir = tmpDir() + "/str-trunc"
    val longA = "a" * 40 // shares a 32-cp prefix with longA2
    val longA2 = "a" * 39 + "b"
    Versioned.commitWithStats(spark, dir,
      Seq((longA, 1L), (longA2, 2L), ("zz", 3L))
        .toDF("k", "v").repartition(1), "k")
    val l = headLines(dir)
    assert(l.exists(_.contains("\t~s~")),
      s"a >32-cp min must record a TRUNCATED lower bound: $l")
    // pruning through truncated bounds stays sound: the file's real
    // span is [a*40, zz]; a key below the truncated min refutes, a
    // key inside the span does not
    assert(planned(dir, col("k") === "Z").isEmpty,
      "a key below the truncated lower bound must prune")
    assert(planned(dir, col("k") === longA2).nonEmpty,
      "a key inside the span must stay a candidate")
    assert(planned(dir, col("k") === ("a" * 35)).nonEmpty,
      "a key sharing the truncated prefix must stay a candidate")
    assert(planned(dir, col("k") > "a" * 32).nonEmpty)
    // the ∀-prover never fires through a truncated bound: this
    // DELETE matches every row but must take the rewrite path, and
    // row-level semantics still hold exactly
    val single = tmpDir() + "/str-trunc-one"
    Versioned.commitWithStats(spark, single,
      Seq((longA, 1L), (longA2, 2L)).toDF("k", "v").repartition(1), "k")
    assert(graft.lake.Versioned.strCmp(longA, longA2) < 0)
    Versioned.deleteWhere(spark, single, col("k") >= "a")
    assert(Versioned.read(spark, single).count() == 0,
      "the rewrite path must still delete every matched row")
  }

  test("an all-NULL string file records ~s0 and prunes every " +
      "comparison; a rename rewrites the string group's column name") {
    val dir = tmpDir() + "/str-null"
    Versioned.commitWithStats(spark, dir,
      Seq((Option.empty[String], 1L), (Option.empty[String], 2L))
        .toDF("k", "v").repartition(1), "k")                 // v0
    Versioned.commitWithStats(spark, dir,
      Seq((Option("m5"), 3L)).toDF("k", "v").repartition(1), "k") // v1
    val l = headLines(dir)
    assert(l.exists(_.contains("\t~s0")),
      s"an all-NULL string file must record the ~s0 sentinel: $l")
    assert(planned(dir, col("k") === "m5").size == 1,
      "the sentinel file must prune from a point lookup")
    // IS NULL is outside range reasoning: the scan, not the stats,
    // answers it — both files stay readable
    assert(Versioned.read(spark, dir).filter(col("k").isNull)
      .count() == 2)
    // RENAME COLUMN rewrites the string stats group's name so the
    // skipping index follows the new logical name
    Versioned.renameColumn(spark, dir, "k", "key")           // v2
    assert(planned(dir, col("key") === "m5").size == 1)
    assert(planned(dir, col("key") === "zz").isEmpty,
      "post-rename bounds must still refute out-of-range keys")
  }
}
