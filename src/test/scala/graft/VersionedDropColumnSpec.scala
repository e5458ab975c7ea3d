package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.lake.Versioned
import graft.lake.Versioned.CommitConflictException

/** DROP COLUMN via the column mapping ([[Versioned.dropColumn]] +
  * `#coldrop` tombstones): a metadata-only commit — the logical
  * column leaves the schema, every data file keeps its bytes (scans
  * stop requesting the physical column), zero data movement. Time
  * travel renders each version under its own schema; re-using a
  * dropped column's physical name is refused (old bytes would leak
  * into the new column); the dropped column's stats groups leave the
  * manifest lines so a future same-named column can never be pruned
  * (or worse, metadata-DELETED) against the dead column's ranges.
  */
class VersionedDropColumnSpec extends SparkSuite {
  import spark.implicits._

  private def ranged(dir: String): Unit = {
    Versioned.commitWithStats(spark, dir,
      (0L until 40L).map(i => (i, i * 10, s"row$i"))
        .toDF("id", "score", "s")
        .repartitionByRange(4, col("id")), Seq("id", "score"),
      replace = false)
  }

  test("drop is metadata-only: column gone at head, present in time " +
      "travel, zero data files touched") {
    val dir = tmpDir() + "/basic"
    ranged(dir)
    val filesBefore = Versioned.manifestDataLines(spark, dir, 0)
      .map(_.split('\t')(0)).toSet
    val v = Versioned.dropColumn(spark, dir, "score")
    assert(v == 1)
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "s"))
    assert(Versioned.read(spark, dir, Some(0)).columns.toSeq ==
      Seq("id", "score", "s"),
      "time travel must render the dropped column at its own versions")
    assert(Versioned.manifestDataLines(spark, dir, 1)
      .map(_.split('\t')(0)).toSet == filesBefore,
      "a drop must republish the same data files")
    assert(Versioned.read(spark, dir).as[(Long, String)]
      .collect().toSet ==
      (0L until 40L).map(i => (i, s"row$i")).toSet)
    assert(Versioned.read(spark, dir, Some(0))
      .filter(col("score") === 50L).count() == 1)
  }

  test("the dropped column leaves the stats policy and every line's " +
      "stats groups; surviving stats keep pruning and the metadata " +
      "row count survives") {
    val dir = tmpDir() + "/stats"
    ranged(dir)
    Versioned.dropColumn(spark, dir, "score")
    assert(Versioned.statPolicy(spark, dir) == Seq("id"))
    assert(Versioned.manifestDataLines(spark, dir, 1)
      .forall(!_.contains("score")),
      "the dropped column's stats groups must leave the lines — a " +
        "stale group under a re-used name could mis-prove a " +
        "metadata DELETE")
    assert(Versioned.readPruned(spark, dir, "id", 5L, 8L).count() == 4)
    assert(Versioned.rowCountFromMetadata(spark, dir) == Some(40L))
    // DML keeps working post-drop, untouched lines carry verbatim
    val before = Versioned.manifestDataLines(spark, dir, 1)
    val v = Versioned.deleteWhere(spark, dir, col("id") < 10L)
    assert(before.toSet.intersect(
      Versioned.manifestDataLines(spark, dir, v).toSet).size == 3)
    assert(Versioned.read(spark, dir).count() == 30)
  }

  test("re-using a dropped column's name is refused (physical bytes " +
      "still live in old files); a DIFFERENT name appends fine") {
    val dir = tmpDir() + "/reuse"
    ranged(dir)
    Versioned.dropColumn(spark, dir, "score")
    val e = intercept[CommitConflictException] {
      Versioned.commit(spark, dir,
        Seq((100L, 7L, "x")).toDF("id", "score", "s"))
    }
    assert(e.getMessage.contains("DROPPED"), e.getMessage)
    // a fresh differently-named column evolves in normally
    Versioned.commit(spark, dir,
      Seq((100L, 7L, "x")).toDF("id", "rank", "s"))
    assert(Versioned.read(spark, dir).columns.toSeq ==
      Seq("id", "s", "rank"))
    assert(Versioned.read(spark, dir).filter(col("rank").isNotNull)
      .count() == 1)
    // a RENAMED-away-then-dropped column frees its LOGICAL name:
    // the tombstone keys on the physical birth name
    val dir2 = tmpDir() + "/renamed"
    ranged(dir2)
    Versioned.renameColumn(spark, dir2, "score", "points")   // v1
    Versioned.dropColumn(spark, dir2, "points")              // v2
    // "points" had physical name "score", so re-adding "points"
    // is safe (old files carry no physical "points" column) …
    Versioned.commit(spark, dir2,
      Seq((100L, 1L, "x")).toDF("id", "points", "s"))
    assert(Versioned.read(spark, dir2).filter(col("points").isNotNull)
      .count() == 1)
    // … while re-adding "score" (the dead physical name) refuses
    intercept[CommitConflictException] {
      Versioned.commit(spark, dir2,
        Seq((101L, 1L, "y")).toDF("id", "score", "s"))
    }
  }

  test("refusals: CHECK-referenced, bloom-indexed, last column, " +
      "absent column; a replace lifts the tombstones") {
    val dir = tmpDir() + "/refuse"
    ranged(dir)
    Versioned.addCheck(spark, dir, "score_ok", "score >= 0")
    val e1 = intercept[Exception](
      Versioned.dropColumn(spark, dir, "score"))
    assert(e1.getMessage.contains("score_ok"), e1.getMessage)
    Versioned.dropCheck(spark, dir, "score_ok")
    Versioned.setPolicy(spark, dir,
      bloomCfg = Some(Seq(("score", 1000L, 0.03))))
    val e2 = intercept[Exception](
      Versioned.dropColumn(spark, dir, "score"))
    assert(e2.getMessage.contains("bloom"), e2.getMessage)
    Versioned.setPolicy(spark, dir, bloomCfg = Some(Nil))
    Versioned.dropColumn(spark, dir, "score")
    intercept[Exception](Versioned.dropColumn(spark, dir, "nope"))
    Versioned.dropColumn(spark, dir, "s")
    val e3 = intercept[Exception](
      Versioned.dropColumn(spark, dir, "id"))
    assert(e3.getMessage.contains("only column"), e3.getMessage)
    // a REPLACE claims naming authority: tombstones reset, the old
    // names are usable again
    Versioned.commit(spark, dir,
      Seq((1L, 2L, "z")).toDF("id", "score", "s"), replace = true)
    assert(Versioned.read(spark, dir).columns.toSeq ==
      Seq("id", "score", "s"))
  }

  test("change feed, restore, and expire survive a mid-window drop") {
    val dir = tmpDir() + "/feed"
    ranged(dir)                                             // v0
    Versioned.commit(spark, dir,
      Seq((100L, 5L, "new")).toDF("id", "score", "s"))      // v1
    Versioned.dropColumn(spark, dir, "score")               // v2
    Versioned.commit(spark, dir,
      Seq((101L, "post")).toDF("id", "s"))                  // v3
    // the feed speaks toVersion's schema: the dropped column is gone
    val feed = Versioned.changesBetween(spark, dir, 0, 3, Seq("id"))
    assert(feed.columns.toSeq ==
      Seq("id", "s", "_change_type", "_commit_version"))
    assert(feed.count() == 2, "v1's insert + v3's insert; the drop " +
      "commit itself nets zero rows")
    // restore to the pre-drop state brings the column back
    val v = Versioned.restore(spark, dir, 1)
    assert(Versioned.read(spark, dir, Some(v)).columns.toSeq ==
      Seq("id", "score", "s"))
    assert(Versioned.read(spark, dir).count() == 41)
    // retention across the drop boundary keeps every kept version
    Versioned.expire(spark, dir, keepLast = 2, orphanGraceMs = 0L)
    assert(Versioned.read(spark, dir).count() == 41)
  }

  test("SQL: ALTER TABLE DROP COLUMN routes through the catalog; " +
      "INSERT and SELECT keep working; history names the op") {
    spark // force shared session
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = tmpDir() + "/wh"
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft",
        classOf[graft.sql.GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", wh)
      .getOrCreate()
    try {
      ext.sql("CREATE NAMESPACE graft.db")
      val dir = s"$wh/db/t"
      Versioned.commitWithStats(ext, dir,
        {
          import ext.implicits._
          (0L until 20L).map(i => (i, i * 2, s"r$i"))
            .toDF("id", "score", "s")
            .repartitionByRange(2, col("id"))
        }, "id")
      ext.sql("ALTER TABLE graft.db.t DROP COLUMN score")
      assert(ext.table("graft.db.t").columns.toSeq == Seq("id", "s"))
      ext.sql("INSERT INTO graft.db.t VALUES (100, 'fresh')")
      assert(ext.table("graft.db.t").count() == 21)
      ext.sql("DELETE FROM graft.db.t WHERE id < 5")
      assert(ext.table("graft.db.t").count() == 16)
      assert(ext.sql("SELECT * FROM graft.db.t VERSION AS OF 0")
        .columns.toSeq == Seq("id", "score", "s"))
      assert(Versioned.history(ext, dir).collect()
        .map(_.getAs[String]("operation"))
        .contains("drop-column(score)"))
      // IF EXISTS tolerates exactly the absent-column case
      ext.sql("ALTER TABLE graft.db.t DROP COLUMN IF EXISTS nope")
      intercept[Exception](
        ext.sql("ALTER TABLE graft.db.t DROP COLUMN nope"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
