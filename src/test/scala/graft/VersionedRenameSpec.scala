package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.lake.Versioned
import graft.lake.Versioned.CommitConflictException

/** RENAME COLUMN via column mapping ([[Versioned.renameColumn]] +
  * `#colmap`): a metadata-only commit — the logical name changes, the
  * PHYSICAL name (what data files carry) stays its birth name, zero
  * data movement. Time travel renders each version under its own
  * names; stats, pruning, DML, appends, compaction, the change feed,
  * and restore all keep working through the indirection.
  */
class VersionedRenameSpec extends SparkSuite {
  import spark.implicits._

  private def ranged(dir: String): Unit = {
    Versioned.commitWithStats(spark, dir,
      (0L until 40L).map(i => (i, s"row$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")), "id")
  }

  test("rename is metadata-only: new name at head, old name in time " +
      "travel, zero data files touched") {
    val dir = tmpDir() + "/basic"
    ranged(dir)
    val filesBefore = Versioned.manifestDataLines(spark, dir, 0)
      .map(_.split('\t')(0)).toSet
    val v = Versioned.renameColumn(spark, dir, "id", "doc_id")
    assert(v == 1)
    assert(Versioned.read(spark, dir).columns.toSeq ==
      Seq("doc_id", "s"))
    assert(Versioned.read(spark, dir, Some(0)).columns.toSeq ==
      Seq("id", "s"), "time travel must render the OLD name")
    assert(Versioned.manifestDataLines(spark, dir, 1)
      .map(_.split('\t')(0)).toSet == filesBefore,
      "a rename must republish the same data files")
    // content identical through the mapping
    assert(Versioned.read(spark, dir).as[(Long, String)]
      .collect().toSet ==
      (0L until 40L).map(i => (i, s"row$i")).toSet)
  }

  test("stats, pruning, metadata COUNT(*), and row-level DML keep " +
      "working under the renamed name") {
    val dir = tmpDir() + "/dml"
    ranged(dir)
    Versioned.renameColumn(spark, dir, "id", "doc_id")
    // stats groups were rewritten to the new logical name
    assert(Versioned.statPolicy(spark, dir) == Seq("doc_id"))
    assert(Versioned.readPruned(spark, dir, "doc_id", 5L, 8L)
      .count() == 4)
    assert(Versioned.rowCountFromMetadata(spark, dir) == Some(40L))
    // a pruned DELETE under the new name: one file rewrites, the
    // rest carry verbatim
    val before = Versioned.manifestDataLines(spark, dir, 1)
    val v = Versioned.deleteWhere(spark, dir, col("doc_id") < 10L)
    val after = Versioned.manifestDataLines(spark, dir, v)
    assert(before.toSet.intersect(after.toSet).size == 3,
      "untouched lines must carry verbatim through a post-rename DML")
    assert(Versioned.read(spark, dir).count() == 30)
    // the rewritten file's fresh stats speak the new name too
    assert(Versioned.readPruned(spark, dir, "doc_id", 11L, 12L)
      .count() == 2)
  }

  test("appends after a rename write the PHYSICAL name; mixed old/new " +
      "files scan as one table; compaction and restore carry the map") {
    val dir = tmpDir() + "/append"
    ranged(dir)
    Versioned.renameColumn(spark, dir, "id", "doc_id")          // v1
    Versioned.commitWithStats(spark, dir,
      Seq((100L, "row100")).toDF("doc_id", "s"), "doc_id")      // v2
    assert(Versioned.read(spark, dir).count() == 41)
    assert(Versioned.read(spark, dir)
      .filter(col("doc_id") === 100L).count() == 1)
    // the fresh file carries the BIRTH name physically — a second
    // rename still maps every file through one entry
    Versioned.renameColumn(spark, dir, "doc_id", "key")         // v3
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("key", "s"))
    assert(Versioned.read(spark, dir).filter(col("key") === 100L)
      .count() == 1)
    val v4 = Versioned.compactCommit(spark, dir,
      clusterBy = Seq("key"))                                   // v4
    assert(Versioned.read(spark, dir, Some(v4)).count() == 41)
    assert(Versioned.readPruned(spark, dir, "key", 0L, 5L).count() == 6)
    // restore to the pre-rename version rolls the NAME back with the
    // state (the mapping is version state, like checks and policy)
    val v5 = Versioned.restore(spark, dir, 0)
    assert(Versioned.read(spark, dir, Some(v5)).columns.toSeq ==
      Seq("id", "s"))
    assert(Versioned.read(spark, dir, Some(v5)).count() == 40)
  }

  test("the change feed renders a window under toVersion's names, " +
      "including files written before the rename") {
    val dir = tmpDir() + "/feed"
    ranged(dir)                                                  // v0
    Versioned.renameColumn(spark, dir, "id", "doc_id")           // v1
    Versioned.commit(spark, dir,
      Seq((100L, "row100")).toDF("doc_id", "s"))                 // v2
    val feed = Versioned.changesBetween(spark, dir, 0, 2, Seq("doc_id"))
    assert(feed.columns.contains("doc_id") && !feed.columns.contains("id"))
    // the rename itself nets to zero rows (no row changed); v2's
    // append is the only feed content
    assert(feed.count() == 1)
    assert(feed.filter(col("_commit_version") === 2).count() == 1)
  }

  test("filter pushdown crosses the mapping: a predicate on the " +
      "logical name reaches the physical parquet scan translated") {
    val dir = tmpDir() + "/pushdown"
    ranged(dir)
    Versioned.renameColumn(spark, dir, "id", "doc_id")
    val df = Versioned.read(spark, dir).filter(col("doc_id") === 5L)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no parquet scan in the plan"))
    // Catalyst rewrites the filter through the alias Project, so the
    // scan's pushed filters speak the PHYSICAL name — the mapping
    // costs a Project node, never the pushdown or the vectorized scan
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("EqualTo(id,5)"), s"pushed: $pushed")
    assert(scan.metadata.getOrElse("ReadSchema", "").contains("id"),
      "the scan must request the physical column")
    assert(df.count() == 1)
  }

  test("a bloom index DECLARED on an already-renamed column builds " +
      "and probes through the mapping") {
    val dir = tmpDir() + "/bloom-after"
    ranged(dir)
    Versioned.renameColumn(spark, dir, "id", "doc_id")          // v1
    // declare the index on the RENAMED logical name, then append —
    // the staged file carries the physical birth name, the filter
    // must still build over it and answer logical probes
    Versioned.setPolicy(spark, dir,
      bloomCfg = Some(Seq(("doc_id", 1000L, 0.01))))            // v2
    Versioned.commitWithStats(spark, dir,
      Seq((100L, "row100")).toDF("doc_id", "s"), "doc_id")      // v3
    assert(Versioned.plannedFilesEq(spark, dir,
      col("doc_id") === 100L).size == 1,
      "the post-rename bloom must answer the logical point lookup")
    assert(Versioned.readEq(spark, dir, col("doc_id") === 100L)
      .count() == 1)
    // a compaction re-measures every filter through the mapping too
    Versioned.compactCommit(spark, dir, clusterBy = Seq("doc_id"))
    assert(Versioned.readEq(spark, dir, col("doc_id") === 7L)
      .count() == 1)
    assert(Versioned.plannedFilesEq(spark, dir,
      col("doc_id") === 7L).size == 1,
      "compaction must rebuild the filters through the mapping")
  }

  test("refusals: CHECK-referenced, bloom-indexed, duplicate and " +
      "missing names, and re-adding a renamed-away name") {
    val dir = tmpDir() + "/refuse"
    ranged(dir)
    Versioned.addCheck(spark, dir, "id_ok", "id >= 0")
    val e1 = intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, dir, "id", "doc_id")
    }
    assert(e1.getMessage.contains("id_ok"))
    Versioned.dropCheck(spark, dir, "id_ok")
    Versioned.setPolicy(spark, dir,
      bloomCfg = Some(Seq(("s", 1000L, 0.01))))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, dir, "s", "txt")
    }
    assert(e2.getMessage.contains("bloom"))
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, dir, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, dir, "id", "s")
    }
    Versioned.renameColumn(spark, dir, "id", "doc_id")
    // appending a NEW column named like the renamed one's physical
    // name would leak old bytes into it — refused as a conflict
    intercept[CommitConflictException] {
      Versioned.commit(spark, dir,
        Seq((1L, "x", 9L)).toDF("doc_id", "s", "id"))
    }
    // a REPLACE resets naming authority: the old name is usable again
    val v = Versioned.commit(spark, dir,
      Seq((1L, "x")).toDF("id", "s"), replace = true)
    assert(Versioned.read(spark, dir, Some(v)).columns.toSeq ==
      Seq("id", "s"))
  }

  test("SQL: ALTER TABLE RENAME COLUMN routes through the catalog; " +
      "INSERT and DELETE keep working under the new name") {
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
          (0L until 20L).map(i => (i, s"r$i")).toDF("id", "s")
            .repartitionByRange(2, col("id"))
        }, "id")
      ext.sql("ALTER TABLE graft.db.t RENAME COLUMN id TO doc_id")
      assert(ext.table("graft.db.t").columns.toSeq == Seq("doc_id", "s"))
      ext.sql("INSERT INTO graft.db.t VALUES (100, 'fresh')")
      assert(ext.sql(
        "SELECT count(*) FROM graft.db.t WHERE doc_id = 100")
        .head().getLong(0) == 1L)
      ext.sql("DELETE FROM graft.db.t WHERE doc_id < 5")
      assert(ext.table("graft.db.t").count() == 16)
      // time travel renders the pre-rename version under its own name
      assert(ext.sql("SELECT * FROM graft.db.t VERSION AS OF 0")
        .columns.toSeq == Seq("id", "s"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
