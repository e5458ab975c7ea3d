package graft

import org.apache.spark.sql.functions._

import graft.lake.Versioned

/** Round-18 maintenance driver: the `graft.maintain.*` TBLPROPERTIES
  * vocabulary, the [[Versioned.fileDebt]] advisor, and
  * `CALL graft.system.maintain` — one verb a fleet scheduler loops
  * over every table, each table's own declared thresholds deciding
  * what debt is worth a rewrite.
  */
class MaintainSpec extends SparkSuite {
  import spark.implicits._

  private def rows(lo: Int, hi: Int, tag: String) =
    (lo until hi).map(i => (i.toLong, tag)).toDF("id", "s")

  test("maintain compacts exactly the declared debt: one DV-heavy " +
      "file and one small-file bin rewrite, the clean big file's " +
      "line republishes verbatim") {
    val dir = tmpDir() + "/maintain"
    // a big clean file, a big DV-heavy file, two small files
    Versioned.commitWithStats(spark, dir,
      rows(0, 20000, "clean").coalesce(1), "id")                   // v0
    Versioned.commitWithStats(spark, dir,
      rows(20000, 40000, "dvheavy").coalesce(1), "id")             // v1
    Versioned.commitWithStats(spark, dir,
      rows(40000, 40010, "s0").coalesce(1), "id")                  // v2
    Versioned.commitWithStats(spark, dir,
      rows(40010, 40020, "s1").coalesce(1), "id")                  // v3
    // 40% of the dvheavy file deletes merge-on-read
    Versioned.deleteWhereMor(spark, dir,
      col("id") >= 20000L && col("id") < 28000L)                   // v4
    Versioned.setPolicy(spark, dir, maintainSet = Seq(
      "smallfile.bytes" -> (64L << 10).toString,
      "dvdebt" -> "0.3"))                                         // v5
    val head = Versioned.latestVersion(spark, dir).get
    val before = Versioned.manifestDataLines(spark, dir, head)
    val cleanLine = before.find(_.contains("\tid\t0\t19999")).get
    val (v, rewritten) = Versioned.maintain(spark, dir)
    assert(v == head + 1 && rewritten == 3,
      s"expected the DV file + 2 small files to rewrite, got " +
        s"($v, $rewritten)")
    val after = Versioned.manifestDataLines(spark, dir, v)
    assert(after.contains(cleanLine),
      "the clean big file's line must republish verbatim")
    assert(Versioned.dvDebt(spark, dir).filter(col("deleted") > 0)
      .count() == 0, "the DV debt must materialize")
    assert(Versioned.read(spark, dir).count() == 32020)
    // a second run finds no debt: same head, zero rewritten
    assert(Versioned.maintain(spark, dir) == (v, 0))
  }

  test("maintain refuses an undeclared table, and a selectors-free " +
      "declaration (maxfiles only)") {
    val dir = tmpDir() + "/maintain-refuse"
    Versioned.commit(spark, dir, rows(0, 10, "x"))
    val e = intercept[IllegalArgumentException](
      Versioned.maintain(spark, dir))
    assert(e.getMessage.contains("declares no maintenance policy"))
    Versioned.setPolicy(spark, dir,
      maintainSet = Seq("maxfiles" -> "4"))
    val e2 = intercept[IllegalArgumentException](
      Versioned.maintain(spark, dir))
    assert(e2.getMessage.contains("SELECTOR"))
    // unknown keys and malformed values refuse at declaration
    val e3 = intercept[IllegalArgumentException](
      Versioned.setPolicy(spark, dir,
        maintainSet = Seq("frobnicate" -> "1")))
    assert(e3.getMessage.contains("unknown maintenance key"))
    val e4 = intercept[IllegalArgumentException](
      Versioned.setPolicy(spark, dir,
        maintainSet = Seq("dvdebt" -> "1.5")))
    assert(e4.getMessage.contains("fraction"))
  }

  test("fileDebt reports bytes, DV fraction, and cluster-key overlap " +
      "counts; born-clustered files overlap nothing") {
    val dir = tmpDir() + "/file-debt"
    Versioned.commitWithStats(spark, dir,
      rows(0, 1000, "x").limit(0), Seq("id"), replace = false)
    Versioned.setPolicy(spark, dir, clusterBy = Some(Seq("id")))
    // two overlapping round-robin appends + one disjoint append,
    // each forced to one file (coalesce skips the cluster re-sort?
    // no — clusterForStage range-sorts on commit, but a single file
    // spans whatever rows it got; overlap comes from the two
    // interleaved commits)
    Versioned.commit(spark, dir,
      (0 until 100).filter(_ % 2 == 0)
        .map(i => (i.toLong, "even")).toDF("id", "s").coalesce(1))
    Versioned.commit(spark, dir,
      (0 until 100).filter(_ % 2 == 1)
        .map(i => (i.toLong, "odd")).toDF("id", "s").coalesce(1))
    Versioned.commit(spark, dir,
      rows(5000, 5100, "hi").coalesce(1))
    val debt = Versioned.fileDebt(spark, dir)
      .select("bytes", "dv_fraction", "overlaps")
      .as[(Long, Option[Double], Option[Int])].collect().toSeq
    // the zero-row v0 file reports no overlap signal; the two
    // interleaved files overlap each other (1 each); the disjoint
    // high file overlaps nothing
    assert(debt.forall(_._1 >= 0))
    val overlaps = debt.flatMap(_._3)
    assert(overlaps.count(_ == 1) == 2 && overlaps.count(_ == 0) >= 1,
      s"expected the interleaved pair to overlap each other and the " +
        s"disjoint file none, got $overlaps")
    // the MoR delete shows up as dv_fraction on exactly one file
    Versioned.deleteWhereMor(spark, dir, col("id") === 5050L)
    val dv = Versioned.fileDebt(spark, dir)
      .filter(col("deleted") > 0).select("dv_fraction")
      .as[Double].collect().toSeq
    assert(dv.size == 1 && dv.head > 0 && dv.head < 0.1)
  }

  test("TBLPROPERTIES route: declare at CREATE, per-key merge on SET, " +
      "per-key drop on UNSET, surfaced by SHOW TBLPROPERTIES, and " +
      "CALL maintain/file_debt drive the declared policy") {
    withCatalogSession() { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.m (id BIGINT, s STRING) " +
        "TBLPROPERTIES ('graft.maintain.smallfile.bytes'='65536', " +
        "'graft.maintain.maxfiles'='8')")
      def props(): Map[String, String] =
        s.sql("SHOW TBLPROPERTIES graft.db.m").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props().get("graft.maintain.smallfile.bytes")
        .contains("65536"))
      assert(props().get("graft.maintain.maxfiles").contains("8"))
      // per-key merge: tuning one threshold keeps the others
      s.sql("ALTER TABLE graft.db.m SET TBLPROPERTIES " +
        "('graft.maintain.dvdebt'='0.25', " +
        "'graft.maintain.overlaps'='4')")
      assert(props().get("graft.maintain.smallfile.bytes")
        .contains("65536"))
      assert(props().get("graft.maintain.dvdebt").contains("0.25"))
      assert(props().get("graft.maintain.overlaps").contains("4"))
      s.sql("ALTER TABLE graft.db.m UNSET TBLPROPERTIES " +
        "('graft.maintain.overlaps')")
      // per-key drop
      s.sql("ALTER TABLE graft.db.m UNSET TBLPROPERTIES " +
        "('graft.maintain.maxfiles')")
      assert(!props().contains("graft.maintain.maxfiles"))
      assert(props().get("graft.maintain.dvdebt").contains("0.25"))
      // a malformed value refuses loudly at the DDL boundary
      val e = intercept[Exception](s.sql("ALTER TABLE graft.db.m SET " +
        "TBLPROPERTIES ('graft.maintain.smallfile.bytes'='zero')"))
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("positive byte count"))), e.getMessage)
      // drive debt through the SQL surface: three dribble inserts
      (0 until 3).foreach(i => s.sql(
        s"INSERT INTO graft.db.m SELECT id + ${i * 10}, 's$i' " +
          "FROM range(10)"))
      val dir = s"$wh/db/m"
      val linesBefore = Versioned.manifestDataLines(s, dir,
        Versioned.latestVersion(s, dir).get)
      val r = s.sql("CALL graft.system.maintain('db.m')").head()
      // every INSERT'd file is dribble-sized: all of them bin-pack
      assert(r.getInt(1) == linesBefore.size,
        s"expected all ${linesBefore.size} small files to bin-pack, " +
          s"got ${r.getInt(1)}")
      assert(Versioned.manifestDataLines(s, dir, r.getInt(0)).size == 1)
      assert(s.sql("SELECT count(*) FROM graft.db.m").head().getLong(0)
        == 30L)
      // the debt report reads through SQL too
      val dbt = s.sql("CALL graft.system.file_debt('db.m')")
      assert(dbt.columns.toSeq == Seq("file", "bytes", "rows",
        "deleted", "dv_fraction", "overlaps"))
      assert(dbt.count() >= 1)
    }
  }
}
