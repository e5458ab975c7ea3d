package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.lake.Versioned

/** WRITE-TIME CLUSTERING (`graft.cluster.cols` / `CREATE TABLE …
  * CLUSTER BY`) — Delta's liquid-clustering declaration on this
  * substrate: a declared table range-partitions + sorts every
  * commit's OWN files on the cluster columns at commit time, so
  * per-file min/max stats are born disjoint and [[Versioned
  * .readPruned]] plans O(matching files) from the FIRST append —
  * the partition-column replacement (same pruning, no small-file
  * explosion, no partition-evolution rewrites), with no OPTIMIZE
  * pass needed to repair an append-ordered layout.
  */
class VersionedClusterSpec extends SparkSuite {
  import spark.implicits._

  /** Per-file [min, max] of `col` from the manifest's data lines —
    * parsed from the raw stats groups (`rel \t col \t mn \t mx …`). */
  private def ranges(dir: String, c: String): Seq[(Long, Long)] =
    Versioned.manifestDataLines(spark,
      dir, Versioned.latestVersion(spark, dir).get).flatMap { l =>
      val p = l.split('\t')
      p.indexOf(c) match {
        case i if i > 0 && i + 2 < p.length + 1 =>
          Some((p(i + 1).toLong, p(i + 2).toLong))
        case _ => None
      }
    }

  test("appends to a clusterBy-declared table produce DISJOINT " +
      "per-file ranges from a shuffled frame; a point window plans " +
      "O(matching files) with no compact") {
    val dir = tmpDir() + "/wc"
    // stats tracked from birth (the CREATE TABLE path's rule): v0's
    // zero-row file records inverted-sentinel bounds and prunes out
    Versioned.commitWithStats(spark, dir, Seq.empty[(Long, String)]
      .toDF("id", "s"), Seq("id"), replace = false)              // v0
    Versioned.setPolicy(spark, dir, clusterBy = Some(Seq("id"))) // v1
    // AQE right-sizes the range shuffle's output (adjacent ranges
    // coalesce toward the advisory size — disjointness survives, file
    // COUNT is a size question); pin a tiny advisory so this
    // KB-scale fixture still yields several files to prove
    // disjointness on
    val advisory =
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val minPart = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "1KB")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    // a deliberately SHUFFLED append: round-robin order, many
    // partitions — without the layout step every file would span
    // the whole key space and pruning would keep all of them
    try {
      val shuffled = (0L until 4000L).map(i => (i, s"r$i"))
        .toDF("id", "s").repartition(8)
      Versioned.commit(spark, dir, shuffled)                     // v2
    } finally {
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        minPart)
    }
    val rs = ranges(dir, "id")
    assert(rs.size >= 3, s"fixture wants several files, got $rs")
    // born disjoint: no two files' ranges overlap
    val sorted = rs.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping clustered ranges: $sorted")
      case _ => ()
    }
    // ... which is exactly what makes the planner O(matching files)
    val narrow = Versioned.readPruned(spark, dir, "id", 10L, 20L)
    assert(narrow.inputFiles.length == 1,
      s"narrow window planned ${narrow.inputFiles.length} of " +
        s"${rs.size} files")
    assert(narrow.count() == 11)
    // the declaration survives as table policy: a SECOND shuffled
    // append (new writer, no clustering knowledge) lands sorted too
    Versioned.commit(spark, dir,
      (4000L until 4200L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartition(4))                                         // v3
    val above = Versioned.readPruned(spark, dir, "id", 4050L, 4060L)
    assert(above.inputFiles.length == 1 && above.count() == 11)
    // an old-shape writer MISSING the cluster column still commits
    // (layout skipped, conservative), nothing refuses
    Versioned.commit(spark, dir, Seq("tail").toDF("s"))          // v4
    assert(Versioned.read(spark, dir).count() == 4201)
  }

  test("the upsert path honors the clustering contract too: " +
      "mergeInto on a declared table stages range-sorted files, and " +
      "a stats-only re-declaration keeps covering the cluster columns") {
    val dir = tmpDir() + "/wc-merge"
    Versioned.commitWithStats(spark, dir, Seq.empty[(Long, String)]
      .toDF("id", "s"), Seq("id"), replace = false)              // v0
    Versioned.setPolicy(spark, dir, clusterBy = Some(Seq("id"))) // v1
    val advisory =
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val minPart = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "1KB")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    try {
      // the whole table arrives THROUGH the merge path (the
      // Update-mode streaming sink's shape), shuffled
      Versioned.mergeInto(spark, dir,
        (0L until 4000L).map(i => (i, s"r$i")).toDF("id", "s")
          .repartition(8), Seq("id"))                            // v2
    } finally {
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        minPart)
    }
    val rs = ranges(dir, "id")
    assert(rs.size >= 3, s"fixture wants several files, got $rs")
    rs.sortBy(_._1).sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, "merge-staged files must be disjoint: " + rs)
      case _ => ()
    }
    assert(Versioned.readPruned(spark, dir, "id", 10L, 20L)
      .inputFiles.length == 1)
    // a stats-only re-declaration must NOT strip the cluster columns
    // out of the stat policy (the born-disjoint layout would stop
    // pruning while still paying the sort)
    Versioned.setPolicy(spark, dir, statCols = Some(Seq("s")))   // v3
    assert(Versioned.statPolicy(spark, dir).toSet == Set("s", "id"),
      "stat re-declaration dropped the carried cluster columns")
    Versioned.commit(spark, dir,
      (4000L until 4100L).map(i => (i, s"r$i")).toDF("id", "s")) // v4
    val above = Versioned.readPruned(spark, dir, "id", 4010L, 4020L)
    assert(above.count() == 11,
      "post-redeclaration append lost id stats")
  }

  test("CREATE TABLE … CLUSTER BY and TBLPROPERTIES declare the same " +
      "policy; INSERTs land born-clustered; UNSET clears it") {
    // tiny advisory size so the KB-scale fixtures yield several
    // files (AQE would rightly coalesce them at the default 64MB)
    withCatalogSession(Map(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
        "1KB")) { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.c (k BIGINT, v STRING) " +
        "CLUSTER BY (k)")
      val dir = s"$wh/db/c"
      // the insert arrives shuffled; the declared policy sorts it
      s.range(300).selectExpr("id", "cast(id as string) as s")
        .repartition(6).createOrReplaceTempView("src")
      s.sql("INSERT INTO graft.db.c SELECT * FROM src")
      val mLines = {
        val head = Versioned.latestVersion(s, dir).get
        val p = java.nio.file.Paths.get(dir, "_manifest",
          f"v$head%05d.txt")
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      }
      assert(mLines.contains("#clustercols\tk"),
        "the clustering policy must ride the manifest header")
      // the declaration round-trips through SHOW TBLPROPERTIES
      assert(s.sql("SHOW TBLPROPERTIES graft.db.c").collect()
        .exists(r => r.getString(0) == "graft.cluster.cols" &&
          r.getString(1) == "k"))
      val narrow = Versioned.readPruned(s, dir, "k", 5L, 10L)
      assert(narrow.inputFiles.length == 1 && narrow.count() == 6,
        s"CLUSTER BY insert planned ${narrow.inputFiles.length} files")
      // the TBLPROPERTIES spelling is the same declaration
      s.sql("CREATE TABLE graft.db.c2 (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.cluster.cols'='k')")
      s.sql("INSERT INTO graft.db.c2 SELECT * FROM src")
      val n2 = Versioned.readPruned(s, s"$wh/db/c2", "k", 5L, 10L)
      assert(n2.inputFiles.length == 1 && n2.count() == 6)
      // disagreeing double declaration refuses loudly
      val e = intercept[Exception](
        s.sql("CREATE TABLE graft.db.bad (k BIGINT, v BIGINT) " +
          "CLUSTER BY (k) TBLPROPERTIES ('graft.cluster.cols'='v')"))
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("disagree"))), e.getMessage)
      // UNSET lifts the policy: the header disappears and later
      // appends stop range-sorting (existing files keep their layout)
      s.sql("ALTER TABLE graft.db.c UNSET TBLPROPERTIES " +
        "('graft.cluster.cols')")
      val head2 = Versioned.latestVersion(s, dir).get
      val p2 = java.nio.file.Paths.get(dir, "_manifest",
        f"v$head2%05d.txt")
      assert(!new String(java.nio.file.Files.readAllBytes(p2), "UTF-8")
        .contains("#clustercols"),
        "UNSET must clear the clustering header")
      // CTAS … CLUSTER BY: policy lands BEFORE the data, so the CTAS
      // rows themselves are born clustered
      s.sql("CREATE TABLE graft.db.c3 CLUSTER BY (k) AS " +
        "SELECT id AS k, s AS v FROM src ORDER BY rand(7)")
      val n3 = Versioned.readPruned(s, s"$wh/db/c3", "k", 5L, 10L)
      assert(n3.inputFiles.length == 1 && n3.count() == 6,
        s"CTAS CLUSTER BY planned ${n3.inputFiles.length} files")
    }
  }
}
