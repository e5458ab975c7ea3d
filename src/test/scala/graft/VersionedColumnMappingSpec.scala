package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.lake.Versioned

/** `id` COLUMN-MAPPING MODE ([[Versioned.setColumnMapping]] +
  * `#colmapmode`): new columns mint UUID physical names from birth,
  * so the physical namespace is collision-free — the two refusals
  * birth-name mapping must keep (re-using a renamed-away or
  * dropped-away name) are LIFTED for id-mode columns. Delta's `id`
  * mapping mode, on this manifest substrate.
  */
class VersionedColumnMappingSpec extends SparkSuite {
  import spark.implicits._

  /** The physical column names the table's parquet files actually
    * carry (footer truth, not manifest claims). */
  private def physicalCols(dir: String): Set[String] = {
    val files = Versioned.manifestDataLines(spark, dir,
      Versioned.latestVersion(spark, dir).get)
      .map(l => s"$dir/${l.split('\t')(0)}")
    if (files.isEmpty) Set.empty
    else spark.read.option("mergeSchema", true)
      .parquet(files: _*).schema.fieldNames.toSet
  }

  test("the round-14 refusal is LIFTED: rename a column away, re-add " +
      "the name with fresh data — old bytes stay under their uuid, " +
      "the new column reads its own") {
    val dir = tmpDir() + "/lift"
    // CREATE-shaped: empty commit, then id mapping (mints every col)
    Versioned.commit(spark, dir,
      spark.emptyDataset[(Long, Long, String)].toDF("id", "v", "s")) // v0
    Versioned.setColumnMapping(spark, dir)                           // v1
    assert(Versioned.columnMappingMode(spark, dir).contains("id"))
    Versioned.commit(spark, dir,
      (0L until 10L).map(i => (i, i * 10, s"r$i")).toDF("id", "v", "s"))
    // files carry NO logical names — uuids only
    val phys0 = physicalCols(dir)
    assert(phys0.forall(_.startsWith("col-")),
      s"id-mode files must carry minted names, got $phys0")
    Versioned.renameColumn(spark, dir, "v", "score")
    // THE lifted refusal: re-add the renamed-away name with fresh data
    val v = Versioned.commit(spark, dir,
      Seq((100L, 7L, "x", 999L)).toDF("id", "score", "s", "v"))
    assert(Versioned.read(spark, dir).columns.toSeq ==
      Seq("id", "score", "s", "v"))
    // old rows: score carries the OLD v values, new v is null;
    // the fresh row reads both its own columns
    val head = Versioned.read(spark, dir)
    assert(head.filter(col("id") === 3L)
      .select("score", "v").head() match {
        case r => r.getLong(0) == 30L && r.isNullAt(1)
      })
    assert(head.filter(col("id") === 100L)
      .select("score", "v").head() match {
        case r => r.getLong(0) == 7L && r.getLong(1) == 999L
      })
    // time travel renders pre-rename versions under their own names
    assert(Versioned.read(spark, dir, Some(2)).columns.toSeq ==
      Seq("id", "v", "s"))
    assert(v == 4)
  }

  test("DROP + re-add the same name is equally legal in id mode, and " +
      "the re-added column never reads the dropped bytes") {
    val dir = tmpDir() + "/dropadd"
    Versioned.commit(spark, dir,
      spark.emptyDataset[(Long, Long)].toDF("id", "v"))             // v0
    Versioned.setColumnMapping(spark, dir)                          // v1
    Versioned.commit(spark, dir,
      (0L until 5L).map(i => (i, i * 10)).toDF("id", "v"))          // v2
    Versioned.dropColumn(spark, dir, "v")                           // v3
    Versioned.commit(spark, dir, Seq((100L, 1L)).toDF("id", "v"))   // v4
    val head = Versioned.read(spark, dir)
    assert(head.columns.toSeq == Seq("id", "v"))
    assert(head.filter(col("id") === 2L).head().isNullAt(1),
      "pre-drop rows must read NULL in the re-added column, never " +
        "the dropped column's bytes")
    assert(head.filter(col("id") === 100L).head().getLong(1) == 1L)
    assert(Versioned.read(spark, dir, Some(2))
      .filter(col("id") === 2L).head().getLong(1) == 20L,
      "time travel still reads the dropped column's data")
  }

  test("upgrading a DATA-BEARING table mints only FUTURE columns — " +
      "existing files keep birth names — yet the re-use lift applies " +
      "to EVERY post-upgrade add (new columns always mint)") {
    val dir = tmpDir() + "/upgrade"
    Versioned.commit(spark, dir,
      (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s"))          // v0
    Versioned.setColumnMapping(spark, dir)                          // v1
    // existing columns keep birth names (their files carry them)
    assert(physicalCols(dir) == Set("id", "s"))
    // a NEW column mints
    Versioned.commit(spark, dir,
      Seq((100L, "x", 5L)).toDF("id", "s", "extra"))                // v2
    assert(physicalCols(dir).exists(_.startsWith("col-")))
    // even a BIRTH-NAMED column's rename-away + re-add is legal now:
    // the re-added column mints its own physical, so the old files'
    // 's' bytes stay with the renamed column and the new 's' reads
    // only its own
    Versioned.renameColumn(spark, dir, "s", "text")                 // v3
    Versioned.commit(spark, dir,
      Seq((101L, "y", 1L, "z")).toDF("id", "text", "extra", "s"))   // v4
    val head = Versioned.read(spark, dir)
    assert(head.filter(col("id") === 0L)
      .select("text", "s").head() match {
        case r => r.getString(0) == "r0" && r.isNullAt(1)
      }, "old rows: text carries the old bytes, the re-added s is null")
    assert(head.filter(col("id") === 101L)
      .select("text", "s").head() match {
        case r => r.getString(0) == "y" && r.getString(1) == "z"
      })
    // minted column: rename-away + re-add passes too
    Versioned.renameColumn(spark, dir, "extra", "bonus")            // v5
    Versioned.commit(spark, dir, Seq((102L, "w", 2L, 9L, "q"))
      .toDF("id", "text", "bonus", "extra", "s"))
    assert(Versioned.read(spark, dir).filter(col("id") === 102L)
      .select("bonus", "extra").head() match {
        case r => r.getLong(0) == 2L && r.getLong(1) == 9L
      })
    // idempotent upgrade; downgrade refused
    assert(Versioned.setColumnMapping(spark, dir) ==
      Versioned.latestVersion(spark, dir).get)
    intercept[IllegalArgumentException](
      Versioned.setColumnMapping(spark, dir, "name"))
  }

  test("two RACING appends introducing the SAME new column converge " +
      "on one mint: the loser re-stages under the winner's physical " +
      "name, no column ever reads null") {
    val dir = tmpDir() + "/race"
    Versioned.commit(spark, dir,
      spark.emptyDataset[Tuple1[Long]].toDF("id"))                  // v0
    Versioned.setColumnMapping(spark, dir)                          // v1
    val s = spark
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = Versioned.commit(s, dir,
          Seq((1L, 10L)).toDF("id", "fresh"))
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = Versioned.commit(s, dir,
          Seq((2L, 20L)).toDF("id", "fresh"))
      })
      assert(Set(fa.get(), fb.get()) == Set(2, 3))
    } finally pool.shutdown()
    val head = Versioned.read(spark, dir)
    assert(head.filter(col("fresh").isNotNull).count() == 2,
      "a racing mint must never null the loser's column: " +
        head.collect().mkString(", "))
    assert(head.select(sum(col("fresh"))).head().getLong(0) == 30L)
    // exactly TWO physicals across BOTH files (id's mint + fresh's
    // SHARED mint) — a diverged mint would show three
    val phys = physicalCols(dir).filter(_.startsWith("col-"))
    assert(phys.size == 2,
      s"both writers' files must share one mint per column, got $phys")
  }

  test("a REPLACE in id mode mints the whole namespace fresh, and a " +
      "replaced-away name is immediately reusable") {
    val dir = tmpDir() + "/replace"
    Versioned.commit(spark, dir,
      spark.emptyDataset[(Long, String)].toDF("id", "s"))           // v0
    Versioned.setColumnMapping(spark, dir)                          // v1
    Versioned.commit(spark, dir,
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s"))          // v2
    Versioned.commit(spark, dir,
      Seq((9L, 1.5)).toDF("id", "price"), replace = true)           // v3
    assert(Versioned.columnMappingMode(spark, dir).contains("id"),
      "a replace keeps the declared mode")
    assert(physicalCols(dir).forall(_.startsWith("col-")),
      "a replace's files must carry fresh mints under id mode")
    assert(Versioned.read(spark, dir).columns.toSeq ==
      Seq("id", "price"))
    // the replaced-away 's' re-adds freely
    Versioned.commit(spark, dir, Seq((10L, 2.0, "back"))
      .toDF("id", "price", "s"))
    assert(Versioned.read(spark, dir)
      .filter(col("s") === "back").count() == 1)
  }

  test("mergeInto's schema evolution mints too: a merge-added column " +
      "gets a uuid physical, and rename-away + re-add of it is legal") {
    val dir = tmpDir() + "/merge"
    Versioned.commit(spark, dir,
      spark.emptyDataset[(Long, Long)].toDF("id", "v"))             // v0
    Versioned.setColumnMapping(spark, dir)                          // v1
    Versioned.commit(spark, dir,
      (0L until 4L).map(i => (i, i * 10)).toDF("id", "v"))          // v2
    // the merge introduces 'tag' (schema evolution)
    Versioned.mergeInto(spark, dir,
      Seq((1L, 99L, "hot"), (50L, 1L, "new")).toDF("id", "v", "tag"),
      Seq("id"))                                                    // v3
    assert(physicalCols(dir).forall(_.startsWith("col-")),
      s"merge-added columns must mint under id mode: " +
        physicalCols(dir))
    val head = Versioned.read(spark, dir)
    assert(head.filter(col("id") === 1L)
      .select("v", "tag").head() match {
        case r => r.getLong(0) == 99L && r.getString(1) == "hot"
      })
    assert(head.filter(col("id") === 0L).select("tag").head().isNullAt(0))
    // the lift holds for the merge-born column
    Versioned.renameColumn(spark, dir, "tag", "label")              // v4
    Versioned.commit(spark, dir,
      Seq((60L, 2L, "l", "t")).toDF("id", "v", "label", "tag"))     // v5
    val h2 = Versioned.read(spark, dir)
    assert(h2.filter(col("id") === 1L)
      .select("label", "tag").head() match {
        case r => r.getString(0) == "hot" && r.isNullAt(1)
      })
    assert(h2.filter(col("id") === 60L)
      .select("label", "tag").head() match {
        case r => r.getString(0) == "l" && r.getString(1) == "t"
      })
  }

  test("SQL: CREATE TABLE / CTAS with graft.colmap.mode='id' mint " +
      "from birth; ALTER upgrades; UNSET and downgrade are refused") {
    spark
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
      ext.sql("CREATE TABLE graft.db.t (id BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('graft.colmap.mode'='id')")
      val dir = s"$wh/db/t"
      assert(Versioned.columnMappingMode(ext, dir).contains("id"))
      ext.sql("INSERT INTO graft.db.t VALUES (1, 10), (2, 20)")
      // CREATE-time minting, not just mode declaration: the FIRST
      // insert's files already carry uuid physical names — CREATE on
      // the zero-row table is the cheap moment to re-home every
      // declared column (q151's lift, through the pure-SQL path)
      assert(Versioned.manifestDataLines(ext, dir,
          Versioned.latestVersion(ext, dir).get)
        .map(l => s"$dir/${l.split('\t')(0)}")
        .flatMap(f => ext.read.parquet(f).schema.fieldNames)
        .forall(_.startsWith("col-")),
        "CREATE TABLE id-mode files must carry minted names from birth")
      ext.sql("ALTER TABLE graft.db.t RENAME COLUMN v TO score")
      ext.sql("ALTER TABLE graft.db.t ADD COLUMNS (v BIGINT)")
      ext.sql("INSERT INTO graft.db.t VALUES (3, 30, 300)")
      assert(ext.sql("SELECT score, v FROM graft.db.t WHERE id = 1")
        .head() match {
          case r => r.getLong(0) == 10L && r.isNullAt(1)
        })
      assert(ext.sql("SELECT score, v FROM graft.db.t WHERE id = 3")
        .head() match {
          case r => r.getLong(0) == 30L && r.getLong(1) == 300L
        })
      val shown = ext.sql("SHOW TBLPROPERTIES graft.db.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(shown.get("graft.colmap.mode").contains("id"))
      // CTAS route: v0 schema, v1 mapping, v2 data — uuids from birth
      ext.sql("CREATE TABLE graft.db.c TBLPROPERTIES " +
        "('graft.colmap.mode'='id') AS SELECT id, id * 2 AS v " +
        "FROM range(5)")
      val cdir = s"$wh/db/c"
      assert(Versioned.columnMappingMode(ext, cdir).contains("id"))
      val files = Versioned.manifestDataLines(ext, cdir,
        Versioned.latestVersion(ext, cdir).get)
        .map(l => s"$cdir/${l.split('\t')(0)}")
      assert(ext.read.parquet(files: _*).schema.fieldNames
        .forall(_.startsWith("col-")),
        "CTAS id-mode files must carry minted names from birth")
      assert(ext.sql("SELECT sum(v) FROM graft.db.c").head()
        .getLong(0) == 20L)
      // upgrade an existing table; refuse UNSET and downgrade
      ext.sql("CREATE TABLE graft.db.u AS SELECT id FROM range(3)")
      ext.sql("ALTER TABLE graft.db.u SET TBLPROPERTIES " +
        "('graft.colmap.mode'='id')")
      assert(Versioned.columnMappingMode(ext, s"$wh/db/u")
        .contains("id"))
      intercept[Exception](ext.sql("ALTER TABLE graft.db.u UNSET " +
        "TBLPROPERTIES ('graft.colmap.mode')"))
      intercept[Exception](ext.sql("ALTER TABLE graft.db.u SET " +
        "TBLPROPERTIES ('graft.colmap.mode'='name')"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
