package graft

import org.apache.spark.sql.functions._
import graft.lake.DataLake

/** Lake IO: S1-S5 + dedup gates (main.py:80-150 semantics). */
class LakeSpec extends SparkSuite {
  import spark.implicits._

  private def rec(t: String, v: Double) =
    Seq((t, v)).toDF("time", "temp")
      .select(to_timestamp($"time").as("time"), $"temp",
        date_format(to_timestamp($"time"), "MM-dd-yy").as("fecha_partic"))

  test("read returns None for missing and empty paths") {
    assert(DataLake.read(spark, tmpDir() + "/nope").isEmpty)
  }

  test("appendIncremental writes, suppresses duplicate poll, accepts new time") {
    val dir = tmpDir() + "/regmeteor"
    assert(DataLake.appendIncremental(spark, rec("2023-11-30T14:00:00", 24.3), dir))
    // same newest time → suppressed (ST4 / main.py:101-107)
    assert(!DataLake.appendIncremental(spark, rec("2023-11-30T14:00:00", 24.3), dir))
    assert(spark.read.parquet(dir).count() == 1)
    // newer time → appended
    assert(DataLake.appendIncremental(spark, rec("2023-11-30T14:15:00", 24.5), dir))
    val lake = spark.read.parquet(dir)
    assert(lake.count() == 2)
    // hive partition restored on read
    assert(lake.columns.contains("fecha_partic"))
    // partition dirs actually exist on disk
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("fecha_partic=")))
  }

  test("appendIncremental probe prunes to incoming partitions (cross-day append works)") {
    val dir = tmpDir() + "/regmeteor"
    DataLake.appendIncremental(spark, rec("2023-11-30T23:45:00", 1.0), dir)
    assert(DataLake.appendIncremental(spark, rec("2023-12-01T00:00:00", 2.0), dir))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("appendFull all-or-nothing gate (main.py:127-150)") {
    val path = tmpDir() + "/localid"
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val batch2 = Seq((2L, "b"), (3L, "c")).toDF("id", "name") // one dup
    assert(DataLake.appendFull(spark, batch1, path))
    assert(!DataLake.appendFull(spark, batch2, path)) // whole batch skipped
    assert(spark.read.parquet(path).count() == 2)
  }

  test("appendFullNewOnly appends only unseen ids (improved variant)") {
    val path = tmpDir() + "/localid"
    DataLake.appendFull(spark, Seq((1L, "a")).toDF("id", "name"), path)
    val n = DataLake.appendFullNewOnly(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), path)
    assert(n == 1 && spark.read.parquet(path).count() == 2)
  }

  test("versioned: append/replace commits, time travel, snapshot immutability") {
    import graft.lake.Versioned
    val dir = tmpDir() + "/vtable"
    assert(Versioned.latestVersion(spark, dir).isEmpty)
    val v0 = Versioned.commit(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val v1 = Versioned.commit(spark, dir, Seq((2L, "b")).toDF("id", "s"))
    assert(v0 == 0 && v1 == 1)
    // append semantics: v1 = v0 files + new files
    assert(Versioned.read(spark, dir).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"))
    // replace publishes an entirely new state...
    val v2 = Versioned.commit(spark, dir,
      Seq((9L, "z")).toDF("id", "s"), replace = true)
    assert(v2 == 2)
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSeq ==
      Seq(9L -> "z"))
    // ...and time travel still sees every older snapshot, bit-unchanged
    assert(Versioned.read(spark, dir, Some(0)).as[(Long, String)]
      .collect().toSeq == Seq(1L -> "a"))
    assert(Versioned.read(spark, dir, Some(1)).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"))
    // compaction-as-commit: replace with the repartitioned latest state
    val v3 = Versioned.commit(spark, dir,
      Versioned.read(spark, dir).repartition(1), replace = true)
    assert(Versioned.read(spark, dir, Some(v3)).as[(Long, String)]
      .collect().toSeq == Seq(9L -> "z"))
    // missing version rejected
    intercept[IllegalArgumentException] {
      Versioned.read(spark, dir, Some(99))
    }
  }

  test("versioned stats pruning: disjoint files skipped, stats are " +
      "TABLE policy (a plain append inherits the tracked column), " +
      "unmeasurable files never pruned, all-pruned read keeps the " +
      "schema") {
    import graft.lake.Versioned
    val dir = tmpDir() + "/vstats"
    Versioned.commitWithStats(spark, dir,
      Seq((1L, "a"), (5L, "b")).toDF("id", "s").coalesce(1), "id")
    Versioned.commitWithStats(spark, dir,
      Seq((10L, "c"), (15L, "d")).toDF("id", "s").coalesce(1), "id")
    // a plain commit INHERITS the table's tracked column — one
    // untracked writer must not degrade the pruner toward O(table)
    Versioned.commit(spark, dir,
      Seq((100L, "x")).toDF("id", "s").coalesce(1))
    // [10, 12]: only the second commit's file plans — the inherited
    // stats prune the plain append's file too
    val pruned = Versioned.readPruned(spark, dir, "id", 10L, 12L)
    assert(pruned.inputFiles.length == 1)
    assert(pruned.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq(10L -> "c"))
    // ... and the appended file is found by its own range
    val top = Versioned.readPruned(spark, dir, "id", 99L, 101L)
    assert(top.inputFiles.length == 1 &&
      top.as[(Long, String)].collect().toSeq == Seq(100L -> "x"))
    // an append that OMITS the tracked column cannot be measured:
    // its file records no range and must always be planned
    Versioned.commit(spark, dir, Seq("y").toDF("s").coalesce(1))
    val edge = Versioned.readPruned(spark, dir, "id", 50L, 60L)
    assert(edge.inputFiles.length == 1 && edge.count() == 0)
    // all files pruned at v1 -> empty frame, schema intact
    val none = Versioned.readPruned(spark, dir, "id", 50L, 60L,
      version = Some(1))
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("id", "s"))
  }

  test("versioned expire: old versions gone, shared live files survive") {
    import graft.lake.Versioned
    val dir = tmpDir() + "/vexp"
    Versioned.commit(spark, dir, Seq((1L, "a")).toDF("id", "s")) // v0
    Versioned.commit(spark, dir, Seq((2L, "b")).toDF("id", "s")) // v1 = v0+new
    Versioned.commit(spark, dir, Seq((3L, "c")).toDF("id", "s")) // v2 = v1+new
    val (droppedV, deletedF) = Versioned.expire(spark, dir, keepLast = 2)
    assert(droppedV == 1) // v0's manifest dropped
    // v0's DATA file is still referenced by v1/v2 (append lineage) — it
    // must survive; nothing was exclusively owned by v0
    assert(deletedF == 0)
    assert(Versioned.read(spark, dir, Some(1)).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"))
    intercept[IllegalArgumentException] {
      Versioned.read(spark, dir, Some(0))
    }
    // a replace makes v0-v2's files exclusive; expiring to the last 1
    // version now physically deletes them
    Versioned.commit(spark, dir, Seq((9L, "z")).toDF("id", "s"),
      replace = true) // v3
    val (d2, f2) = Versioned.expire(spark, dir, keepLast = 1)
    assert(d2 == 2 && f2 >= 3, s"got ($d2, $f2)")
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSeq ==
      Seq(9L -> "z"))
  }

  test("versioned purge: matched rows gone from disk, live table intact") {
    import graft.lake.Versioned
    val dir = tmpDir() + "/vpurge"
    Versioned.commit(spark, dir,
      Seq((1L, "keep"), (2L, "secret")).toDF("id", "s"))
    Versioned.commit(spark, dir, Seq((3L, "keep2")).toDF("id", "s"))
    val (v, deleted) = Versioned.purge(spark, dir, col("s") === "secret")
    assert(v == 2 && deleted >= 2) // both pre-purge commits' files gone
    assert(Versioned.latestVersion(spark, dir).contains(2))
    assert(Versioned.read(spark, dir).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq(1L -> "keep", 3L -> "keep2"))
    // time travel to pre-purge versions must be impossible
    intercept[IllegalArgumentException] {
      Versioned.read(spark, dir, Some(0))
    }
    intercept[IllegalArgumentException] {
      Versioned.read(spark, dir, Some(1))
    }
    // and no parquet file under the table still holds the purged bytes
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    val leak = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .exists(p => new String(java.nio.file.Files.readAllBytes(p))
          .contains("secret"))
    } finally files.close()
    assert(!leak, "purged value still present in a data file")
  }

  test("versioned purge keeps rows where the predicate is NULL") {
    import graft.lake.Versioned
    val dir = tmpDir() + "/vpurgenull"
    Versioned.commit(spark, dir,
      Seq((1L, Some("secret")), (2L, Some("ok")), (3L, None))
        .toDF("id", "s"))
    // id 3's s is null: `s === "secret"` is NULL there — must be KEPT
    Versioned.purge(spark, dir, col("s") === "secret")
    assert(Versioned.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("compact merges small files, preserves content exactly") {
    val in = tmpDir() + "/frag"
    val out = tmpDir() + "/compacted"
    val rows = (1L to 1000L).map(i => (i, s"row-$i")).toDF("id", "name")
    rows.repartition(32).write.parquet(in) // 32 micro-batch-sized files
    val (before, after) = DataLake.compact(spark, in, out,
      targetBytes = 1L << 30) // everything fits one target file
    assert(before == 32 && after == 1, s"got ($before, $after)")
    val a = spark.read.parquet(out).orderBy("id").collect().toSeq
    val b = rows.orderBy("id").collect().toSeq
    assert(a == b)
  }
}
