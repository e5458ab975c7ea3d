package graft

import org.apache.spark.sql.SparkSession

import graft.lake.Versioned

/** SQL maintenance surface of the lake: `CALL graft.system.<proc>`
  * ([[graft.sql.GraftProcedures]], Spark 4's V2 `ProcedureCatalog`
  * hook) and the table-valued functions `graft_history` /
  * `graft_table_changes` ([[GraftExtensions]]). Each must route to
  * the same [[Versioned]] operator the Scala API calls and return
  * the same rows; the change-feed TVF must additionally stay a
  * DISTRIBUTED plan (no LocalRelation — a collected feed would cap
  * at driver memory, and the feed is delta-sized by contract).
  */
class GraftProceduresSpec extends SparkSuite {


  test("CALL history/restore/dv_debt/compact/expire route to the " +
      "Versioned operators") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.t AS SELECT id, id * 10 AS v " +
        "FROM range(100)")                                        // v0
      s.sql("INSERT INTO graft.db.t SELECT id, id FROM " +
        "range(100, 120)")                                        // v1
      val dir = s"$wh/db/t"

      // history: same rows as the Scala API, queryable as CALL output
      val called = s.sql("CALL graft.system.history('db.t')").collect()
      val direct = Versioned.history(s, dir).collect()
      assert(called.map(_.getInt(0)).toSeq ==
        direct.map(_.getInt(0)).toSeq)                   // versions
      assert(called.map(_.getString(1)).toSeq ==
        direct.map(_.getString(1)).toSeq)                // operations
      assert(called.head.getInt(0) == 1 &&
        called.last.getInt(0) == 0)

      // dv_debt after a MoR delete names the DV'd file
      Versioned.deleteWhereMor(s, dir,
        org.apache.spark.sql.functions.col("id") < 10)            // v2
      val debt = s.sql(
        "CALL graft.system.dv_debt('db.t')").collect()
      assert(debt.exists(r => r.getLong(2) == 10L),
        s"dv_debt must report the 10 deleted positions: " +
          debt.mkString(", "))

      // compact materializes the DV (debt returns to zero) as v3
      val v3 = s.sql("CALL graft.system.compact('db.t')")
        .head().getInt(0)
      assert(v3 == 3)
      assert(s.sql("CALL graft.system.dv_debt('db.t')").collect()
        .forall(_.getLong(2) == 0L))
      assert(s.sql("SELECT count(*) FROM graft.db.t").head()
        .getLong(0) == 110L)

      // restore back to v1's state (pre-delete), as NEW version 4
      val v4 = s.sql("CALL graft.system.restore('db.t', 1)")
        .head().getInt(0)
      assert(v4 == 4)
      assert(s.sql("SELECT count(*) FROM graft.db.t").head()
        .getLong(0) == 120L)

      // expire keeps the newest 2: older manifests drop, and the
      // pre-compaction files (no longer referenced) are collected
      val exp = s.sql("CALL graft.system.expire('db.t', 2)").head()
      assert(exp.getInt(0) == 3,
        s"expected manifests v0..v2 dropped, got ${exp.getInt(0)}")
      assert(Versioned.latestVersion(s, dir).contains(4))
      intercept[Exception](
        s.sql("SELECT * FROM graft.db.t VERSION AS OF 0").collect())

      // argument validation fails loudly
      val e = intercept[Exception](
        s.sql("CALL graft.system.history('db.nope')").collect())
      assert(e.getMessage.contains("not found"))
      val u = intercept[Exception](
        s.sql("CALL graft.system.frobnicate('db.t')").collect())
      assert(u.getMessage.contains("unknown procedure") ||
        u.getMessage.contains("frobnicate"))
    }
  }

  test("graft_table_changes and graft_history are table-valued " +
      "functions; the change feed stays a distributed plan") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.c AS SELECT id, id * 2 AS v " +
        "FROM range(10)")                                         // v0
      s.sql("INSERT INTO graft.db.c VALUES (100, 1)")             // v1
      s.sql("UPDATE graft.db.c SET v = 0 WHERE id = 3")           // v2
      val dir = s"$wh/db/c"

      // catalog-name resolution and dir-path resolution agree
      val byName = s.sql("SELECT * FROM graft_table_changes(" +
        "'graft.db.c', 0, 2, 'id') ORDER BY _commit_version, " +
        "_change_type, id").collect()
      val byDir = s.sql(s"SELECT * FROM graft_table_changes(" +
        s"'$dir', 0, 2, 'id') ORDER BY _commit_version, " +
        "_change_type, id").collect()
      assert(byName.toSeq == byDir.toSeq)
      // and both match the Scala API's feed
      val direct = Versioned.changesBetween(s, dir, 0, 2, Seq("id"))
        .orderBy("_commit_version", "_change_type", "id").collect()
      assert(byName.toSeq == direct.toSeq)
      // the feed really carries the three commits' deltas
      assert(byName.exists(r =>
        r.getAs[String]("_change_type") == "insert" &&
          r.getAs[Long]("id") == 100L))
      assert(byName.exists(r =>
        r.getAs[String]("_change_type") == "update_postimage" &&
          r.getAs[Long]("id") == 3L && r.getAs[Long]("v") == 0L))

      // SQL composes over the TVF (filter + aggregate)
      assert(s.sql("SELECT count(*) FROM graft_table_changes(" +
        "'graft.db.c', 1, 2, 'id') WHERE _change_type LIKE 'update%'")
        .head().getLong(0) == 2L)

      // scale shape: the feed must NOT be a collected LocalRelation —
      // appends plan as file scans (cost O(delta), distributed)
      val feedPlan = s.sql("SELECT * FROM graft_table_changes(" +
        "'graft.db.c', 0, 1, 'id')").queryExecution.optimizedPlan
      def hasLocal(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
        p.collect {
          case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
              if l.data.nonEmpty => l
        }.nonEmpty
      assert(!hasLocal(feedPlan),
        s"change feed collapsed to LocalRelation:\n$feedPlan")

      // history TVF: joinable/filterable audit log
      assert(s.sql("SELECT count(*) FROM graft_history('graft.db.c') " +
        "WHERE operation = 'update'").head().getLong(0) == 1L)
      assert(s.sql("SELECT max(version) FROM graft_history('graft.db.c')")
        .head().getInt(0) == 2)

      // arity and argument validation fail loudly
      val e = intercept[Exception](
        s.sql("SELECT * FROM graft_table_changes('graft.db.c')")
          .collect())
      assert(e.getMessage.contains("graft_table_changes") ||
        e.getMessage.contains("arguments"))
    }
  }

  test("CALL txn_version surfaces the #txnhw ledger: a stamped " +
      "writer's high-water, NULL for strangers, and it survives " +
      "retention") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.tv AS SELECT id FROM range(3)")
      val dir = s"$wh/db/tv"
      Versioned.idempotentCommit(s, dir,
        s.range(3).toDF("id"), "writer-a", 41L)
      Versioned.idempotentCommit(s, dir,
        s.range(2).toDF("id"), "writer-a", 42L)
      def hw(app: String): Option[Long] = {
        val r = s.sql(
          s"CALL graft.system.txn_version('db.tv', '$app')").head()
        if (r.isNullAt(1)) None else Some(r.getLong(1))
      }
      assert(hw("writer-a").contains(42L))
      assert(hw("nobody").isEmpty)
      // bury and sweep the stamped manifests: the ledger in the head
      // still answers (the expire-proof guarantee, through SQL)
      for (i <- 0 until 6)
        s.sql(s"INSERT INTO graft.db.tv VALUES ($i)")
      s.sql("CALL graft.system.expire('db.tv', 2)")
      assert(hw("writer-a").contains(42L),
        "retention must not erase the txn ledger")
    }
  }

  test("graft_table_changes by INSTANT: string bounds resolve " +
      "through the recorded #ts instants — [from, to] inclusive, " +
      "below-v0 windows render v0 as inserts, mixed kinds refuse") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.ti AS SELECT id FROM range(3)") // v0
      Thread.sleep(30)
      s.sql("INSERT INTO graft.db.ti VALUES (10)")                 // v1
      Thread.sleep(30)
      s.sql("INSERT INTO graft.db.ti VALUES (20)")                 // v2
      val dir = s"$wh/db/ti"
      val ts = Versioned.history(s, dir)
        .select("version", "ts_millis").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      def changes(lo: Long, hi: Long): Seq[Int] =
        s.sql(s"SELECT _commit_version FROM graft_table_changes(" +
          s"'graft.db.ti', '$lo', '$hi', 'id')").collect()
          .map(_.getInt(0)).distinct.sorted.toSeq
      // a window spanning v1..v2's instants feeds exactly those
      assert(changes(ts(0) + 1, ts(2)) == Seq(1, 2))
      // exact hits are inclusive on both ends
      assert(changes(ts(1), ts(1)) == Seq(1))
      // a window reaching below v0 renders v0's content as inserts
      assert(changes(ts(0) - 1, ts(1)) == Seq(0, 1))
      assert(s.sql("SELECT count(*) FROM graft_table_changes(" +
        s"'graft.db.ti', '${ts(0) - 1}', '${ts(0)}', 'id')")
        .head().getLong(0) == 3L, "v0's 3 rows as inserts")
      // a window past the head is empty, not an error
      assert(changes(ts(2) + 3600000L, ts(2) + 7200000L).isEmpty)
      // mixed bound kinds refuse loudly
      val e = intercept[Exception](
        s.sql("SELECT * FROM graft_table_changes('graft.db.ti', " +
          s"'${ts(0)}', 2, 'id')").collect())
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("both"))), e.getMessage)
    }
  }

  test("graft_table_changes by INSTANT anchored AT the retention " +
      "floor renders the floor's content as inserts instead of " +
      "demanding the expired pre-image") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.tf AS SELECT id FROM range(3)") // v0
      Thread.sleep(30)
      s.sql("INSERT INTO graft.db.tf VALUES (10)")                 // v1
      Thread.sleep(30)
      s.sql("INSERT INTO graft.db.tf VALUES (20)")                 // v2
      Thread.sleep(30)
      s.sql("INSERT INTO graft.db.tf VALUES (30)")                 // v3
      val dir = s"$wh/db/tf"
      val ts = Versioned.history(s, dir)
        .select("version", "ts_millis").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // retention sweeps v0..v1: the floor is v2, whose pre-image
      // (v1) no longer exists
      Versioned.expire(s, dir, keepLast = 2)
      assert(Versioned.oldestRetainedVersion(s, dir).contains(2))
      // an instant window opening BELOW the floor anchors AT it —
      // the floor's full content renders as inserts (the first state
      // visible in the window), then v3's change on top; the old
      // code demanded the expired v1 manifest and threw
      val rows = s.sql("SELECT _commit_version, _change_type FROM " +
        s"graft_table_changes('graft.db.tf', '${ts(0)}', " +
        s"'${ts(3)}', 'id')").collect()
      assert(rows.count(r => r.getInt(0) == 2 &&
        r.getString(1) == "insert") == 5,
        s"floor state (5 rows at v2) as inserts: ${rows.toSeq}")
      assert(rows.count(_.getInt(0) == 3) == 1, "v3's append on top")
      assert(rows.length == 6)
      // version-form callers naming the expired pre-image keep the
      // loud refusal — they asked for an exact window
      val e = intercept[Exception](
        s.sql("SELECT * FROM graft_table_changes('graft.db.tf', " +
          "1, 3, 'id')").collect())
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("not found"))), e.getMessage)
    }
  }

  test("CALL detail returns the version's inspection bundle: " +
      "files/bytes/DVs, policies, and the protocol gate") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.d (k BIGINT, v STRING) " +
        "CLUSTER BY (k) TBLPROPERTIES ('graft.bloom.cols'='v', " +
        "'graft.txn.retention'='1 h')")
      s.sql("INSERT INTO graft.db.d SELECT id, cast(id AS STRING) " +
        "FROM range(100)")
      s.sql("ALTER TABLE graft.db.d ADD CONSTRAINT k_pos CHECK (k >= 0)")
      s.sql("DELETE FROM graft.db.d WHERE k = 7") // may be CoW or MoR
      val r = s.sql("CALL graft.system.detail('db.d')").head()
      val col = r.schema.fieldNames.zipWithIndex.toMap
      assert(r.getInt(col("num_files")) >= 1)
      assert(!r.isNullAt(col("size_bytes")) &&
        r.getLong(col("size_bytes")) > 0,
        "modern tables carry the ~b sizes — bytes must sum")
      assert(r.getString(col("checks")) == "k_pos")
      assert(r.getString(col("stats_cols")).split(',').contains("k"))
      assert(r.getString(col("bloom_cols")) == "v")
      assert(r.getString(col("cluster_cols")) == "k")
      assert(r.getLong(col("txn_retention_ms")) == 3600000L)
      val wf = r.getString(col("writer_features")).split(',').toSet
      assert(Set("check-constraints", "cluster-by", "txn-retention")
        .subsetOf(wf), wf.toString)
      // a historical version renders ITS OWN bundle (before the CHECK)
      val v1 = s.sql("CALL graft.system.detail('db.d', version => 1)")
        .head()
      assert(v1.getString(col("checks")).isEmpty,
        "version 1 predates the CHECK — per-version bundle")
    }
  }

  test("expire by AGE horizon (older_than): versions whose recorded " +
      "instants predate it drop, the head always survives, and the " +
      "two cut forms are mutually exclusive") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.age AS SELECT id FROM range(3)") // v0
      Thread.sleep(120)
      s.sql("INSERT INTO graft.db.age VALUES (10)")                 // v1
      Thread.sleep(120)
      s.sql("INSERT INTO graft.db.age VALUES (20)")                 // v2
      Thread.sleep(120)
      s.sql("INSERT INTO graft.db.age VALUES (30)")                 // v3
      val dir = s"$wh/db/age"
      val ts = Versioned.history(s, dir)
        .select("version", "ts_millis").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // a far horizon keeps everything
      assert(s.sql("CALL graft.system.expire('db.age', " +
        "older_than => '1 h')").head().getInt(0) == 0)
      assert(Versioned.oldestRetainedVersion(s, dir).contains(0))
      // a horizon cutting between v1 and v2 drops exactly v0, v1
      // (margin 40ms against clock drift between this read and the
      // one inside the call; version gaps are 120ms)
      val horizon = System.currentTimeMillis() - ts(2) + 40
      val (dropped, _) = Versioned.expireOlderThan(s, dir, horizon)
      assert(dropped == 2, s"expected v0,v1 dropped, got $dropped")
      assert(Versioned.oldestRetainedVersion(s, dir).contains(2))
      assert(Versioned.read(s, dir).count() == 6)
      // everything older than a just-elapsed instant: head survives
      Thread.sleep(30)
      assert(s.sql("CALL graft.system.expire('db.age', " +
        "older_than => '10')").head().getInt(0) == 1) // v2 drops
      assert(Versioned.oldestRetainedVersion(s, dir).contains(3))
      assert(Versioned.read(s, dir).count() == 6,
        "the head must survive any horizon")
      // exactly one cut form
      val e0 = intercept[Exception](
        s.sql("CALL graft.system.expire('db.age')").collect())
      assert(Iterator.iterate(e0: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("exactly one"))), e0.getMessage)
      val e2 = intercept[Exception](
        s.sql("CALL graft.system.expire('db.age', keep_last => 1, " +
          "older_than => '1 h')").collect())
      assert(Iterator.iterate(e2: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("exactly one"))), e2.getMessage)
    }
  }

  test("txn retention declares through TBLPROPERTIES and CALL " +
      "set_policy as a carried #txnretention header; durations parse") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.tr (id BIGINT) " +
        "TBLPROPERTIES ('graft.txn.retention'='30 days')")
      val dir = s"$wh/db/tr"
      def header(): String = {
        val head = Versioned.latestVersion(s, dir).get
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir, "_manifest",
            f"v$head%05d.txt")), "UTF-8")
      }
      assert(header().contains("#txnretention\t2592000000"), header())
      // carried through plain commits like any policy
      s.sql("INSERT INTO graft.db.tr VALUES (1)")
      assert(header().contains("#txnretention\t2592000000"))
      // CALL set_policy re-declares with a different unit spelling
      s.sql("CALL graft.system.set_policy('db.tr', " +
        "txn_retention => '12h')")
      assert(header().contains("#txnretention\t43200000"), header())
      // '' clears back to keep-forever; ALTER UNSET is its DDL twin
      s.sql("CALL graft.system.set_policy('db.tr', txn_retention => '')")
      assert(!header().contains("#txnretention"), header())
      s.sql("ALTER TABLE graft.db.tr SET TBLPROPERTIES " +
        "('graft.txn.retention'='90 minutes')")
      assert(header().contains("#txnretention\t5400000"), header())
      // the declaration round-trips through SHOW TBLPROPERTIES
      assert(s.sql("SHOW TBLPROPERTIES graft.db.tr").collect()
        .exists(r => r.getString(0) == "graft.txn.retention" &&
          r.getString(1) == "5400000"))
      s.sql("ALTER TABLE graft.db.tr UNSET TBLPROPERTIES " +
        "('graft.txn.retention')")
      assert(!header().contains("#txnretention"), header())
      // junk durations refuse loudly
      val e = intercept[Exception](s.sql(
        "CALL graft.system.set_policy('db.tr', " +
          "txn_retention => 'fortnight')").collect())
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("duration"))), e.getMessage)
      // schema enforcement declares/clears through the CALL twin too
      s.sql("CALL graft.system.set_policy('db.tr', " +
        "schema_enforce => true)")
      assert(header().contains("#schemaenforce\t1"), header())
      s.sql("CALL graft.system.set_policy('db.tr', " +
        "schema_enforce => false)")
      assert(!header().contains("#schemaenforce"), header())
    }
  }

  test("CALL compact(cluster_by, zorder) is the Scala clustered " +
      "rewrite, manifest-equal") {
    withCatalogSession { (s, wh) =>
      import s.implicits._
      import org.apache.spark.sql.functions.col
      s.sql("CREATE NAMESPACE graft.db")
      // identical unclustered twins (interleaved ranges across files)
      val base = (0L until 400L).map(i => (i % 20, i, s"r$i"))
        .toDF("k", "id", "s").repartition(4)
        .localCheckpoint(true)
      val sqlDir = s"$wh/db/sqlc"
      val apiDir = s"$wh/db/apic"
      Versioned.commitWithStats(s, sqlDir, base, "k")
      Versioned.commitWithStats(s, apiDir, base, "k")
      s.sql("CALL graft.system.compact('db.sqlc', " +
        "cluster_by => 'k', target_bytes => 1024)")
      Versioned.compactCommit(s, apiDir, targetBytes = 1024L,
        clusterBy = Seq("k"))
      def normalized(dir: String): Seq[String] =
        normalizedManifest(dir, Versioned.latestVersion(s, dir).get)
      assert(Versioned.latestVersion(s, sqlDir).contains(1))
      assert(normalized(sqlDir) == normalized(apiDir),
        "CALL compact(cluster_by) must publish the same clustered " +
          "rewrite the Scala API does")
      // clustering did its job: a point range now prunes to fewer
      // files than the table holds
      val planned = Versioned.readPruned(s, sqlDir, "k", 3L, 3L)
        .inputFiles.length
      val all = Versioned.read(s, sqlDir).inputFiles.length
      assert(planned < all,
        s"clustered compaction must make stats selective ($planned/$all)")
      // zorder without keys is refused loudly
      val e = intercept[Exception](s.sql(
        "CALL graft.system.compact('db.sqlc', zorder => true)"))
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("cluster_by"))), e.getMessage)
    }
  }

  test("CALL compact with a selector routes to compactSubset: the " +
      "SQL and Scala subset rewrites publish manifest-equal, the " +
      "unselected file carries verbatim, and max_files without a " +
      "selector refuses") {
    withCatalogSession { (s, wh) =>
      import s.implicits._
      s.sql("CREATE NAMESPACE graft.db")
      val big = (0L until 20000L).map(i => (i, s"big$i"))
        .toDF("id", "s").coalesce(1).localCheckpoint(true)
      val dribble = (0 until 3).map(i =>
        (20000L + i * 10 until 20010L + i * 10).map(j => (j, s"s$i"))
          .toDF("id", "s").coalesce(1).localCheckpoint(true))
      val sqlDir = s"$wh/db/sqlsub"
      val apiDir = s"$wh/db/apisub"
      Seq(sqlDir, apiDir).foreach { d =>
        Versioned.commitWithStats(s, d, big, "id")
        dribble.foreach(Versioned.commitWithStats(s, d, _, "id"))
      }
      val v = s.sql("CALL graft.system.compact('db.sqlsub', " +
        "small_file_bytes => 65536, target_bytes => 1073741824)")
        .head().getInt(0)
      Versioned.compactSubset(s, apiDir,
        smallFileBytes = Some(65536L), targetBytes = 1L << 30)
      def normalized(dir: String): Seq[String] =
        normalizedManifest(dir, Versioned.latestVersion(s, dir).get)
      assert(v == 4)
      assert(normalized(sqlDir) == normalized(apiDir),
        "CALL compact(small_file_bytes) must publish the same subset " +
          "rewrite the Scala API does")
      // the big file's line republished verbatim, dribble merged 3->1
      val before = Versioned.manifestDataLines(s, sqlDir, 3)
      val after = Versioned.manifestDataLines(s, sqlDir, v)
      assert(after.size == 2 && after.contains(before.head))
      // a predicate selector speaks SQL: both files' stats admit
      // id >= 10000, so the key-range compact merges them
      val v2 = s.sql("CALL graft.system.compact('db.sqlsub', " +
        "where => 'id >= 10000', target_bytes => 1073741824)")
        .head().getInt(0)
      assert(v2 == v + 1)
      assert(Versioned.manifestDataLines(s, sqlDir, v2).size == 1)
      assert(Versioned.read(s, sqlDir).count() == 20030)
      // max_files without any selector is refused loudly
      val e = intercept[Exception](s.sql(
        "CALL graft.system.compact('db.sqlsub', max_files => 2)"))
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("selector"))), e.getMessage)
    }
  }

  test("CALL set_policy is the TBLPROPERTIES twin: declares, keeps " +
      "on NULL, clears on empty string") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.sp AS SELECT id, CAST(id AS STRING) " +
        "AS k FROM range(10)")
      val dir = s"$wh/db/sp"
      // declare both halves through CALL alone
      val v = s.sql("CALL graft.system.set_policy('db.sp', " +
        "stats_cols => 'id', bloom_cols => 'k', " +
        "bloom_expected => 500, bloom_fpp => 0.01)").head().getInt(0)
      assert(v == 1)
      assert(Versioned.statPolicy(s, dir) == Seq("id"))
      assert(Versioned.bloomPolicy(s, dir) == Seq(("k", 500L, 0.01)))
      assert(Versioned.history(s, dir).collect()
        .map(_.getAs[String]("operation")).contains("set-policy"))
      // the next insert measures + indexes under it (pre-declaration
      // files have no filter and always plan; the new file prunes on
      // an absent key and plans on a present one)
      s.sql("INSERT INTO graft.db.sp VALUES (100, 'fresh')")
      val pF = Versioned.plannedFilesEq(s, dir,
        org.apache.spark.sql.functions.col("k") === "fresh").size
      val pA = Versioned.plannedFilesEq(s, dir,
        org.apache.spark.sql.functions.col("k") === "absent").size
      assert(pF == pA + 1,
        s"post-declaration insert must be bloom-indexed: $pF vs $pA")
      // NULL keeps a half; '' clears it
      s.sql("CALL graft.system.set_policy('db.sp', bloom_cols => '')")
      assert(Versioned.statPolicy(s, dir) == Seq("id"),
        "omitted stats_cols must keep the declaration")
      assert(Versioned.bloomPolicy(s, dir).isEmpty,
        "empty bloom_cols must clear the declaration")
      // nothing declared at all is refused
      val e = intercept[Exception](
        s.sql("CALL graft.system.set_policy('db.sp')"))
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("stats_cols, bloom_cols, " +
            "checkpoint_every, cluster_by, txn_retention, or " +
            "schema_enforce"))),
        e.getMessage)
      // sizing a CLEARED index (bloom_cols => '') is the same silent
      // drop as sizing an omitted one — both refuse
      val e2 = intercept[Exception](
        s.sql("CALL graft.system.set_policy('db.sp', " +
          "bloom_cols => '', bloom_expected => 500)"))
      assert(Iterator.iterate(e2: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("non-empty bloom_cols"))),
        e2.getMessage)
    }
  }

  test("CALL checkpoint folds the head's delta chain into a sidecar " +
      "snapshot: same state, no new version, the committed manifest " +
      "file stays immutable") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.t AS SELECT id FROM range(10)") // v0
      (0 until 3).foreach(i => s.sql(
        s"INSERT INTO graft.db.t VALUES (${100 + i})"))      // v1..v3
      val dir = s"$wh/db/t"
      def lines(name: String): Seq[String] = {
        val p = java.nio.file.Paths.get(dir, "_manifest", name)
        val src = scala.io.Source.fromFile(p.toFile, "UTF-8")
        try src.getLines().toList finally src.close()
      }
      val head = Versioned.latestVersion(s, dir).get
      val rawBefore = lines(f"v$head%05d.txt")
      assert(rawBefore.exists(_.startsWith("#base\t")),
        "fixture: the head must start as a delta")
      val folded = s.sql("CALL graft.system.checkpoint('db.t')")
        .collect()
      assert(folded.head.getBoolean(0))
      // the committed log entry is IMMUTABLE: the fold lands as a
      // separate sidecar file, never a rewrite of the manifest
      assert(lines(f"v$head%05d.txt") == rawBefore,
        "checkpoint must not mutate the committed manifest file")
      val sidecar = lines(f"v$head%05d.ckpt.txt")
      assert(!sidecar.exists(_.startsWith("#base\t")),
        "the sidecar must be a full snapshot")
      assert(Versioned.latestVersion(s, dir).contains(3),
        "checkpoint must not publish a new version")
      assert(s.table("graft.db.t").count() == 13)
      assert(s.sql("SELECT * FROM graft.db.t VERSION AS OF 1")
        .count() == 11, "history must survive the fold")
      // idempotent: a folded head has nothing left to fold
      assert(!s.sql("CALL graft.system.checkpoint('db.t')")
        .collect().head.getBoolean(0))
      // a corrupt/deleted sidecar degrades to the intact delta chain
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir,
        "_manifest", f"v$head%05d.ckpt.txt"))
      assert(s.table("graft.db.t").count() == 13,
        "readers must fall back to the delta chain when the " +
          "sidecar is gone")
    }
  }

  test("CALL pin holds a version against expire until CALL unpin " +
      "releases it") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.p AS SELECT id FROM range(10)") // v0
      s.sql("INSERT INTO graft.db.p VALUES (100)")                 // v1
      s.sql("INSERT INTO graft.db.p VALUES (200)")                 // v2
      val dir = s"$wh/db/p"
      // a pure-SQL consumer pins v0 before a long read
      val pinned = s.sql("CALL graft.system.pin('db.p', version => 0)")
        .head()
      val pinId = pinned.getString(0)
      assert(pinned.getInt(1) == 0)
      // retention honors the SQL-taken pin: nothing drops
      assert(s.sql("CALL graft.system.expire('db.p', 1)").head()
        .getInt(0) == 0, "expire must honor the SQL-taken pin")
      assert(Versioned.read(s, dir, Some(0)).count() == 10)
      // release and retry: old versions now collectable
      assert(s.sql(s"CALL graft.system.unpin('db.p', '$pinId')")
        .head().getBoolean(0))
      assert(s.sql("CALL graft.system.expire('db.p', 1)").head()
        .getInt(0) == 2)
      intercept[Exception](Versioned.read(s, dir, Some(0)).count())
      // idempotent: a second unpin reports nothing removed
      assert(!s.sql(s"CALL graft.system.unpin('db.p', '$pinId')")
        .head().getBoolean(0))
    }
  }
}
