package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.warehouse.{Merge, Warehouse}

/** Warehouse load strategies: MG1 idempotence, MG2 SCD1 semantics
  * (transf.py:215-273, 329-362), DDL.
  */
class WarehouseSpec extends SparkSuite {
  import spark.implicits._

  private val dimSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("fecha_actualizacion_origen", DateType),
    StructField("fecha_actualizacion", DateType)))

  test("ensureTable / truncate / appendInto") {
    Warehouse.ensureDatabase(spark, "wtest")
    Warehouse.ensureTable(spark, "wtest.dim", dimSchema)
    assert(spark.table("wtest.dim").isEmpty)
    val row = Seq((1L, "x")).toDF("id", "name")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2025-01-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2025-01-01")))
    // shuffled column order must still land by name
    Warehouse.appendInto(spark, "wtest.dim",
      row.select("fecha_actualizacion", "name", "id", "fecha_actualizacion_origen"))
    assert(spark.table("wtest.dim").head.getLong(0) == 1L)
    Warehouse.truncate(spark, "wtest.dim")
    assert(spark.table("wtest.dim").isEmpty)
  }

  test("insertIfAbsent is idempotent on the composite key (MG1)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS wtest")
    spark.sql("DROP TABLE IF EXISTS wtest.fact")
    Warehouse.ensureTable(spark, "wtest.fact", StructType(Seq(
      StructField("date", StringType), StructField("time", StringType),
      StructField("temp", DoubleType))))
    val batch = Seq(("30/11/2023", "11:00", 24.3), ("30/11/2023", "11:15", 24.5))
      .toDF("date", "time", "temp")
    assert(Warehouse.insertIfAbsent(spark, "wtest.fact", batch,
      Seq("date", "time")) == 2)
    // replay: nothing inserted (idempotent fact load, README.md:86)
    assert(Warehouse.insertIfAbsent(spark, "wtest.fact", batch,
      Seq("date", "time")) == 0)
    val overlapping = Seq(("30/11/2023", "11:15", 99.9), ("30/11/2023", "11:30", 24.7))
      .toDF("date", "time", "temp")
    assert(Warehouse.insertIfAbsent(spark, "wtest.fact", overlapping,
      Seq("date", "time")) == 1)
    // matched row was NOT updated (insert-if-absent, not upsert)
    assert(spark.table("wtest.fact")
      .filter($"time" === "11:15").head.getDouble(2) == 24.5)
  }

  test("scd1Upsert: stage wins, origin date preserved, new keys inserted (MG2)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS wtest")
    spark.sql("DROP TABLE IF EXISTS wtest.dim2")
    Warehouse.ensureTable(spark, "wtest.dim2", dimSchema)
    def dim(rows: Seq[(Long, String, String, String)]) =
      rows.toDF("id", "name", "o", "a")
        .select($"id", $"name", to_date($"o").as("fecha_actualizacion_origen"),
          to_date($"a").as("fecha_actualizacion"))
    Warehouse.appendInto(spark, "wtest.dim2",
      dim(Seq((1L, "old", "2025-01-01", "2025-01-01"),
              (2L, "keep", "2025-01-01", "2025-01-01"))))
    Warehouse.scd1Upsert(spark, "wtest.dim2",
      dim(Seq((1L, "new", "2026-08-01", "2026-08-01"),
              (3L, "ins", "2026-08-01", "2026-08-01"))),
      key = "id", auditDate = to_date(lit("2026-08-12")))
    val out = spark.table("wtest.dim2").orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "new") // SCD1 overwrite
    assert(out(0).getDate(2).toString == "2025-01-01") // origin preserved (ref bug fixed)
    assert(out(0).getDate(3).toString == "2026-08-12") // audit = merge date
    assert(out(1).getString(1) == "keep") // unmatched target intact
    assert(out(1).getDate(3).toString == "2025-01-01")
    assert(out(2).getString(1) == "ins") // new key inserted
    assert(out(2).getDate(2).toString == "2026-08-01") // origin from stage
  }

  test("jdbcAppend / jdbcRead round-trip against in-process Derby (S9/S10)") {
    // Embedded Derby (on Spark's classpath) stands in for the reference's
    // PostgreSQL (main.py:392-416): the same spark.write.jdbc /
    // spark.read.jdbc path, chunked at the reference's 1000 rows, with no
    // network — closes the round-2 "JDBC wrappers unexercised" gap.
    System.setProperty("derby.system.home", tmpDir())
    val url = s"jdbc:derby:memory:graftwh${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val df = spark.range(0, 2500) // > 2 batches at batchsize=1000
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
    Warehouse.jdbcAppend(df, url, "t_jdbc", props, batchSize = 1000)
    val back = Warehouse.jdbcRead(spark, url, "t_jdbc", props)
    assert(back.count() == 2500)
    assert(back.agg(sum("id")).head.getLong(0) == 2500L * 2499 / 2)
    assert(back.filter(col("id") === 7).head.getString(1) == "v7")

    // SaveMode.Append accumulates rather than replacing
    Warehouse.jdbcAppend(df.limit(10), url, "t_jdbc", props)
    assert(Warehouse.jdbcRead(spark, url, "t_jdbc", props).count() == 2510)
  }

  test("scd1UpsertPartitioned rewrites only affected partitions (MG2 at scale)") {
    val dir = tmpDir() + "/dimpart"
    val tbl = "wtest_part.dim"
    spark.sql("CREATE DATABASE IF NOT EXISTS wtest_part")
    Seq((1L, "a", "AR"), (2L, "b", "AR"), (3L, "c", "BR"), (4L, "d", "UY"))
      .toDF("id", "name", "country")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2025-01-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2025-01-01")))
      .write.partitionBy("country").option("path", dir).saveAsTable(tbl)

    def files(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/country=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val brBefore = files("BR")
    val uyBefore = files("UY")

    // stage touches AR (update id=2) and BR (new id=5); UY must not move
    val stage = Seq((2L, "b2", "AR"), (5L, "e", "BR"))
      .toDF("id", "name", "country")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2026-08-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2026-08-01")))
    val audit = to_date(lit("2026-08-12"))
    Warehouse.scd1UpsertPartitioned(spark, tbl, stage, "id", "country",
      auditDate = audit)

    val out = spark.table(tbl).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val r2 = out(1)
    assert(r2.getString(1) == "b2") // stage wins
    assert(r2.getAs[java.sql.Date]("fecha_actualizacion_origen").toString
      == "2025-01-01") // origin preserved on match
    assert(r2.getAs[java.sql.Date]("fecha_actualizacion").toString
      == "2026-08-12")
    // BR was rewritten (new key), UY files are byte-for-byte untouched
    assert(files("BR") != brBefore)
    assert(files("UY") == uyBefore)

    // convergence: replaying the same stage leaves the table identical
    Warehouse.scd1UpsertPartitioned(spark, tbl, stage, "id", "country",
      auditDate = audit)
    assert(spark.table(tbl).orderBy("id").collect().toSeq == out.toSeq)
  }

  test("Merge.scd1 converges: applying the same stage twice equals once") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2025-01-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2025-01-01")))
    val stage = Seq((2L, "b2"), (3L, "c")).toDF("id", "name")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2026-08-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2026-08-01")))
    val audit = to_date(lit("2026-08-12"))
    val once = Merge.scd1(target, stage, "id", auditDate = audit)
    val twice = Merge.scd1(once, stage, "id", auditDate = audit)
    assert(once.orderBy("id").collect().toSeq ==
      twice.orderBy("id").collect().toSeq)
  }

  test("Merge.scd1 probes the target once (single-scan plan)") {
    // round-3 review: the anti-join + origin-join formulation scanned the
    // target slice twice; the full-outer rewrite must scan it exactly once
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2025-01-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2025-01-01")))
      .write.mode("overwrite").parquet(dir)
    val target = spark.read.parquet(dir)
    val stage = Seq((2L, "b2"), (3L, "c")).toDF("id", "name")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2026-08-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2026-08-01")))
    val merged = Merge.scd1(target, stage, "id",
      auditDate = to_date(lit("2026-08-12")))
    val plan = merged.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted explain prints each node once in the tree and once in the
    // numbered detail section — count only the detail headers
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).size
    assert(scans == 1, s"expected one target scan, got $scans in:\n$plan")
    // null-keyed stage rows surface as inserts (never equi-join, must not
    // collapse into all-null target columns)
    val nullStage = Seq((Option.empty[java.lang.Long], "nk")).toDF("id", "name")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2026-08-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2026-08-01")))
    val withNull = Merge.scd1(target, nullStage, "id",
      auditDate = to_date(lit("2026-08-12"))).collect()
    assert(withNull.length == 3 &&
      withNull.exists(r => r.isNullAt(0) && r.getString(1) == "nk"))
  }

  test("Merge.scd1 survives a stage column literally named 'present'") {
    // the presence flag is derived fresh against the stage columns: a
    // fixed "__s_present" name would silently overwrite the renamed user
    // column with `true` on every row (round-4 review)
    val target = Seq((1L, "a", false), (2L, "b", true))
      .toDF("id", "name", "present")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2025-01-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2025-01-01")))
    val stage = Seq((2L, "b2", false), (3L, "c", false))
      .toDF("id", "name", "present")
      .withColumn("fecha_actualizacion_origen", to_date(lit("2026-08-01")))
      .withColumn("fecha_actualizacion", to_date(lit("2026-08-01")))
    val out = Merge.scd1(target, stage, "id",
        auditDate = to_date(lit("2026-08-12")))
      .orderBy("id").collect()
    // matched + inserted rows must take the STAGE's present=false, not a
    // leaked literal true; unmatched target row keeps its own value
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, false), (2L, false), (3L, false)))
  }

  test("Merge.scd2: close+open on change, no-op, insert, reappear, " +
      "history passthrough, null-key insert") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // k=1 history+current; k=2 current only; k=3 closed-only (reappears);
    // k=4 current (no-op match); k=5 current (no stage row)
    val target = Seq(
      (Option(1L), "a-v0", d("2024-01-01"), Option(d("2025-01-01"))),
      (Option(1L), "a-v1", d("2025-01-01"), Option.empty[java.sql.Date]),
      (Option(2L), "b-v0", d("2025-01-01"), Option.empty[java.sql.Date]),
      (Option(3L), "c-v0", d("2024-01-01"), Option(d("2025-01-01"))),
      (Option(4L), "d-v0", d("2025-01-01"), Option.empty[java.sql.Date]),
      (Option(5L), "e-v0", d("2025-01-01"), Option.empty[java.sql.Date]))
      .toDF("id", "name", "valid_from", "valid_to")
    val stage = Seq(
      (Option(1L), "a-v2"),            // changed → close + open
      (Option(3L), "c-v1"),            // closed key reappears → open
      (Option(4L), "d-v0"),            // identical → no-op
      (Option(6L), "f-v0"),            // brand-new → open
      (Option.empty[Long], "nk"))      // null key → open
      .toDF("id", "name")
    val load = to_date(lit("2026-08-13"))
    val out = Merge.scd2(target, stage, "id", Seq("name"), load)
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString)))
      .sortBy(t => (t._1.getOrElse(Long.MaxValue), t._3))
    assert(out.toSeq == Seq(
      (Option(1L), "a-v0", "2024-01-01", Option("2025-01-01")), // history
      (Option(1L), "a-v1", "2025-01-01", Option("2026-08-13")), // closed
      (Option(1L), "a-v2", "2026-08-13", None),                 // opened
      (Option(2L), "b-v0", "2025-01-01", None),                 // untouched
      (Option(3L), "c-v0", "2024-01-01", Option("2025-01-01")), // history
      (Option(3L), "c-v1", "2026-08-13", None),                 // reappear
      (Option(4L), "d-v0", "2025-01-01", None),                 // no-op
      (Option(5L), "e-v0", "2025-01-01", None),                 // untouched
      (Option(6L), "f-v0", "2026-08-13", None),                 // insert
      (None, "nk", "2026-08-13", None)))                        // null key
  }

  test("Merge.scd2 is idempotent: re-applying the same stage changes " +
      "nothing") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val target = Seq(
      (1L, "a-v1", d("2025-01-01"), Option.empty[java.sql.Date]),
      (2L, "b-v0", d("2025-01-01"), Option.empty[java.sql.Date]))
      .toDF("id", "name", "valid_from", "valid_to")
    val stage = Seq((1L, "a-v2"), (3L, "c-v0")).toDF("id", "name")
    val load = to_date(lit("2026-08-13"))
    val once = Merge.scd2(target, stage, "id", Seq("name"), load)
    val twice = Merge.scd2(once, stage, "id", Seq("name"), load)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("Merge.scd2 probes the target once (single-scan plan)") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val target = Seq((1L, "a", d("2025-01-01"), Option.empty[java.sql.Date]))
      .toDF("id", "name", "valid_from", "valid_to")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/tmp/graft-scd2-scan"))
    target.write.mode("overwrite").parquet("/tmp/graft-scd2-scan/t")
    val tgt = spark.read.parquet("/tmp/graft-scd2-scan/t")
    val stage = Seq((1L, "a2")).toDF("id", "name")
    val plan = Merge.scd2(tgt, stage, "id", Seq("name"),
      to_date(lit("2026-08-13"))).queryExecution.executedPlan.toString
    val scans = "graft-scd2-scan/t".r.findAllIn(plan).length
    assert(scans == 1, s"expected one target scan, got $scans:\n$plan")
  }

  test("dropGraftDatabases + sweepOrphanGraftDirs clear graft churn " +
      "and leave everything else") {
    import spark.implicits._
    // this run's catalog-registered database, with a managed table
    Warehouse.ensureDatabase(spark, "graft_q998")
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite")
      .saveAsTable("graft_q998.t")
    // a non-graft database that must survive
    Warehouse.ensureDatabase(spark, "wjanitor_keep")
    // an orphan directory no catalog knows (a previous JVM's corpse)
    val root = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(root, "graft_q999.db")
    fs.mkdirs(orphan)
    Warehouse.dropGraftDatabases(spark)
    Warehouse.sweepOrphanGraftDirs(spark)
    assert(!spark.catalog.databaseExists("graft_q998"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "graft_q998.db")),
      "dropped database directory must be removed")
    assert(!fs.exists(orphan), "orphan graft dir must be swept")
    assert(spark.catalog.databaseExists("wjanitor_keep"),
      "non-graft databases must survive the janitor")
    spark.sql("DROP DATABASE IF EXISTS wjanitor_keep CASCADE")
  }
}
