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
}
