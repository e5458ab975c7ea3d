package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.lake.Versioned

/** `graft.schema.enforce` — Delta's schema enforcement as an opt-in
  * policy on this auto-evolving substrate: a declared table refuses
  * IMPLICIT schema evolution (a writer frame carrying columns the
  * schema does not declare — the typo'd-upstream-field drift that
  * silently pollutes a fleet-scale table), while the DECLARED route
  * (ALTER TABLE … ADD COLUMNS) stays open, missing columns still
  * null-fill, and a REPLACE keeps its schema authority. The contract
  * is named as the `schema-enforce` WRITER feature, so a foreign
  * writer knows what it must honor.
  */
class VersionedSchemaEnforceSpec extends SparkSuite {
  import spark.implicits._

  test("enforcement refuses implicit new columns on append AND " +
      "merge, names the columns and the declared route; subset " +
      "frames still null-fill; UNSET restores auto-evolution") {
    val dir = tmpDir() + "/enforce"
    Versioned.commit(spark, dir,
      (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s"))       // v0
    Versioned.setPolicy(spark, dir, schemaEnforce = Some(true))  // v1
    // the implicit-drift frame: one typo'd column
    val drifted = Seq((9L, "x", "oops")).toDF("id", "s", "scroe")
    val eA = intercept[Exception] {
      Versioned.commit(spark, dir, drifted)
    }
    assert(eA.getMessage.contains("scroe") &&
      eA.getMessage.contains("ADD COLUMNS"), eA.getMessage)
    val eM = intercept[Exception] {
      Versioned.mergeInto(spark, dir, drifted, Seq("id"))
    }
    assert(eM.getMessage.contains("scroe"), eM.getMessage)
    assert(Versioned.read(spark, dir).count() == 5,
      "refused frames must publish nothing")
    // declared-schema writes keep working: exact and SUBSET frames
    Versioned.commit(spark, dir, Seq((5L, "r5")).toDF("id", "s"))
    Versioned.commit(spark, dir, Seq(6L).toDF("id")) // null-fills s
    Versioned.mergeInto(spark, dir,
      Seq((0L, "R0")).toDF("id", "s"), Seq("id"))
    assert(Versioned.read(spark, dir).count() == 7)
    // the contract names itself in the writer gate
    val head = Versioned.latestVersion(spark, dir).get
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        dir, "_manifest", f"v$head%05d.txt"))).asScala
    assert(lines.contains("#schemaenforce\t1"), lines)
    assert(lines.contains("#writerfeature\tschema-enforce"), lines)
    // UNSET: auto-evolution returns (and the gate lifts)
    Versioned.setPolicy(spark, dir, schemaEnforce = Some(false))
    Versioned.commit(spark, dir,
      Seq((10L, "r10", 1.0)).toDF("id", "s", "score"))
    assert(Versioned.read(spark, dir).columns.toSeq ==
      Seq("id", "s", "score"))
    val head2 = Versioned.latestVersion(spark, dir).get
    assert(!scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        dir, "_manifest", f"v$head2%05d.txt"))).asScala
      .exists(_.startsWith("#schemaenforce")))
  }

  test("the DECLARED route and REPLACE stay open under enforcement; " +
      "the SQL surface declares and honors it end-to-end") {
    withCatalogSession { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.e (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.schema.enforce'='true')")
      s.sql("INSERT INTO graft.db.e VALUES (1, 'a')")
      val dir = s"$wh/db/e"
      // the Scala writer's drifted frame refuses against the
      // SQL-declared policy
      val e = intercept[Exception] {
        Versioned.commit(s, dir,
          s.range(1).selectExpr("id", "'x' AS v", "'y' AS typo"))
      }
      assert(e.getMessage.contains("typo"), e.getMessage)
      // ALTER TABLE … ADD COLUMNS is the declared route — allowed
      s.sql("ALTER TABLE graft.db.e ADD COLUMNS (score BIGINT)")
      assert(s.table("graft.db.e").columns.toSeq ==
        Seq("id", "v", "score"))
      s.sql("INSERT INTO graft.db.e VALUES (2, 'b', 10)")
      assert(s.table("graft.db.e").count() == 2)
      // a REPLACE (INSERT OVERWRITE) claims schema authority — exempt
      Versioned.commit(s, dir,
        s.range(1).selectExpr("id AS k2", "'z' AS w"), replace = true)
      assert(Versioned.read(s, dir).columns.toSeq == Seq("k2", "w"))
      // SHOW TBLPROPERTIES and CALL detail surface the declaration
      s.sql("ALTER TABLE graft.db.e UNSET TBLPROPERTIES " +
        "('graft.schema.enforce')")
      s.sql("ALTER TABLE graft.db.e SET TBLPROPERTIES " +
        "('graft.schema.enforce'='true')")
      assert(s.sql("SHOW TBLPROPERTIES graft.db.e").collect()
        .exists(r => r.getString(0) == "graft.schema.enforce" &&
          r.getString(1) == "true"))
      val d = s.sql("CALL graft.system.detail('db.e')").head()
      val colIdx = d.schema.fieldNames.zipWithIndex.toMap
      assert(d.getBoolean(colIdx("schema_enforce")))
      assert(d.getString(colIdx("writer_features"))
        .split(',').contains("schema-enforce"))
    }
  }
}
