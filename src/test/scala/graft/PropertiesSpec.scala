package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.transform.WeatherTransforms
import graft.warehouse.Merge

/** Property-based invariants (SURVEY.md §5.2): MG1 idempotence, MG2
  * convergence, dedup disjointness, datetime round-trips, cardinal
  * totality. Samples kept small — each property materializes Spark jobs.
  */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  /** Run a ScalaCheck property with a small sample count (each sample
    * materializes Spark jobs) and surface failures through ScalaTest.
    */
  private def check(prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withMaxSize(12),
      prop)
    assert(res.passed, res.status.toString)
  }

  // unique keys per frame (dropDuplicates keeps an ARBITRARY row, which
  // would make the test itself nondeterministic)
  private val keyedRows: Gen[List[(Long, String)]] =
    Gen.mapOf(Gen.zip(Gen.choose(0L, 8L), Gen.alphaStr.map(_.take(6))))
      .map(_.toList)

  test("MG1 insert-if-absent is idempotent and never duplicates keys") {
    check(Prop.forAll(keyedRows, keyedRows) { (t, s) =>
      val target = t.toDF("id", "v")
      val stage = s.toDF("id", "v")
      val once = target.unionByName(
        Merge.insertIfAbsent(target, stage, Seq("id")))
      // replay: nothing new
      assert(Merge.insertIfAbsent(once, stage, Seq("id")).isEmpty)
      // key set = union of key sets, no duplicates
      val keys = once.select("id").as[Long].collect().sorted.toSeq
      assert(keys == keys.distinct)
      assert(keys.toSet == (t.map(_._1) ++ s.map(_._1)).toSet)
      true
    })
  }

  test("MG2 SCD1 converges: same stage twice = once; stage wins on match") {
    check(Prop.forAll(keyedRows, keyedRows) { (t, s) =>
      val audit = to_date(lit("2026-08-12"))
      def withAudit(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("fecha_actualizacion_origen", to_date(lit("2025-01-01")))
        .withColumn("fecha_actualizacion", to_date(lit("2025-01-01")))
      val target = withAudit(t.toDF("id", "v"))
      val stage = withAudit(s.toDF("id", "v"))
      val once = Merge.scd1(target, stage, "id", auditDate = audit)
      val twice = Merge.scd1(once, stage, "id", auditDate = audit)
      val c1 = once.orderBy("id", "v").collect().toSeq
      val c2 = twice.orderBy("id", "v").collect().toSeq
      assert(c1 == c2)
      // every staged key carries the staged value
      val vals = once.select("id", "v").as[(Long, String)].collect().toMap
      s.toMap.foreach { case (k, _) =>
        assert(vals(k) == s.toMap.apply(k))
      }
      true
    })
  }

  test("anti-join dedup output is disjoint from previous keys") {
    check(Prop.forAll(keyedRows, keyedRows) { (prev, inc) =>
      val p = prev.toDF("id", "v")
      val i = inc.toDF("id", "v")
      val fresh = Merge.insertIfAbsent(p, i, Seq("id"))
        .select("id").as[Long].collect().toSet
      assert(fresh.intersect(prev.map(_._1).toSet).isEmpty)
      true
    })
  }

  test("fixed-offset shift round-trips; date format re-parses") {
    check(Prop.forAll(Gen.choose(0L, 4102444800L)) { epoch =>
      val df = Seq(epoch).toDF("e")
        .select(timestamp_seconds(col("e")).as("ts"))
      val r = df.select(
        (WeatherTransforms.shiftToLocalTime(col("ts")) +
          expr("INTERVAL 3 HOURS")).as("rt"),
        to_date(date_format(col("ts"), "dd/MM/yyyy"), "dd/MM/yyyy").as("d"),
        to_date(col("ts")).as("d0")).head
      assert(r.getTimestamp(0).getTime == epoch * 1000)
      assert(r.getDate(1) == r.getDate(2))
      true
    })
  }

  test("windCardinal is total over [0,360] with the 8 reference labels") {
    check(Prop.forAll(Gen.choose(0.0, 360.0)) { deg =>
      val c = Seq(deg).toDF("d")
        .select(WeatherTransforms.windCardinal(col("d"))).as[String].head()
      assert(Set("N", "NO", "W", "SE", "S", "SO", "E", "NE").contains(c))
      true
    })
  }
}
