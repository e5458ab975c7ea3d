package graft

import org.apache.spark.sql.functions._

import graft.lake.Versioned

/** Round-18 named tags ([[Versioned.tag]]): durable, time-travel-
  * addressable refs over the pin substrate — `VERSION AS OF
  * 'release-v3'`, a retention floor expire honors, history rendering,
  * by-ref change feeds, and restore semantics (the tag keeps naming
  * the version it was minted at).
  */
class VersionedTagsSpec extends SparkSuite {
  import spark.implicits._

  private def rows(lo: Int, hi: Int, tag: String) =
    (lo until hi).map(i => (i.toLong, tag)).toDF("id", "s")

  test("tag/untag/tags/resolveRef: durable named refs, numeric and " +
      "malformed names refused, re-tagging refused until untag") {
    val dir = tmpDir() + "/tags"
    Versioned.commit(spark, dir, rows(0, 10, "v0"))
    Versioned.commit(spark, dir, rows(10, 20, "v1"))
    assert(Versioned.tag(spark, dir, "release-v1") == 1) // default head
    assert(Versioned.tag(spark, dir, "audit.q3", Some(0)) == 0)
    assert(Versioned.tags(spark, dir).as[(String, Int)]
      .collect().toSeq == Seq(("audit.q3", 0), ("release-v1", 1)))
    assert(Versioned.resolveRef(spark, dir, "audit.q3") == 0)
    assert(Versioned.resolveRef(spark, dir, "7") == 7) // bare int verbatim
    // a moved tag is the reproducibility bug tags prevent
    val dup = intercept[IllegalArgumentException](
      Versioned.tag(spark, dir, "release-v1", Some(0)))
    assert(dup.getMessage.contains("untag first"))
    assert(Versioned.untag(spark, dir, "release-v1"))
    assert(!Versioned.untag(spark, dir, "release-v1")) // idempotent
    assert(Versioned.tag(spark, dir, "release-v1", Some(0)) == 0)
    // names that would collide with integer time travel refuse
    intercept[IllegalArgumentException](Versioned.tag(spark, dir, "3"))
    intercept[IllegalArgumentException](
      Versioned.tag(spark, dir, "../escape"))
    val missing = intercept[IllegalArgumentException](
      Versioned.resolveRef(spark, dir, "nope"))
    assert(missing.getMessage.contains("release-v1"),
      "the miss must name the declared tags")
    // tagging a version that never existed refuses
    intercept[IllegalArgumentException](
      Versioned.tag(spark, dir, "future", Some(99)))
  }

  test("expire treats tagged versions as a durable floor; untag " +
      "releases it") {
    val dir = tmpDir() + "/tag-expire"
    (0 until 5).foreach(i =>
      Versioned.commit(spark, dir, rows(i * 10, i * 10 + 10, s"v$i")))
    Versioned.tag(spark, dir, "keep-me", Some(1))
    val (dropped, _) = Versioned.expire(spark, dir, keepLast = 1)
    assert(dropped == 1, s"only v0 may drop under the tag floor: $dropped")
    // the tagged version still reads
    assert(Versioned.read(spark, dir, Some(1)).count() == 20)
    assert(Versioned.untag(spark, dir, "keep-me"))
    val (dropped2, _) = Versioned.expire(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
    assert(dropped2 == 3, s"untag must release the floor: $dropped2")
  }

  test("history renders tags per version; changesBetween accepts " +
      "refs; restore keeps the tag naming the ORIGINAL version") {
    val dir = tmpDir() + "/tag-hist"
    Versioned.commitWithStats(spark, dir, rows(0, 10, "a"), "id")  // v0
    Versioned.commit(spark, dir, rows(10, 20, "b"))                // v1
    Versioned.tag(spark, dir, "base", Some(0))
    Versioned.tag(spark, dir, "release", Some(1))
    Versioned.tag(spark, dir, "release-dup", Some(1))
    val hist = Versioned.history(spark, dir)
      .select("version", "tags").as[(Int, Seq[String])]
      .collect().toMap
    assert(hist(0) == Seq("base"))
    assert(hist(1) == Seq("release", "release-dup"))
    // by-ref change feed == by-version change feed
    val byRef = Versioned.changesBetween(spark, dir, "base", "release",
      Seq("id")).orderBy("id").collect().toSeq
    val byVer = Versioned.changesBetween(spark, dir, 0, 1, Seq("id"))
      .orderBy("id").collect().toSeq
    assert(byRef == byVer && byRef.size == 10)
    // restore v0 as a new head: the tag still names version 0, whose
    // content is what both the tag read and the restored head show
    val restored = Versioned.restore(spark, dir, 0)
    assert(restored == 2)
    assert(Versioned.tagVersion(spark, dir, "release").contains(1))
    val tagRead = Versioned.read(spark, dir,
      Versioned.tagVersion(spark, dir, "base")).orderBy("id")
      .collect().toSeq
    assert(tagRead == Versioned.read(spark, dir).orderBy("id")
      .collect().toSeq,
      "the restored head must equal what the tag names")
  }

  test("SQL route: CALL tag/tags/untag + SELECT … VERSION AS OF " +
      "'<name>' time-travels by tag through the catalog") {
    withCatalogSession() { (s, wh) =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.t AS SELECT id, 'x' AS s " +
        "FROM range(5)")
      s.sql("INSERT INTO graft.db.t SELECT id + 10, 'y' FROM range(5)")
      val r = s.sql("CALL graft.system.tag('db.t', 'v-first', " +
        "version => 0)").head()
      assert(r.getString(0) == "v-first" && r.getInt(1) == 0)
      s.sql("CALL graft.system.tag('db.t', 'v-second')") // head = 1
      assert(s.sql("SELECT count(*) FROM graft.db.t " +
        "VERSION AS OF 'v-first'").head().getLong(0) == 5L)
      assert(s.sql("SELECT count(*) FROM graft.db.t " +
        "VERSION AS OF 'v-second'").head().getLong(0) == 10L)
      // integer time travel is untouched
      assert(s.sql("SELECT count(*) FROM graft.db.t VERSION AS OF 0")
        .head().getLong(0) == 5L)
      assert(s.sql("CALL graft.system.tags('db.t')").collect()
        .map(r2 => (r2.getString(0), r2.getInt(1))).toSeq ==
        Seq(("v-first", 0), ("v-second", 1)))
      assert(s.sql("CALL graft.system.untag('db.t', 'v-first')")
        .head().getBoolean(0))
      val e = intercept[Exception](s.sql(
        "SELECT * FROM graft.db.t VERSION AS OF 'v-first'").collect())
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(t => Option(t.getMessage)
          .exists(_.contains("v-second"))),
        s"the miss must name the remaining tags: ${e.getMessage}")
    }
  }
}
