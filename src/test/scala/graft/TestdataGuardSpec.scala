package graft

import org.apache.spark.sql.types._
import graft.queries.Q

/** Guard suite against the REAL driver testdata files — the hole round 8
  * fell through: all 231 synthetic-fixture specs passed while 6 driver
  * queries crashed, because the testdata had been regenerated with
  * `events.ts` re-encoded as TIMESTAMP_NTZ and nothing in `sbt test`
  * ever loaded the actual files. This suite pins the loader's canonical
  * POST-NORMALIZATION schema: a future re-encode that `Q.t` doesn't
  * absorb fails here, at test time, with the column named — not in the
  * driver's correctness gate.
  */
class TestdataGuardSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"
  private def available = java.nio.file.Files.exists(java.nio.file.Paths.get(dir))

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("testdata is present (set SPARK_GRAFT_NO_TESTDATA=1 to waive)") {
    // every other test here opens with assume(available) — correct for a
    // dev machine without the fixtures, but in the driver environment a
    // missing /root/testdata would silently cancel the ENTIRE drift
    // shield and `sbt test` would still report green. This one test
    // FAILS instead of cancelling, so "guard suite didn't run" is loud;
    // genuinely local dev opts out with the env var.
    if (sys.env.get("SPARK_GRAFT_NO_TESTDATA").contains("1")) cancel()
    assert(available,
      s"$dir is missing — the testdata guard suite cannot run, so schema " +
        "drift would reach the driver gate unseen. If this is a dev " +
        "machine without fixtures, set SPARK_GRAFT_NO_TESTDATA=1.")
  }

  test("every testdata table loads through Q.t with rows > 0") {
    assume(available)
    tables.foreach { name =>
      val n = Q.t(spark, dir, name).count()
      assert(n > 0, s"$name is empty")
    }
  }

  test("events.ts normalizes to canonical TimestampType") {
    assume(available)
    val events = Q.t(spark, dir, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"ts must normalize to TIMESTAMP, got ${events.schema("ts").dataType.sql}")
    // and the instants are sane: within [2020, 2040) — a re-encode that
    // shifted the epoch (e.g. seconds read as micros) lands far outside
    val bad = events.filter(
      org.apache.spark.sql.functions.year(org.apache.spark.sql.functions
        .col("ts")).isNull ||
      !org.apache.spark.sql.functions.year(org.apache.spark.sql.functions
        .col("ts")).between(2020, 2039)).count()
    assert(bad == 0, s"$bad events have ts outside [2020, 2040)")
  }

  test("time-family columns normalize to canonical TimestampType") {
    assume(available)
    for ((table, c) <- Seq("orders" -> "o_orderdate",
        "lineitem" -> "l_shipdate")) {
      val dt = Q.t(spark, dir, table).schema(c).dataType
      assert(dt == TimestampType,
        s"$table.$c must normalize to TIMESTAMP, got ${dt.sql}")
    }
  }

  test("filters on normalized time columns still push to the parquet scan") {
    assume(available)
    // the load-time NTZ→TIMESTAMP cast sits between the scan and every
    // time filter; Catalyst's UnwrapCastInBinaryComparison must strip it
    // so the comparison reaches PushedFilters in the file's own domain —
    // without this, every time-sliced read at 100 TB becomes a full scan
    import org.apache.spark.sql.functions._
    val plan = Q.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01"))
      .groupBy("l_returnflag").agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"),
      s"l_shipdate filter not pushed: ${pushed.take(500)}")
  }

  test("full canonical schema of every table is pinned") {
    assume(available)
    // the complete post-normalization surface the 136 queries assume —
    // ANY regeneration drift (renamed column, widened int, re-encoded
    // timestamp Q.normalizeTs doesn't absorb) fails here by name. If a
    // drift is benign, relax the pin deliberately, with the query
    // surface in view — never discover it through the driver gate.
    val expected = Map(
      "region" -> "r_regionkey:INT, r_name:STRING",
      "nation" -> "n_nationkey:INT, n_name:STRING, n_regionkey:INT",
      "customer" -> ("c_custkey:BIGINT, c_name:STRING, c_nationkey:INT, " +
        "c_acctbal:DOUBLE, c_mktsegment:STRING"),
      "supplier" -> ("s_suppkey:BIGINT, s_name:STRING, s_nationkey:INT, " +
        "s_acctbal:DOUBLE"),
      "part" -> ("p_partkey:BIGINT, p_name:STRING, p_brand:STRING, " +
        "p_type:STRING, p_size:INT, p_retailprice:DOUBLE"),
      "orders" -> ("o_orderkey:BIGINT, o_custkey:BIGINT, " +
        "o_orderstatus:STRING, o_totalprice:DOUBLE, " +
        "o_orderdate:TIMESTAMP, o_orderpriority:STRING"),
      "lineitem" -> ("l_orderkey:BIGINT, l_partkey:BIGINT, " +
        "l_suppkey:BIGINT, l_linenumber:INT, l_quantity:DOUBLE, " +
        "l_extendedprice:DOUBLE, l_discount:DOUBLE, l_tax:DOUBLE, " +
        "l_returnflag:STRING, l_linestatus:STRING, l_shipdate:TIMESTAMP"),
      "events" -> ("event_id:BIGINT, ts:TIMESTAMP, user_id:BIGINT, " +
        "event_type:STRING, value:DOUBLE, props:STRING"),
      "documents" -> ("doc_id:BIGINT, text:STRING, lang:STRING, " +
        "source:STRING, n_chars:BIGINT"),
      "embeddings" -> "vec_id:BIGINT, embedding:ARRAY<FLOAT>, label:INT")
    // all three scale factors: the driver verifies at sf0.01 and benches
    // at sf0.1 — a drift in EITHER must fail here, not there (schema
    // pins read parquet footers only, so this stays cheap)
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s")
      .filter(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
    for (d <- sfDirs; (table, exp) <- expected) {
      val got = Q.t(spark, d, table).schema.fields
        .map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")
      assert(got == exp, s"$d/$table schema drifted:\n  got $got\n  exp $exp")
    }
  }

  test("streamTable normalizes ts on the streaming read path too") {
    assume(available)
    // round 8 broke EXACTLY here: the batch loader was fixed reads ago
    // but the q37/q98 stream readers re-encoded ts by hand from the raw
    // file schema. Stream a copy of the real events file and assert the
    // streamed result used canonical TimestampType end-to-end.
    import org.apache.spark.sql.functions._
    val src = tmpDir()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val stream = Q.streamTable(spark, src)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType,
      s"streamed ts must be TIMESTAMP, got ${stream.schema("ts").dataType.sql}")
    val agg = stream.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("guard_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("guard_stream")
      .agg(sum("n")).collect()(0).getLong(0)
    val static = Q.t(spark, dir, "events").count()
    assert(streamed == static,
      s"streamed window counts cover $streamed of $static events")
  }

  test("every registered query has an oracle twin") {
    // the driver's strong (hash) gate only covers queries with BOTH a
    // queries entry and an oracleSql entry — a missing oracle silently
    // downgrades to a rows-only check
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracle: ${(q -- o).toSeq.sorted}; " +
      s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("embeddings.embedding is ArrayType(FloatType)") {
    assume(available)
    val dt = Q.t(spark, dir, "embeddings").schema("embedding").dataType
    assert(dt == ArrayType(FloatType, containsNull = true) ||
      dt == ArrayType(FloatType, containsNull = false),
      s"embedding must be ARRAY<FLOAT>, got ${dt.sql}")
  }

  test("key id columns keep integral types") {
    assume(available)
    val checks = Seq(
      ("events", "event_id"), ("events", "user_id"),
      ("documents", "doc_id"), ("embeddings", "vec_id"),
      ("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
      ("customer", "c_custkey"))
    checks.foreach { case (table, c) =>
      val dt = Q.t(spark, dir, table).schema(c).dataType
      assert(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"$table.$c must be integral, got ${dt.sql}")
    }
  }

  test("documents.text is non-null string content") {
    assume(available)
    val docs = Q.t(spark, dir, "documents")
    assert(docs.schema("text").dataType == StringType)
    import org.apache.spark.sql.functions._
    val nulls = docs.filter(col("text").isNull || length(col("text")) === 0)
      .count()
    assert(nulls == 0, s"$nulls documents have null/empty text")
  }
}
