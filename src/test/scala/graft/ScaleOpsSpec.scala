package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleOps

/** Skew/shuffle-shaping: salted ops must not change answers; bucketed
  * tables must join without an exchange.
  */
class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val li = (1L to 1000L).map(i =>
    (i, if (i % 10 == 0) 1L else i % 50, (i % 7).toDouble))
    .toDF("id", "key", "v")
  private lazy val dim = (0L until 50L).map(k => (k, s"name_$k"))
    .toDF("key", "name")

  test("saltedSum equals plain aggregate") {
    val salted = ScaleOps.saltedSum(li, Seq("key"), "v",
        salts = 8, saltSource = Seq("id"))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val plain = li.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin preserves join multiplicity and results") {
    val salted = ScaleOps.saltedJoin(li, dim, Seq("key"), salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect().toSeq
    val plain = li.join(dim, Seq("key"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect().toSeq
    assert(salted == plain)
  }

  test("asOf join: backward match, >= tie semantics, no-match null") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00")),
      (2L, 20L, ts("2024-01-01 09:00:00")) // no click before → null
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // exact tie with event 10
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 09:30:00"), 200L) // after left → not matched
    ).toDF("user_id", "click_ts", "click_id")
    val out = graft.ops.AsOfJoin
      .asOf(left, right, "user_id", "ts", "click_ts")
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(10L -> 100L, 11L -> 101L, 20L -> -1L))
  }

  test("asOfSliced equals asOf on a hot key spanning many slices") {
    import java.sql.Timestamp
    // one hot key with events across hours (many 10-min slices, incl.
    // left-only slices that need carry-in), one cold key, one no-match key
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val left = ((1L to 300L).map(i => (1L, i, ts(i))) ++
      Seq((2L, 901L, ts(5L)), (3L, 950L, ts(1L))))
      .toDF("user_id", "event_id", "ts")
    // right rows only every 37 min → most slices have no right row
    val right = ((1L to 8L).map(j => (1L, ts(j * 37L), j * 100L)) ++
      Seq((2L, ts(3L), 999L)))
      .toDF("user_id", "click_ts", "click_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.select("event_id", "click_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    val plain = run(graft.ops.AsOfJoin
      .asOf(left, right, "user_id", "ts", "click_ts"))
    val sliced = run(graft.ops.AsOfJoin
      .asOfSliced(left, right, "user_id", "ts", "click_ts", 600L))
    assert(sliced == plain)
    assert(plain(950L) == -1L && plain(901L) == 999L)
  }

  test("range join: boundary inclusion, bucket straddling, key isolation") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // == interval start
      (1L, 11L, ts("2024-01-01 10:10:00")), // == interval end
      (1L, 12L, ts("2024-01-01 10:11:00")), // just outside
      (2L, 20L, ts("2024-01-01 10:05:00"))  // other key, same times
    ).toDF("user_id", "event_id", "ts")
    val intervals = Seq(
      // straddles a 10-min bucket boundary (09:55 → 10:10)
      (1L, 100L, ts("2024-01-01 09:55:00"), ts("2024-01-01 10:10:00"))
    ).toDF("user_id", "iv_id", "win_start", "win_end")
    val got = graft.ops.RangeJoin.pointInInterval(points, intervals,
        "user_id", "ts", "win_start", "win_end", 10L * 60 * 1000000)
      .select("event_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 100L), (11L, 100L)))
  }

  test("zValue: exact Morton interleave, matches a reference loop") {
    // hand-computed: a=0b101 -> bits at 0,4 (1+16); b=0b011 -> bits at
    // 1,3 (2+8) => 27
    val one = Seq((5L, 3L)).toDF("a", "b")
      .select(ScaleOps.zValue(col("a"), col("b")).as("z"))
      .as[Long].head()
    assert(one == 27L)
    // reference interleave over deterministic pseudo-random pairs
    def ref(a: Long, b: Long): Long =
      (0 until 21).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val pairs = (1L to 200L).map(i =>
      ((i * 2654435761L) % (1L << 21), (i * 40503L) % (1L << 21)))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ScaleOps.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == ref(a, b), s"($a, $b)") }
    // locality: z-sorting clusters both dimensions — the max of either
    // coordinate over the first half of the z-order is far below the
    // global max (a plain (a,b) sort would leave b unclustered)
    val sorted = got.sortBy(_._3)
    val half = sorted.take(100)
    assert(half.map(_._1).max < (1L << 21) &&
      half.map(_._2).max <= sorted.map(_._2).max)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS btest")
    ScaleOps.writeBucketed(li, "btest.li_b", Seq("key"), 4)
    ScaleOps.writeBucketed(dim, "btest.dim_b", Seq("key"), 4)
    val joined = spark.table("btest.li_b")
      .join(spark.table("btest.dim_b"), Seq("key"))
    assert(joined.count() == li.join(dim, Seq("key")).count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be shuffle-free, got:\n$plan")
  }

  test("equiDepthBins: depths balanced to ±1, edges follow rank order") {
    // 10 rows, 3 bins → depths 4/3/3; bin 0 holds the TOP scores
    val rows = (1L to 10L).map(i => ("k", i, i.toDouble * 10))
      .toDF("key", "id", "score")
    val got = ScaleOps.equiDepthBins(rows, col("key"), "id", col("score"),
        nBins = 3, slices = 4, lo = 0.0, hi = 120.0)
      .orderBy("bin")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(
      ("k", 0L, 4L, 70.0, 100.0),
      ("k", 1L, 3L, 40.0, 60.0),
      ("k", 2L, 3L, 10.0, 30.0)))
  }

  test("IncrementalAgg: fold-forward merge equals direct totals") {
    import graft.ops.IncrementalAgg
    val day1 = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v")
      .withColumn("d", lit("2026-01-01"))
    val day2 = Seq(("a", 30L), ("b", 1L)).toDF("k", "v")
      .withColumn("d", lit("2026-01-02"))
    val day3 = Seq(("a", 2L), ("c", 7L)).toDF("k", "v")
      .withColumn("d", lit("2026-01-03"))
    def direct(days: org.apache.spark.sql.DataFrame*) =
      days.reduce(_ unionByName _).groupBy(col("k").as("key"))
        .agg(count("v").as("cnt"), sum("v").as("sum"),
          min("v").as("min"), max("v").as("max"))
        .withColumn("avg",
          col("sum").cast("double") / col("cnt").cast("double"))
        .orderBy("key").collect().toSeq
    def parts(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.partials(df, col("d"), col("k"), col("v"))
    // (1) merge of two days' partials == direct totals over both days
    val merged12 = IncrementalAgg.mergeTotals(parts(day1).unionByName(parts(day2)))
    assert(merged12.orderBy("key").collect().toSeq == direct(day1, day2))
    // (2) fold-forward: yesterday's merged totals re-enter the merge as
    // one more state alongside today's partial — no history rescan
    val folded = IncrementalAgg.mergeTotals(
      merged12.select("key", "cnt", "sum", "min", "max")
        .unionByName(parts(day3).drop("slice")))
    assert(folded.orderBy("key").collect().toSeq ==
      direct(day1, day2, day3))
  }

  test("refreshByDiff: carry + re-agg equals direct totals, incl. deletions") {
    import graft.ops.IncrementalAgg
    val old = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)).toDF("k", "v")
    // new state: key 1's min row removed (min must recompute), key 2
    // deleted entirely (group must vanish), key 4 added; key 3 untouched
    val nw = Seq((1L, 20L), (3L, 7L), (4L, 9L)).toDF("k", "v")
    val totals0 = IncrementalAgg.totals(old, col("k"), col("v"))
    val affected = Seq(1L, 2L, 4L).toDF("k") // from the diff, old+new keys
    val got = IncrementalAgg.refreshByDiff(totals0, nw, affected,
        col("k"), col("v"))
      .orderBy("key").collect().toSeq
    val direct = IncrementalAgg.totals(nw, col("k"), col("v"))
      .orderBy("key").collect().toSeq
    assert(got == direct)
    // and the untouched group's totals row really is carried, not recomputed:
    // feeding a poisoned new snapshot for key 3 must NOT change its row
    val poisoned = nw.withColumn("v",
      when(col("k") === 3L, lit(999L)).otherwise(col("v")))
    val carried = IncrementalAgg.refreshByDiff(totals0, poisoned, affected,
        col("k"), col("v"))
      .filter(col("key") === 3L).collect().toSeq
    assert(carried == totals0.filter(col("key") === 3L).collect().toSeq)
  }

  test("refreshByDiff plan (q115): every re-aggregation is LeftSemi-" +
      "gated to affected keys; untouched totals carried via LeftAnti") {
    import graft.ops.IncrementalAgg
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val old = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("k", "v")
    val nw = Seq((1L, 20L), (3L, 7L), (4L, 9L)).toDF("k", "v")
    // materialize the stored totals: the refresh plan under inspection
    // must contain ONLY the refresh's own operators
    val totals0 = IncrementalAgg.totals(old, col("k"), col("v"))
      .localCheckpoint(true)
    val affected = Seq(1L, 2L, 4L).toDF("k")
    val plan = IncrementalAgg.refreshByDiff(totals0, nw, affected,
      col("k"), col("v")).queryExecution.optimizedPlan
    // carry path: stored totals leave through an anti join, never an agg
    assert(plan.collect { case j: Join if j.joinType == LeftAnti => j }
      .nonEmpty, s"no LeftAnti carry path:\n$plan")
    // O(delta) contract: any Aggregate that actually aggregates (has agg
    // functions — the key-list distinct has none) must sit above the
    // LeftSemi gate, i.e. it only ever sees affected keys' rows
    val unGated = plan.collect {
      case a: Aggregate
        if a.aggregateExpressions.exists(_.collectFirst {
            case ae: AggregateExpression => ae
          }.nonEmpty) &&
          a.collect { case j: Join if j.joinType == LeftSemi => j }.isEmpty
        => a
    }
    assert(unGated.isEmpty,
      s"re-aggregation outside the LeftSemi gate (full-scan refresh):\n" +
        unGated.mkString("\n"))
  }

  test("rollingTimeAgg: trailing RANGE window includes boundary, " +
      "expires old rows, and treats time-ties as peers") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(30), 2.0), (1L, ts(60), 4.0),
      (1L, ts(100), 8.0),
      (2L, ts(50), 1.0), (2L, ts(50), 2.0) // exact tie: peers
    ).toDF("user_id", "ts", "value")
    val got = ScaleOps.rollingTimeAgg(df, col("user_id"), col("ts"),
        col("value"), windowSec = 60L)
      .orderBy("key", "t_us", "window_events").collect()
    val u1 = got.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    // t=0: {1}; t=30: {1,2}; t=60: {1,2,4} (boundary INCLUDED);
    // t=100: {4,8} (t=0 and t=30 expired)
    assert(u1 == Seq((100L, 1L), (300L, 2L), (700L, 3L), (1200L, 2L)))
    // tied timestamps are peers: BOTH rows see the combined frame
    val u2 = got.filter(_.getLong(0) == 2L)
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(u2 == Seq((300L, 2L), (300L, 2L)))
  }
}
