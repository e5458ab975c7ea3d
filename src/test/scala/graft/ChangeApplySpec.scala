package graft

import org.apache.spark.sql.functions._

import graft.ops.ChangeApply

/** CDC log replay: last-writer-wins, tombstones, resurrection, plan shape. */
class ChangeApplySpec extends SparkSuite {
  import spark.implicits._

  private def log = Seq(
    // key 1: two upserts — later (seq 3) wins
    (1L, 1L, "U", "a", 1.0),
    (1L, 3L, "U", "b", 2.0),
    // key 2: upsert then delete — absent from snapshot
    (2L, 1L, "U", "c", 3.0),
    (2L, 2L, "D", "c", 3.0),
    // key 3: delete then re-insert (resurrection) — present
    (3L, 1L, "D", "", 0.0),
    (3L, 5L, "U", "d", 4.0),
    // key 4: single delete for a never-seen key — absent
    (4L, 1L, "D", "", 0.0)
  ).toDF("k", "seq", "op", "s", "v")

  test("last writer wins; deletes tombstone; re-inserts resurrect") {
    val got = ChangeApply.latestSnapshot(log, "k", Seq("seq"), "op",
        Seq("s", "v"))
      .orderBy("k").as[(Long, Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, "b", 2.0), (3L, 5L, "d", 4.0)))
  }

  test("composite seq: later (ts, id) wins within equal ts") {
    val l = Seq(
      (1L, 10L, 1L, "U", "x"),
      (1L, 10L, 2L, "U", "y"), // same ts, higher id — wins
      (1L, 9L, 9L, "U", "z")
    ).toDF("k", "ts", "id", "op", "s")
    val got = ChangeApply.latestSnapshot(l, "k", Seq("ts", "id"), "op",
        Seq("s"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 10L, 2L, "y")))
  }

  test("replay equals incremental application (prefix consistency)") {
    // applying the full log equals applying the first half, snapshotting,
    // and replaying (snapshot-as-upserts + second half): the algebraic
    // property that lets a pipeline checkpoint the compacted state
    val half1 = log.filter(col("seq") <= 2)
    val half2 = log.filter(col("seq") > 2)
    val snap1 = ChangeApply.latestSnapshot(half1, "k", Seq("seq"), "op",
      Seq("s", "v"))
    // carry the snapshot forward as upserts with its winning seq
    val replayed = ChangeApply.latestSnapshot(
      snap1.withColumn("op", lit("U")).select("k", "seq", "op", "s", "v")
        .unionByName(half2.select("k", "seq", "op", "s", "v")),
      "k", Seq("seq"), "op", Seq("s", "v"))
    val full = ChangeApply.latestSnapshot(log, "k", Seq("seq"), "op",
      Seq("s", "v"))
    assert(replayed.orderBy("k").collect().toSeq ==
      full.orderBy("k").collect().toSeq)
  }

  test("compactLog is a semilattice: any batch split compacts identically") {
    // includes the delete-then-older-upsert hazard: key 2's delete (seq
    // 2) in one batch, an OLDER upsert (seq 1) arriving in a later
    // batch — tombstone retention keeps it dead
    def compact(df: org.apache.spark.sql.DataFrame) =
      ChangeApply.compactLog(df, "k", Seq("seq"), "op", Seq("s", "v"))
    val full = compact(log).orderBy("k").collect().toSeq
    for (m <- 2 to 3) {
      val parts = (0 until m).map(i => log.filter(col("seq") % m === i))
      // fold batches incrementally through the compacted state
      val folded = parts.foldLeft(log.limit(0)) { (state, b) =>
        compact(state.unionByName(b))
      }
      assert(folded.orderBy("k").collect().toSeq == full, s"split mod $m")
    }
    // live view of the compacted state == latestSnapshot of the log
    assert(compact(log).filter(col("op") =!= "D").drop("op")
      .orderBy("k").collect().toSeq ==
      ChangeApply.latestSnapshot(log, "k", Seq("seq"), "op", Seq("s", "v"))
        .orderBy("k").collect().toSeq)
  }

  test("plan is an aggregate, not a window") {
    val plan = ChangeApply.latestSnapshot(log, "k", Seq("seq"), "op",
      Seq("s", "v")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window funnel in plan:\n$plan")
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"),
      s"expected aggregate plan:\n$plan")
  }

  test("empty seqCols rejected") {
    intercept[IllegalArgumentException] {
      ChangeApply.latestSnapshot(log, "k", Nil, "op", Seq("s"))
    }
  }
}
