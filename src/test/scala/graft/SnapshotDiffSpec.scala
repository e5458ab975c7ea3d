package graft

import org.apache.spark.sql.functions._

import graft.ops.SnapshotDiff

/** Snapshot diff (CDC): classification, null-safety, key handling. */
class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val nw = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = SnapshotDiff.diff(old, nw, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("null-safe compare: value<->null transitions are 'changed'") {
    val old = Seq((1L, Some(1.0)), (2L, None), (3L, None))
      .toDF("k", "v")
    val nw = Seq((1L, None), (2L, Some(2.0)), (3L, None))
      .toDF("k", "v")
    val got = SnapshotDiff.diff(old, nw, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    // 3 is null->null = unchanged; 1 and 2 flip nullness = changed
    assert(got == Seq(1L -> "changed", 2L -> "changed"))
  }

  test("key-only snapshots diff to added/removed presence changes") {
    val old = Seq(1L, 2L).toDF("k")
    val nw = Seq(2L, 3L).toDF("k")
    val got = SnapshotDiff.diff(old, nw, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq(1L -> "removed", 3L -> "added"))
  }

  test("composite keys compare per key tuple") {
    val old = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val nw = Seq((1L, "x", 9.0), (2L, "y", 2.0)).toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(old, nw, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "x", "changed"), (1L, "y", "removed"),
      (2L, "y", "added")))
  }

  test("mismatched schemas and empty keys are rejected") {
    val a = Seq((1L, 1.0)).toDF("k", "v")
    val b = Seq((1L, 1.0)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a, b, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a, a, Nil)
    }
  }

  test("invariants: diff(a,a) empty; diff(a,b) mirrors diff(b,a)") {
    // deterministic pseudo-random snapshots sharing ~2/3 of keys
    val a = (1L to 200L).filter(_ % 3 != 0)
      .map(k => (k, (k * 37) % 11, s"v${(k * 13) % 7}"))
      .toDF("k", "num", "s")
    val b = (1L to 200L).filter(_ % 5 != 0)
      .map(k => (k, (k * 37) % 11 + (k % 9) / 8, s"v${(k * 13) % 7}"))
      .toDF("k", "num", "s")
    assert(graft.ops.SnapshotDiff.diff(a, a, Seq("k")).isEmpty)
    val ab = graft.ops.SnapshotDiff.diff(a, b, Seq("k"))
      .as[(Long, String)].collect().toMap
    val ba = graft.ops.SnapshotDiff.diff(b, a, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(ab.keySet == ba.keySet)
    assert(ab.forall { case (k, c) => ba(k) == (c match {
      case "added" => "removed"
      case "removed" => "added"
      case other => other
    })})
    assert(ab.values.toSet == Set("added", "removed", "changed"))
  }

  test("CDC composition: reprocess only the delta, match full recompute") {
    // the operator's purpose — incremental reprocessing: fingerprint
    // only added/changed docs, carry the rest forward, equal the full
    // recompute of the new snapshot
    val old = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "kappa mu"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "alpha beta"), (2L, "gamma delta REVISED"),
      (4L, "nu xi")).toDF("doc_id", "text")
    val oldFp = old.withColumn("fp", graft.ext.Text.fingerprint($"text"))
    val delta = graft.ops.SnapshotDiff.diff(old, nw, Seq("doc_id"))
    val carried = oldFp.join(
      delta.filter($"change".isin("removed", "changed")).select("doc_id"),
      Seq("doc_id"), "left_anti")
    val reproc = nw.join(
      delta.filter($"change".isin("added", "changed")).select("doc_id"),
      Seq("doc_id"), "left_semi")
      .withColumn("fp", graft.ext.Text.fingerprint($"text"))
    val incremental = carried.unionByName(reproc)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val full = nw.withColumn("fp", graft.ext.Text.fingerprint($"text"))
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(incremental == full)
    // and the delta really was smaller than the table
    assert(delta.count() == 3) // changed 2, removed 3, added 4
  }

  test("plan shape: one equi full-outer join, no nested loop") {
    val a = Seq((1L, 1.0)).toDF("k", "v")
    val b = Seq((1L, 2.0)).toDF("k", "v")
    val plan = SnapshotDiff.diff(a, b, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
