package graft

import org.apache.spark.sql.functions._

import graft.functions.TopK

/** TopKByScore — the bounded-heap TypedImperativeAggregate behind every
  * similarity top-k. Checked against the window-function formulation it
  * replaces (must be row-identical), across partitions (exercises
  * update/merge/serialize), and for plan shape (ObjectHashAggregate with
  * a partial phase; no Window node).
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  test("top_k_by_score equals the row_number window formulation") {
    // 4 keys x 250 rows over 4 partitions; scores engineered with ties
    val df = spark.range(0, 1000, 1, 4)
      .select((col("id") % 4).as("probe_id"), col("id").as("cand_id"),
        (col("id") % 7).cast("double").as("score"))
    val viaAgg = df.groupBy("probe_id")
      .agg(TopK.topKByScore(col("score"), col("cand_id"), 5).as("t"))
      .select(col("probe_id"), posexplode(col("t")).as(Seq("i", "e")))
      .select(col("probe_id"), (col("i") + 1).as("rank"),
        col("e.item").as("cand_id"), col("e.score").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("score").desc, col("cand_id").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("probe_id", "rank", "cand_id", "score")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("ties break on smallest item; fewer than k rows yield short arrays") {
    val df = Seq((1L, "b", 2.0), (1L, "a", 2.0), (1L, "c", 3.0),
      (2L, "z", 1.0)).toDF("k", "item", "score")
    val got = df.groupBy("k")
      .agg(TopK.topKByScore(col("score"), col("item"), 2).as("t"))
      .select(col("k"), col("t.item").as("items")).orderBy("k")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
    assert(got.toList == List(1L -> List("c", "a"), 2L -> List("z")))
  }

  test("string payloads survive buffer serialization across partitions") {
    // force many partitions so partial buffers are serialized + merged
    val df = spark.range(0, 400, 1, 8)
      .select(lit(0L).as("k"), concat(lit("doc-"),
        lpad(col("id").cast("string"), 4, "0")).as("item"),
        (col("id") % 10).cast("double").as("score"))
    val top = df.groupBy("k")
      .agg(TopK.topKByScore(col("score"), col("item"), 3).as("t"))
      .select(explode(col("t.item")).as("item"))
      .as[String].collect().toList
    // score 9 rows: ids 9, 19, 29, ... → smallest three doc strings win ties
    assert(top == List("doc-0009", "doc-0019", "doc-0029"))
  }

  // The property the round-10 stress probe measured flat to a 30×
  // corpus — probes (or the ≤ probes·k·expand shortlist) broadcast, the
  // corpus is scanned, never sorted for a join — pinned here so a size
  // estimate or hint regression can't silently re-plan any family
  // member as a sort-merge join (the q129 30× cliff, in a test).
  test("ANN family plan shape: small side broadcast, corpus never sorted") {
    val emb = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat)))
      .toDF("vec_id", "embedding").repartition(4)
    val probes = emb.filter($"vec_id" < 2)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val ann = planOf(graft.ext.Similarity.annTopK(probes, emb, k = 5,
      planes = 6))
    assert(ann.contains("BroadcastHashJoin") &&
      !ann.contains("SortMergeJoin") && !ann.contains("NestedLoop"))
    val quant = planOf(graft.ext.Similarity.quantizedTopK(probes, emb, k = 5))
    // the quantized scan IS a broadcast cross join (every probe scores
    // every code) — broadcast nested loop, never a CartesianProduct
    assert(quant.contains("BroadcastNestedLoopJoin") &&
      !quant.contains("SortMergeJoin") && !quant.contains("CartesianProduct"))
    val two = planOf(graft.ext.Similarity.twoStageTopK(probes, emb, k = 5))
    assert(two.contains("BroadcastHashJoin") &&
      !two.contains("SortMergeJoin") && !two.contains("CartesianProduct"))
    val idx = graft.ext.Similarity.IvfIndex.build(emb, nCentroids = 4)
    try {
      val ivf = planOf(idx.search(probes, k = 5, nProbe = 2))
      assert(ivf.contains("BroadcastHashJoin") &&
        !ivf.contains("SortMergeJoin") && !ivf.contains("CartesianProduct"))
    } finally idx.unpersist()
  }

  test("plan shape: partial ObjectHashAggregate, no Window, no global sort") {
    val emb = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat)))
      .toDF("vec_id", "embedding").repartition(4)
    val plan = graft.ext.Similarity
      .bruteForceTopK(emb.filter($"vec_id" < 2), emb, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
    // the aggregate must have a map-side partial phase
    assert(plan.contains("partial_top_k_by_score"))
  }
}
