package graft

import org.apache.spark.sql.functions._

import graft.ext.Packing

/** Greedy sequence packing: bins respect the budget (oversized docs
  * isolate), assignment matches a sequential reference fold, and the
  * result is invariant to input partitioning.
  */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def refPack(rows: Seq[(Long, Long, Long)], budget: Long) = {
    // sequential reference: per shard in id order
    rows.groupBy(_._1).toSeq.flatMap { case (shard, rs) =>
      var bin = -1L; var fill = 0L
      rs.sortBy(_._2).map { case (_, id, sz) =>
        if (bin < 0 || fill + sz > budget) { bin += 1; fill = 0L }
        fill += sz
        (shard, id, sz, bin, fill)
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("packing matches the sequential reference, incl. oversized docs") {
    val data = Seq(
      (0L, 1L, 100L), (0L, 2L, 100L), (0L, 3L, 100L), // 100+100 | 100
      (0L, 4L, 300L),                                 // oversized → own bin
      (0L, 5L, 10L),
      (1L, 6L, 256L), (1L, 7L, 1L),                   // exact fit | next
      (2L, 8L, 255L), (2L, 9L, 1L))                   // 255+1 exact fit
    val got = Packing.packGreedy(
        data.toDF("s", "i", "n"), "s", "i", "n", budget = 256L)
      .orderBy("shard", "id")
      .collect().map(p => (p.shard, p.id, p.n_tokens, p.bin, p.bin_fill))
    assert(got.toSeq == refPack(data, 256L))
    // oversized doc sits alone in its bin
    val binOf4 = got.find(_._2 == 4L).get._4
    assert(got.count(r => r._1 == 0L && r._4 == binOf4) == 1)
  }

  test("no bin exceeds the budget except oversized singletons") {
    val data = (1L to 500L).map(i => (i % 7, i, (i % 90) + 1))
    val packed = Packing.packGreedy(
        data.toDF("s", "i", "n"), "s", "i", "n", budget = 128L)
      .toDF()
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("cnt"))
    assert(bins.filter(col("tot") > 128 && col("cnt") > 1).isEmpty)
    assert(packed.count() == 500L) // nothing dropped
  }

  test("bin assignment is invariant to input partitioning") {
    val data = (1L to 300L).map(i => (i % 5, i, (i % 60) + 1))
    def run(parts: Int) = Packing.packGreedy(
        data.toDF("s", "i", "n").repartition(parts), "s", "i", "n", 100L)
      .orderBy("shard", "id").collect().toSeq
    assert(run(1) == run(13))
  }
}
