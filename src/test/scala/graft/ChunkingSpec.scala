package graft

import org.apache.spark.sql.functions._

import graft.ext.Text

/** Context-window chunking: window/stride arithmetic at the edges, and
  * reconstruction — the chunks must tile the document with exactly
  * `overlap` shared tokens at each seam.
  */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  private def chunksOf(text: String, size: Int, overlap: Int) =
    Text.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        size = size, overlap = overlap)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))

  test("short doc yields exactly one whole chunk") {
    val got = chunksOf(doc(5), size = 8, overlap = 2)
    assert(got.toSeq == Seq((0L, doc(5), 5L)))
  }

  test("doc of exactly window size yields one chunk, not two") {
    val got = chunksOf(doc(8), size = 8, overlap = 2)
    assert(got.toSeq == Seq((0L, doc(8), 8L)))
  }

  test("windows advance by stride and share overlap tokens at seams") {
    val got = chunksOf(doc(20), size = 8, overlap = 3)
    // stride 5 → chunks at 0,5,10 cover to 18; ceil((20-8)/5)=3 → last at 15
    assert(got.length == 4)
    assert(got.forall { case (_, _, n) => n >= 3 && n <= 8 })
    got.sliding(2).foreach { case Array((_, a, _), (_, b, _)) =>
      val at = a.split(" ").takeRight(3).toSeq
      val bt = b.split(" ").take(3).toSeq
      assert(at == bt, s"seam mismatch between [$a] and [$b]")
    }
    // union of chunks covers every token in order
    val seen = got.flatMap(_._2.split(" ")).distinct.toSeq
    assert(seen == (1 to 20).map(i => s"t$i"))
  }

  test("empty text still yields one chunk (the empty token)") {
    val got = chunksOf("", size = 4, overlap = 1)
    assert(got.length == 1 && got(0)._3 == 1L)
  }
}
