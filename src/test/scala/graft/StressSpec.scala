package graft

import org.apache.spark.sql.functions._

/** The stress probe's synthesizer is measurement infrastructure — if its
  * invariants drift, the growth slopes in README/SCALING.md silently
  * measure the wrong thing. Three contracts pinned here:
  *  (1) the id-offset overlap guard FAILS LOUDLY when the source corpus
  *      outgrows the copy offset (the source dir is env-overridable, so
  *      the sf0.1 bound cannot be assumed);
  *  (2) `replica` mode produces exact content copies under offset ids;
  *  (3) `disjoint` mode produces copies that can never pair — the
  *      property every "pure engine scaling" reading depends on.
  */
class StressSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def available = java.nio.file.Files.exists(
    java.nio.file.Paths.get(sf))

  test("synthesize fails loudly when ids could overlap the copy offset") {
    import spark.implicits._
    val dir = tmpDir()
    // one doc_id AT the offset bound: copy 0's range would collide with
    // copy 1's. Documents is read (and guarded) first, so no other
    // tables are needed to reach the guard.
    Seq((100000L, "alpha beta gamma", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Stress.synthesize(spark, dir, s"$dir/out", scale = 2, mode = "replica")
    }
    assert(e.getMessage.contains("overlap"), e.getMessage)
    assert(e.getMessage.contains("documents.doc_id"), e.getMessage)
  }

  test("replica mode: every copy is content-identical under offset ids") {
    assume(available)
    val out = tmpDir()
    Stress.synthesize(spark, sf, out, scale = 2, mode = "replica")
    val base = queries.Q.t(spark, sf, "documents")
    val synth = queries.Q.t(spark, out, "documents")
    assert(synth.count() == 2 * base.count())
    // fold ids back: both copies collapse onto the base table exactly
    val folded = synth.withColumn("doc_id", col("doc_id") % 100000L)
    assert(folded.exceptAll(base.unionAll(base)).isEmpty)
    assert(base.unionAll(base).exceptAll(folded).isEmpty)
  }

  test("disjoint mode: no candidate pair ever crosses copies") {
    assume(available)
    val out = tmpDir()
    Stress.synthesize(spark, sf, out, scale = 2, mode = "disjoint")
    val synth = queries.Q.t(spark, out, "documents")
    assert(synth.count() ==
      2 * queries.Q.t(spark, sf, "documents").count())
    // token-suffix perturbation: no shingle is shared across copies, so
    // even the CANDIDATE stage (weakest filter in the suite) emits no
    // cross-copy pair — the invariant that makes disjoint growth a pure
    // engine-scaling measurement
    val cross = ext.Dedup.similarityJoinCandidates(synth,
        thresholdNum = 1, thresholdDen = 3)
      .filter((col("id_a") < 100000L) =!= (col("id_b") < 100000L))
    assert(cross.isEmpty,
      s"cross-copy candidates: ${cross.count()}")
    // embeddings: the circular dim shift preserves within-copy geometry —
    // copy 1's pairwise dot products equal copy 0's exactly (same
    // rotation applied to both operands)
    val emb = queries.Q.t(spark, out, "embeddings")
    def dots(pred: org.apache.spark.sql.Column) = {
      val e = emb.filter(pred)
      e.as("a").join(e.as("b"),
          col("a.vec_id") % 100000L < col("b.vec_id") % 100000L)
        .select((col("a.vec_id") % 100000L).as("ia"),
          (col("b.vec_id") % 100000L).as("ib"),
          aggregate(zip_with(col("a.embedding"), col("b.embedding"),
            (x, y) => x * y), lit(0.0f), (acc, x) => acc + x).as("dot"))
    }
    // fold order is rotated with the dims, so float sums agree only to
    // tolerance — compare per-pair, not by exact set difference
    val d0 = dots(col("vec_id") < 100000L)
    val d1 = dots(col("vec_id") >= 100000L)
    val joined = d0.as("x").join(d1.as("y"), Seq("ia", "ib"), "full")
    assert(joined.filter(col("x.dot").isNull || col("y.dot").isNull ||
        abs(col("x.dot") - col("y.dot")) > 1e-3).isEmpty,
      "circular shift changed within-copy dot products")
  }
}
