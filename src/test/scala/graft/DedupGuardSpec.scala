package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Guards added in round 3: LSH mega-bucket caps (one boilerplate bucket
  * must not turn the bucket-local self-join quadratic) and exact integer
  * bucketing in simHashPairs (floor of a double quotient misbuckets ids
  * above 2^53; negatives need floor, not truncation).
  */
class DedupGuardSpec extends SparkSuite {
  import spark.implicits._

  private lazy val boilerplate = (0L until 20L)
    .map(i => (i, "the same license header text repeated verbatim " +
      "across every single document in this synthetic corpus"))
    .toDF("doc_id", "text")

  test("minhash lsh: mega-bucket dropped under cap, kept by default") {
    // 20 identical docs land in one bucket per band: 190 pairs by default
    val open = Dedup.minHashCandidates(boilerplate, "doc_id", "text")
    assert(open.count() == 190)
    val capped = Dedup.minHashCandidates(boilerplate, "doc_id", "text",
      maxBucket = 8)
    assert(capped.count() == 0)
    // the audit twin reports exactly what the cap dropped
    val over = Dedup.oversizedBuckets(boilerplate, "doc_id", "text",
        maxBucket = 8)
      .select("bucket_size").as[Long].collect()
    assert(over.nonEmpty && over.forall(_ == 20L))
    // and a cap at the bucket size drops nothing
    assert(Dedup.oversizedBuckets(boilerplate, "doc_id", "text",
      maxBucket = 20).isEmpty)
  }

  test("embedding near-dups: mega-bucket dropped under cap") {
    val vecs = (0L until 12L)
      .map(i => (i, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val open = Similarity.embeddingNearDups(vecs, threshold = 0.9)
    assert(open.count() == 66) // 12 identical vectors → all pairs
    val capped = Similarity.embeddingNearDups(vecs, threshold = 0.9,
      maxBucket = 4)
    assert(capped.count() == 0)
    // audit twin reports the one shared bucket of all 12 vectors
    val over = Similarity.embeddingOversizedBuckets(vecs, maxBucket = 4)
      .select("bucket_size").as[Long].collect()
    assert(over.toSeq == Seq(12L))
  }

  test("char minhash: audit twin mirrors the cap (round-4 advice)") {
    val over = Dedup.charOversizedBuckets(boilerplate, "doc_id", "text",
        maxBucket = 8)
      .select("bucket_size").as[Long].collect()
    assert(over.nonEmpty && over.forall(_ == 20L))
    assert(Dedup.charMinHashCandidates(boilerplate, "doc_id", "text",
      maxBucket = 8).count() == 0)
  }

  test("curate releases its persisted boundary (no CacheManager pin)") {
    val docs = (0L until 30L).map(i =>
      (i, s"document number $i with some reasonable words inside it " +
        "to pass the quality floor easily")).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = graft.ext.Curation.curate(docs, minQuality = 0.0,
      auditOversized = true)
    assert(out.count() > 0)
    // the corpus-sized boundary must not stay pinned after curate()
    // returns (round-3 advice: CacheManager holds strong refs forever);
    // only the narrow localCheckpoint result may remain persistent
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"curate leaked persisted RDDs: $before -> $after")
  }

  test("CurationSession: repeated curate calls scan the corpus once") {
    // count real passes over the source with an accumulator inside a
    // pass-through mapPartitions: any boundary recompute re-fires it
    val acc = spark.sparkContext.longAccumulator("corpus-scans")
    val corpus = (0L until 30L).map(i =>
        (i, s"unique document number $i with enough distinct words to " +
          "clear the default quality floor comfortably"))
      .toDF("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions { it => acc.add(1L); it }
      .toDF("doc_id", "text")
    val session = graft.ext.Curation.open(corpus, minQuality = 0.0)
    try {
      val scansAfterOpen = acc.value.longValue
      assert(scansAfterOpen > 0)
      val r1 = session.curate(nearThreshold = 0.5)
      val r2 = session.curate(nearThreshold = 0.95)
      assert(r1.count() > 0 && r2.count() > 0)
      // both curate calls ran entirely off the cached boundary
      assert(acc.value.longValue == scansAfterOpen,
        s"curate recomputed the boundary: $scansAfterOpen -> ${acc.value}")
    } finally session.release()
  }

  test("dupComponents: multi-hop chains collapse to one min-labeled cluster") {
    // chain 1-2-3-4-5 (diameter 4 → several propagation rounds), a
    // separate pair, and a triangle; ids never pair across groups
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain
      (10L, 11L),                             // pair
      (20L, 21L), (21L, 22L), (20L, 22L))     // triangle
      .toDF("id_a", "id_b")
    val got = Dedup.dupComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val want = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
  }

  test("dupComponents: maxIter too small for the diameter fails loudly") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      // smallEdgeLimit = 0 forces the distributed rounds — the driver
      // union-find path has no iteration cap to trip
      Dedup.dupComponents(chain, maxIter = 2, smallEdgeLimit = 0)
    }
    assert(e.getMessage.contains("fixpoint"))
  }

  test("simhash pairs: exact floor bucketing incl. negative ids") {
    // identical texts → hamming 0; expected pairs are exactly the id
    // windows, including across the 0 boundary (floor, not truncation)
    val docs = (-5L to 5L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val got = Dedup.simHashPairs(docs, "doc_id", "text",
        idWindow = 3L, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      a <- -5L to 5L; b <- -5L to 5L
      if a < b && b - a <= 3L
    } yield (a, b)).toSet
    assert(got == want)
  }
}
