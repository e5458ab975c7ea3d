package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.{Dedup, Sampling, Text}

/** Round-7 corpus-prep operators: top-n-gram concentration, familiarity
  * scoring, token-budget cap (sliced running sum), incremental near-dup.
  */
class PrepSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------ topNgramStats

  test("topNgramStats: argmax with (count desc, gram asc) tie-break") {
    val df = Seq(
      (1L, "a b a b c d"), // "a b" x2 beats the rest
      (2L, "x y z w")      // all bigrams unique -> lexicographic min wins
    ).toDF("doc_id", "text")
    val got = Text.topNgramStats(df, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[String]("top_gram") == "a b")
    assert(got(0).getAs[Long]("top_count") == 2L)
    assert(got(0).getAs[Long]("n_ngrams") == 5L)
    assert(got(0).getAs[Double]("top_frac") == 2.0 / 5.0)
    // doc 2: all 3 bigrams count 1, tie broken by smallest gram
    assert(got(1).getAs[String]("top_gram") == "x y")
    assert(got(1).getAs[Double]("top_frac") == 1.0 / 3.0)
  }

  test("topNgramStats: short doc surfaces with zero grams, not dropped") {
    val df = Seq((1L, "only"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Text.topNgramStats(df, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_ngrams") == 0L)
    assert(got(0).getAs[String]("top_gram") == "")
    assert(got(0).getAs[Double]("top_frac") == 0.0)
  }

  // -------------------------------------------------------- familiarity

  test("familiarity: mass/oov/bucket from the corpus vocabulary") {
    // corpus counts: common x6 (in 3 docs), rare x1, mid x2
    val df = Seq(
      (1L, "common common common"),
      (2L, "common common mid"),
      (3L, "common mid rare")
    ).toDF("doc_id", "text")
    // topK=2 vocab: common(6), mid(3)?? mid appears 2x -> vocab by count:
    // common=6, mid=2, rare=1 -> top2 = {common:6, mid:2}; rare is OOV
    val got = Text.familiarity(df, "doc_id", "text", topK = 2,
        headMin = 5.0, tailMax = 4.0)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("familiarity_mass") == 18L) // 3*6
    assert(got(0).getAs[Long]("n_oov") == 0L)
    assert(got(0).getAs[String]("bucket") == "head") // mean 6 >= 5
    assert(got(1).getAs[Long]("familiarity_mass") == 14L) // 6+6+2
    assert(got(2).getAs[Long]("familiarity_mass") == 8L) // 6+2+0
    assert(got(2).getAs[Long]("n_oov") == 1L) // rare
    assert(got(2).getAs[String]("bucket") == "tail") // mean 8/3 < 4
    assert(got(1).getAs[String]("bucket") == "middle") // 14/3 in [4,5)
  }

  // ------------------------------------------------------- budgetPerKey

  test("budgetPerKey: sliced cumsum equals the single-window form") {
    val df = (1L to 400L).map(i => (i, s"k${i % 3}", 10L + i % 7))
      .toDF("id", "key", "w")
    val got = Sampling.budgetPerKey(df, col("key"), "id", col("w"),
        budget = 300L, slices = 8)
      .orderBy("id").collect().toSeq
    // reference: one window per key over the same (hash, id) order
    val h = Sampling.sampleHash(col("id").cast("string"))
    val ref = df
      .withColumn("running_total", sum(col("w")).over(
        Window.partitionBy("key").orderBy(h, col("id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("running_total") - col("w") < 300L)
      .select(col("id"), col("key"), col("w").as("weight"),
        col("running_total"))
      .orderBy("id").collect().toSeq
    assert(got == ref)
    assert(got.nonEmpty && got.size < 400) // the budget actually bites
  }

  test("budgetPerKey: monotone in budget; oversized first doc admitted") {
    val df = (1L to 100L).map(i => (i, "all", 50L)).toDF("id", "key", "w")
    def ids(b: Long): Set[Long] =
      Sampling.budgetPerKey(df, col("key"), "id", col("w"), b)
        .select("id").collect().map(_.getLong(0)).toSet
    val small = ids(200L)
    val large = ids(400L)
    assert(small.subsetOf(large))
    assert(small.size == 4 && large.size == 8)
    // a single doc heavier than the whole budget is still admitted
    // (cum - w = 0 < budget) so the output is never empty
    val heavy = Seq((1L, "k", 1000L)).toDF("id", "key", "w")
    assert(Sampling.budgetPerKey(heavy, col("key"), "id", col("w"),
      budget = 10L).count() == 1L)
  }

  test("budgetPerKey: hot key spreads across more than one slice") {
    val df = (1L to 300L).map(i => (i, "hot", 1L)).toDF("id", "key", "w")
    val h = Sampling.sampleHash(col("id").cast("string"))
    val slices = df.select(
        floor(h * lit(8L) / lit(graft.functions.PortableHash.P))
          .cast("int").as("slice"))
      .distinct().count()
    assert(slices > 1, "hash order must cut into multiple slices")
  }

  // ---------------------------------------------- plan-shape contracts

  test("topNgramStats plan: hash aggregates only, no per-doc window sort") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Text.topNgramStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate"), plan.take(800))
  }

  test("familiarity plan: scoring is zero-shuffle (scan + project only)") {
    val df = Seq((1L, "a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val plan = Text.familiarity(df, "doc_id", "text", topK = 2,
        headMin = 2.0, tailMax = 1.0)
      .queryExecution.executedPlan.toString
    // the vocabulary was collected at construction; the returned frame
    // must ride the scan with no exchange of its own
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("budgetPerKey plan: data window is keyed by (key, slice)") {
    val df = (1L to 50L).map(i => (i, s"k${i % 2}", 1L))
      .toDF("id", "key", "w")
    val out = Sampling.budgetPerKey(df, col("key"), "id", col("w"), 100L)
    // optimizedPlan, not executedPlan: AQE wraps the physical tree in an
    // AdaptiveSparkPlanExec whose children aren't visible pre-execution
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.size
    }
    // exactly two windows: per-key offsets over <= `slices` aggregated
    // rows (1 key col), and the data-sized local window over (key, slice)
    // (2 cols) — never a data-sized window over the key alone
    assert(windows.sorted == Seq(1, 2), s"window partition specs: $windows")
  }

  test("incremental near-dup plan: equi band join, no nested loop") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val plan = Dedup.incrementalNearDuplicates(docs, docs, "doc_id",
        "text", threshold = 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  // ------------------------------------------------ sharedNgramStats

  test("sharedNgramStats: shared iff a gram occurs in another doc") {
    val df = Seq(
      (1L, "a b c d"), // grams "a b c", "b c d"
      (2L, "a b c x"), // shares "a b c" with doc 1
      (3L, "q r s t")  // isolated
    ).toDF("doc_id", "text")
    val got = Dedup.sharedNgramStats(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_ngrams") == 2L)
    assert(got(0).getAs[Long]("n_shared") == 1L)
    assert(got(0).getAs[Double]("shared_frac") == 0.5)
    assert(got(1).getAs[Long]("n_shared") == 1L)
    assert(got(2).getAs[Long]("n_shared") == 0L)
  }

  test("sharedNgramStats: within-doc repeats are not shared; short docs kept") {
    val df = Seq(
      (1L, "a b c a b c"), // "a b c" twice — but only in this doc
      (2L, "xy")           // < 3 tokens -> no grams
    ).toDF("doc_id", "text")
    val got = Dedup.sharedNgramStats(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_ngrams") == 4L)
    assert(got(0).getAs[Long]("n_shared") == 0L)
    assert(got(1).getAs[Long]("n_ngrams") == 0L)
    assert(got(1).getAs[Double]("shared_frac") == 0.0)
  }

  test("sharedNgramStats plan: aggregates + equi joins, no window/NLJ") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = Dedup.sharedNgramStats(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // the gram explode must NOT appear in the result plan at all: it ran
    // once, at the localCheckpoint boundary — both join sides read the
    // materialized per-doc counts (pre-fix, the explode+aggregate planned
    // twice, once per side)
    assert(!plan.contains("shinglehashes"), plan.take(1200))
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      plan.take(1200))
  }

  // ----------------------------------------------------- splitAssign

  test("splitAssign: disjoint + exhaustive; train set grows with weight") {
    val df = (1L to 500L).map(i => (i, s"d$i")).toDF("id", "t")
    val got = Sampling.splitAssign(df, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(got.values.sum == 500L) // every row assigned exactly once
    assert(got("train") > got("val") && got("train") > got("test"))
    // rough proportions (hash uniformity)
    assert(got("train") > 350 && got("train") < 450, got.toString)
    // monotone: the 0.8-train set is contained in the 0.9-train set
    def trainIds(w: Double): Set[Long] =
      Sampling.splitAssign(df, col("id"),
          Seq("train" -> w, "rest" -> (1.0 - w)))
        .filter($"split" === "train").select("id")
        .as[Long].collect().toSet
    assert(trainIds(0.8).subsetOf(trainIds(0.9)))
  }

  test("splitByCluster: cluster members share a split; singletons match splitAssign") {
    val docs = (1L to 200L).map(i => (i, s"doc$i")).toDF("id", "t")
    // clusters {1,2,3} and {10,11}; everything else singleton
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.splitByCluster(docs, "id", comps, splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 200)
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(10L) == got(11L))
    // singletons (no dup edge) get exactly the plain per-id assignment:
    // adding edges elsewhere never migrates an untouched doc
    val plain = Sampling.splitAssign(docs, col("id"), splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val clustered = Set(1L, 2L, 3L, 10L, 11L)
    docs.select("id").as[Long].collect().filterNot(clustered).foreach { i =>
      assert(got(i) == plain(i), s"singleton $i migrated")
    }
  }

  test("splitAssign: bad weights and name collisions rejected") {
    val df = Seq((1L, "x")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df, col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df, col("id"), Seq("a" -> 0.5, "a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df.withColumn("split", lit("x")), col("id"),
        Seq("a" -> 1.0))
    }
  }

  // --------------------------------------------- contaminationReport

  test("contaminationReport: shared distinct grams per (doc, bench) pair") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "totally unrelated words here now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high today")
    ).toDF("bench_id", "text")
    val got = Dedup.contaminationReport(corpus, bench,
        "doc_id", "text", "bench_id", n = 4)
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 shares "the quick brown fox" and "quick brown fox jumps"
    assert(got == Seq((1L, 100L, 2L)))
    // the report's doc set IS decontaminate's drop set
    val dropSet = Dedup.contaminatedIds(corpus,
        bench.select(col("bench_id").as("doc_id"), col("text")),
        "doc_id", "text", n = 4)
      .as[Long].collect().toSet
    assert(got.map(_._1).toSet == dropSet)
  }

  // --------------------------------------------------- invertedIndex

  test("invertedIndex: df/occurrence counts and capped ascending postings") {
    val df = Seq(
      (3L, "b a a"),
      (1L, "a c"),
      (2L, "a b")
    ).toDF("doc_id", "text")
    val got = Text.invertedIndex(df, "doc_id", "text", maxPostings = 2)
      .orderBy("token").as[(String, Long, Long, Seq[Long])].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 4L, Seq(1L, 2L)), // in all 3 docs, 4 occurrences, cap 2
      ("b", 2L, 2L, Seq(2L, 3L)),
      ("c", 1L, 1L, Seq(1L))))
  }

  test("invertedIndex plan: bounded heap aggregate, no window, no collect_list") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = Text.invertedIndex(df).queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by_score"), plan.take(800))
    assert(!plan.contains("Window") && !plan.contains("collect_list"),
      plan.take(800))
  }

  // ------------------------------------------------------- epochMix

  test("epochMix: integer epochs repeat exactly; epoch indices 0..n-1") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    val got = Sampling.epochMix(df, col("id"), col("src"),
        Map("a" -> 2.0), defaultEpochs = 1.0)
      .orderBy("id", "epoch")
      .select("id", "epoch").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (3L, 0L)))
  }

  test("epochMix: fractional extra copies are a nested sample; 0 drops") {
    val df = (1L to 300L).map(i => (i, "s")).toDF("id", "src")
    def ids(e: Double): Map[Long, Long] =
      Sampling.epochMix(df, col("id"), col("src"), Map("s" -> e))
        .groupBy("id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
    val lo = ids(1.3)
    val hi = ids(1.7)
    // every row appears at least floor(e) times; the 2-copy sets nest
    assert(lo.values.forall(n => n == 1L || n == 2L))
    assert(lo.filter(_._2 == 2L).keySet.subsetOf(
      hi.filter(_._2 == 2L).keySet))
    // rates roughly track the fraction (hash-uniformity sanity)
    val frac = lo.values.count(_ == 2L).toDouble / 300
    assert(frac > 0.15 && frac < 0.45, s"extra-copy rate $frac")
    // epochs = 0 removes the stratum entirely
    assert(Sampling.epochMix(df, col("id"), col("src"),
      Map("s" -> 0.0)).isEmpty)
  }

  test("column-collision guards reject rather than corrupt") {
    val withEpoch = Seq((1L, "a", 0L)).toDF("id", "src", "epoch")
    intercept[IllegalArgumentException] {
      Sampling.epochMix(withEpoch, col("id"), col("src"), Map("a" -> 2.0))
    }
    val keyedChange = Seq((1L, 1.0)).toDF("change", "v")
    intercept[IllegalArgumentException] {
      graft.ops.SnapshotDiff.diff(keyedChange, keyedChange, Seq("change"))
    }
    val tokenId = Seq((1L, "a b")).toDF("token", "text")
    intercept[IllegalArgumentException] {
      Text.invertedIndex(tokenId, "token", "text")
    }
  }

  test("epochMix plan: zero shuffle — explode rides the scan") {
    val df = Seq((1L, "a")).toDF("id", "src")
    val plan = Sampling.epochMix(df, col("id"), col("src"),
        Map("a" -> 2.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  // -------------------------------------- incrementalNearDuplicates

  test("incremental near-dup equals union near-dup restricted cross-side") {
    // identical texts across sides (identical signature ⇒ the LSH
    // recall is deterministic, no banding luck) + unrelated noise
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "one two three four five six seven"),
      (5L, "uno dos tres cuatro cinco seis siete")
    ).toDF("doc_id", "text")
    val seen = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 =!= 0)
    val inc = Dedup.incrementalNearDuplicates(fresh, seen,
        "doc_id", "text", threshold = 0.2)
      .select("id_new", "id_seen").as[(Long, Long)].collect().toSet
    val full = Dedup.nearDuplicates(docs, "doc_id", "text",
        threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cross = full.collect {
      case (a, b) if a % 2 != 0 && b % 2 == 0 => (a, b)
      case (a, b) if b % 2 != 0 && a % 2 == 0 => (b, a)
    }
    assert(inc == cross)
    assert(inc.nonEmpty)
    // never pairs within one side
    assert(inc.forall { case (n, s) => n % 2 != 0 && s % 2 == 0 })
  }

  // ------------------------------------------------------- segmentDedup

  test("segmentDedup: first (doc, idx) keeps, later copies dropped, " +
      "docs reassembled in order") {
    val df = Seq(
      (1L, "a b c d e f"), // segs: "a b c", "d e f"
      (2L, "a b c x y z"), // "a b c" is doc1's — dropped here
      (3L, "a b c")        // dropped entirely
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(df, "doc_id", "text", segSize = 3)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("n_segments")).toSeq == Seq(2L, 2L, 1L))
    assert(got.map(_.getAs[Long]("n_kept")).toSeq == Seq(2L, 1L, 0L))
    assert(got.map(_.getAs[String]("dedup_text")).toSeq ==
      Seq("a b c d e f", "x y z", ""))
  }

  test("segmentDedup: within-document repeats collapse too") {
    val df = Seq((7L, "a b a b")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(df, "doc_id", "text", segSize = 2)
      .collect().head
    assert(got.getAs[Long]("n_segments") == 2L)
    assert(got.getAs[Long]("n_kept") == 1L)
    assert(got.getAs[String]("dedup_text") == "a b")
  }

  test("segmentHashes: native ≡ polyHash of chunkTokens(overlap=0) text") {
    val df = Seq((1L, "a b c d e"), (2L, "x"), (3L, ""),
      (4L, "a  b c"), (5L, "lorem ipsum dolor sit amet consect"))
      .toDF("doc_id", "text")
    val viaChunks = Text.chunkTokens(df, "doc_id", "text", 2, 0)
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        graft.functions.NativeHash.polyHash(col("chunk_text")).as("h"))
    val native = df.select(col("doc_id"),
      posexplode(graft.functions.NativeHash.segmentHashes(col("text"), 2))
        .as(Seq("chunk_id", "h")))
    assert(native.exceptAll(viaChunks).isEmpty &&
      viaChunks.exceptAll(native).isEmpty)
  }

  // ------------------------------------------------------- bpePairStats

  test("bpePairStats: pairs weighted by word frequency, " +
      "(cnt desc, pair) rank") {
    val df = Seq("ab ab abc").toDF("text")
    // vocab: ab x2, abc x1 -> pair "ab" = 2+1 = 3, "bc" = 1
    val got = Text.bpePairStats(df, "text", topK = 32)
      .collect().map(r => (r.getAs[Long]("rank"),
        r.getAs[String]("pair"), r.getAs[Long]("cnt")))
    assert(got.toSeq == Seq((1L, "ab", 3L), (2L, "bc", 1L)))
  }

  test("bpePairStats: single-char words yield no pairs; topK truncates") {
    val df = Seq("a a a xy yz").toDF("text")
    val got = Text.bpePairStats(df, "text", topK = 1).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("pair") == "xy") // tie 1-1 -> lexicographic
  }

  // ----------------------------------------------- canonicalPerCluster

  test("canonicalPerCluster: longest member wins, ties to smallest id") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "component")
    val docs = Seq(
      (1L, "a b"), (2L, "a b c d"), (3L, "a b c"),   // longest: doc 2
      (5L, "x y"), (6L, "p q"),                      // tie -> doc 5
      (9L, "unclustered ignored")
    ).toDF("doc_id", "text")
    val got = Dedup.canonicalPerCluster(comps, docs)
      .orderBy("component").collect()
    assert(got.map(r => (r.getAs[Long]("component"),
      r.getAs[Long]("n_members"), r.getAs[Long]("canonical_id"),
      r.getAs[Long]("canonical_tokens"))).toSeq ==
      Seq((1L, 3L, 2L, 4L), (5L, 2L, 5L, 2L)))
  }

  // ------------------------------------------------------ centroidAssign

  test("centroidAssign: vectors map to the nearest label centroid") {
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.8f, 0.0f)),
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.0f, 0.9f)),
      // labeled 0 but sits on cluster 1 -> flagged
      (5L, 0, Array(0.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = graft.ext.Similarity
      .centroidAssign(df, "vec_id", "label", "embedding")
      .orderBy("vec_id").collect()
    val assigned = got.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Int]("assigned")).toMap
    assert(assigned(1L) == 0 && assigned(2L) == 0)
    assert(assigned(3L) == 1 && assigned(4L) == 1)
    assert(assigned(5L) == 1) // the mislabel is caught
    assert(got.forall(_.getAs[Double]("dist2") >= 0.0))
  }

  test("centroidAssign: ragged embedding fails loudly, not silently") {
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.8f, 0.2f)),
      (3L, 0, Array(1.0f)) // truncated vector
    ).toDF("vec_id", "label", "embedding")
    val e = intercept[Exception] {
      graft.ext.Similarity
        .centroidAssign(df, "vec_id", "label", "embedding").collect()
    }
    assert(e.getMessage.contains("centroidAssign")
      || e.getCause != null &&
         e.getCause.getMessage.contains("centroidAssign"))
  }

  // --------------------------------------------------------- vocabDrift

  test("vocabDrift: exact cross-product ranking, absent tokens count 0") {
    val a = Seq("x x x y", "x z").toDF("text") // totals: x4 y1 z1 -> 6
    val b = Seq("y y y z z").toDF("text")      // totals: y3 z2     -> 5
    val got = Text.vocabDrift(a, b, "text", topK = 3).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt_a"),
        r.getAs[Long]("cnt_b"), r.getAs[Long]("drift_x")))
    // drift_x = cnt_a*5 - cnt_b*6: x -> 20, y -> 5-18 = -13, z -> 5-12 = -7
    assert(got.toSeq == Seq(("x", 4L, 0L, 20L), ("y", 1L, 3L, -13L),
      ("z", 1L, 2L, -7L)))
  }

  // ------------------------------------------------------ shardManifest

  test("shardManifest: checksum invariant under repartitioning; " +
      "writeShards round-trips") {
    val df = Seq(
      (1L, "a b c", 0), (2L, "d e", 0), (3L, "f", 1), (4L, "g h i j", 1)
    ).toDF("doc_id", "text", "shard")
    val m1 = graft.ops.Export.shardManifest(df).orderBy("shard").collect()
    val m2 = graft.ops.Export.shardManifest(df.repartition(7))
      .orderBy("shard").collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_tokens"))).toSeq == Seq((0, 2L, 5L), (1, 2L, 5L)))
    // what lands on disk carries the same manifest
    val out = tmpDir() + "/shards"
    val m3 = graft.ops.Export.writeShards(df, out)
      .orderBy("shard").collect()
    assert(m3.map(_.toSeq).toSeq == m1.map(_.toSeq).toSeq)
  }

  // ----------------------------------------------------- groupDiversity

  test("groupDiversity: identical vectors -> 0; antipodal -> mean sq norm") {
    val df = Seq(
      (0, Array(0.5f, 0.5f)), (0, Array(0.5f, 0.5f)),   // no spread
      (1, Array(1.0f, 0.0f)), (1, Array(-1.0f, 0.0f))   // centroid 0
    ).toDF("label", "embedding")
    val got = graft.ext.Similarity.groupDiversity(df, "label", "embedding")
      .orderBy("label").collect()
    assert(got(0).getAs[Long]("n") == 2L)
    assert(got(0).getAs[Double]("diversity") == 0.0)
    assert(got(0).getAs[Double]("mean_sq_norm") == 0.5)
    assert(got(1).getAs[Double]("centroid_sq_norm") == 0.0)
    assert(got(1).getAs[Double]("mean_sq_norm") == 1.0)
    assert(got(1).getAs[Double]("diversity") == 1.0)
  }

  // -------------------------------------------------------- boilerplate

  test("boilerplate: df >= minDocs drops EVERY copy; below-threshold " +
      "duplicates keep all copies (contrast with segmentDedup)") {
    // seg A ("a b") in 3 docs -> boilerplate, gone everywhere;
    // seg B ("c d") in 2 docs -> below threshold, kept in BOTH
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b c d"),
      (4L, "p q r s")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplate(df, "doc_id", "text",
        segSize = 2, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("c d", "x y", "c d", "p q r s"))
    assert(got.map(_.getAs[Long]("n_kept")).toSeq == Seq(1L, 1L, 1L, 2L))
    assert(got.map(_.getAs[Long]("n_segments")).toSeq ==
      Seq(2L, 2L, 2L, 2L))
    // segmentDedup on the same corpus keeps the FIRST "a b" — the two
    // operators must disagree exactly there
    val sd = Dedup.segmentDedup(df, "doc_id", "text", segSize = 2)
      .orderBy("doc_id").collect()
    assert(sd(0).getAs[String]("dedup_text") == "a b c d")
  }

  test("boilerplate: within-doc repeats count one doc toward the " +
      "threshold, but all copies drop once frequent") {
    val df = Seq(
      (1L, "a b a b"), // 2 copies, 1 doc
      (2L, "a b z z"),
      (3L, "a b w w")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplate(df, "doc_id", "text",
        segSize = 2, minDocs = 3)
      .orderBy("doc_id").collect()
    // "a b" occurs in 3 distinct docs -> all 4 copies drop
    assert(got.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("", "z z", "w w"))
    // minDocs = 4 would keep everything: distinct docs, not copies
    val kept = Dedup.boilerplate(df, "doc_id", "text",
        segSize = 2, minDocs = 4)
      .orderBy("doc_id").collect()
    assert(kept.map(_.getAs[Long]("n_kept")).toSeq == Seq(2L, 2L, 2L))
  }

  // ---------------------------------------------------- classifierScore

  test("classifierScore: linear in the token multiset; empty text = 0 " +
      "bias term") {
    val df = Seq((1L, "alpha beta"), (2L, "beta alpha"), (3L, "alpha"),
      (4L, "beta"), (5L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        Text.classifierScore(col("text")).as("s"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(got(0) == got(1))           // order-invariant
    assert(got(0) == got(2) + got(3))  // additive over tokens
    // empty split -> one "" token; its bucket weight is the bias
    assert(got(4) ==
      df.sparkSession.range(1).select(
        Text.classifierScore(lit("")).as("s")).head().getLong(0))
  }

  test("classifierScore plan: zero shuffle, rides the scan") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = df.select(Text.classifierScore(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ------------------------------------------------------------- bm25

  test("bm25TopK: term-bearing docs only, rarer term outweighs common " +
      "one, k truncates, tiebreak by id") {
    val df = Seq(
      (1L, "rare common x y z"),
      (2L, "common p q r s"),
      (3L, "common t u v w"),
      (4L, "none here at all e"),
      (5L, "rare common rare a")
    ).toDF("doc_id", "text")
    val got = Text.bm25TopK(df, Seq("rare", "common"), k = 3,
      idCol = "doc_id")
    val rows = got.collect()
    assert(rows.length == 3)
    // doc 4 has no query term -> excluded even though k would admit it
    assert(!rows.map(_.getLong(0)).contains(4L))
    // doc 5 (rare x2) outranks doc 1 (rare x1) outranks common-only docs
    assert(rows.map(_.getLong(0)).take(2).toSeq == Seq(5L, 1L))
    // docs 2 and 3 tie exactly (same tf, same dl): id order decides
    assert(rows(2).getLong(0) == 2L)
  }

  // --------------------------------------- exact set-similarity join

  test("similarityJoinExact: equals in-test brute force on a planted " +
      "corpus; rational threshold boundary is inclusive; short docs " +
      "never pair") {
    val docs = Seq(
      (1L, "a b c d e f"),      // shingles {abc,bcd,cde,def}
      (2L, "a b c d e x"),      // shares {abc,bcd,cde} with 1
      (3L, "p q r s t u"),      // disjoint from 1/2
      (4L, "a b c d e f"),      // identical to 1 -> J = 1
      (5L, "x y")               // < 3 tokens -> empty set
    ).toDF("doc_id", "text")
    val got = Dedup.similarityJoinExact(docs, "doc_id", "text",
        n = 3, thresholdNum = 3, thresholdDen = 5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force: J(1,2) = 3/5 (== threshold, inclusive), J(1,4) = 1,
    // J(2,4) = 3/5; doc 3 and doc 5 pair with nothing
    assert(got.toSeq == Seq((1L, 2L, 3L, 5L), (1L, 4L, 4L, 4L),
      (2L, 4L, 3L, 5L)))
    // one notch above 3/5 excludes the boundary pairs, keeps J = 1
    val tight = Dedup.similarityJoinExact(docs, "doc_id", "text",
        n = 3, thresholdNum = 61, thresholdDen = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tight.toSeq == Seq((1L, 4L)))
  }

  test("similarityJoinExact plan (q129): length filter rides the " +
      "candidate join condition pre-distinct; no nested-loop join") {
    // the q129 scale contract: the PPJoin length filter must prune
    // candidates INSIDE the prefix equi-join (before the distinct and
    // the wide shingle-array joins), and nothing in the pipeline may
    // degenerate to a cartesian/nested-loop product
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e x"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val out = Dedup.similarityJoinExact(docs, "doc_id", "text",
      n = 3, thresholdNum = 1, thresholdDen = 2)
    val plan = out.queryExecution.optimizedPlan
    def hasLengthFilter(j: Join): Boolean = j.condition.exists { c =>
      val s = c.toString; s.contains("least") && s.contains("greatest")
    }
    assert(plan.collect { case j: Join if hasLengthFilter(j) => j }.nonEmpty,
      s"no join carries the least/greatest length filter:\n$plan")
    // the pair-distinct Aggregate (grouping == output, no agg functions)
    // must sit ABOVE a length-filtered join — i.e. the filter already
    // pruned when the distinct runs
    val distinctsAbove = plan.collect {
      case a: Aggregate
        if a.aggregateExpressions.length == a.groupingExpressions.length &&
          a.collect { case j: Join if hasLengthFilter(j) => j }.nonEmpty => a
    }
    assert(distinctsAbove.nonEmpty,
      s"candidate distinct does not sit above the length-filtered join:\n$plan")
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"), physical.take(800))
    // the verify joins attach shingle arrays to candidate pairs — they
    // must plan as hash joins (shuffle_hash hints): the sort-merge
    // fallback sorts the candidate stream with array payloads, the 5×
    // cliff the 30×-corpus stress probe measured. Two hinted joins →
    // at least two ShuffledHashJoin nodes, and no SortMergeJoin may
    // touch a shingle-array column (sorting 8-byte keys elsewhere in
    // the plan is fine; sorting array payloads is the defect).
    val shjCount = "ShuffledHashJoin".r.findAllIn(physical).length
    assert(shjCount >= 2,
      s"verify joins must be hash joins, found $shjCount ShuffledHashJoin:\n" +
        physical.take(1200))
    val smjWithArrays = physical.linesIterator
      .filter(_.contains("SortMergeJoin")).filter(_.contains("__h"))
    assert(smjWithArrays.isEmpty,
      s"sort-merge join over shingle columns:\n${smjWithArrays.mkString("\n")}")
  }

  // ----------------------------------------------- contrastive pairs

  test("contrastivePairs: deterministic same-label positive (min id, " +
      "or second-min for the min itself); negatives never share the " +
      "anchor label; single-member label -> NULL pos audit") {
    import graft.ext.Similarity
    val df = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"), (4L, "C"))
      .toDF("vec_id", "label")
    val got = Similarity.contrastivePairs(df, k = 3)
      .orderBy("anchor_id", "slot").collect()
    val byAnchor = got.groupBy(_.getAs[Long]("anchor_id"))
    // positives: 0 -> 1 (0 is the min of A), 1 -> 0, 2 -> 3, 3 -> 2
    val posOf = got.map(r => r.getAs[Long]("anchor_id") ->
      (if (r.isNullAt(2)) -1L else r.getAs[Long]("pos_id"))).toMap
    assert(posOf.get(0L).forall(_ == 1L))
    assert(posOf.get(1L).forall(_ == 0L))
    assert(posOf.get(2L).forall(_ == 3L))
    assert(posOf.get(3L).forall(_ == 2L))
    assert(posOf.get(4L).forall(_ == -1L)) // single-member label C
    // negatives: label always disagrees, ids resolve to real rows
    val labelOf = Map(0L -> "A", 1L -> "A", 2L -> "B", 3L -> "B", 4L -> "C")
    got.foreach { r =>
      assert(r.getAs[String]("neg_label") != r.getAs[String]("label"))
      assert(labelOf(r.getAs[Long]("neg_id")) == r.getAs[String]("neg_label"))
    }
    // slots are a subset of 1..k (label-collision slots dropped)
    assert(byAnchor.values.forall(_.length <= 3))
    // deterministic: a second run is row-identical
    val again = Similarity.contrastivePairs(df, k = 3)
      .orderBy("anchor_id", "slot").collect()
    assert(got.toSeq == again.toSeq)
  }

  // ----------------------------------------------------- curriculum

  test("curriculum: per-key percentile bands; phase 0 = highest " +
      "difficulty; clamp keeps the last row in phases-1") {
    val df = Seq((1L, "s", 50.0), (2L, "s", 40.0), (3L, "s", 30.0),
      (4L, "s", 20.0), (5L, "s", 10.0), (6L, "t", 99.0))
      .toDF("doc_id", "src", "diff")
    val got = Sampling.curriculum(df, col("src"), "doc_id", col("diff"),
        phases = 4, slices = 4, lo = 0.0, hi = 100.0)
      .orderBy("key", "rank").collect()
    // key s: pct 0, .25, .5, .75, 1 -> phases 0,1,2,3,3
    assert(got.filter(_.getString(1) == "s").map(_.getAs[Long]("phase"))
      .toSeq == Seq(0L, 1L, 2L, 3L, 3L))
    // single-row key: pct 0 -> phase 0
    assert(got.filter(_.getString(1) == "t").map(_.getAs[Long]("phase"))
      .toSeq == Seq(0L))
  }

  // -------------------------------------------------- padding audit

  test("paddingAudit: equi-depth length buckets; waste_ppm exact; " +
      "nBins=1 reproduces the unbucketed baseline") {
    import graft.ext.Packing
    val df = Seq((1L, "s", 10L), (2L, "s", 10L), (3L, "s", 10L),
      (4L, "s", 4L)).toDF("doc_id", "src", "len")
    val got = Packing.paddingAudit(df, col("src"), "doc_id", col("len"),
        nBins = 2, slices = 4, lo = 0.0, hi = 16.0)
      .orderBy("key", "bin").collect()
    assert(got.length == 2)
    // bin 0: two 10s, no waste; bin 1: 10 and 4 -> (20-14)/20 = 30%
    assert(got(0).getAs[Long]("waste_ppm") == 0L)
    assert(got(1).getAs[Long]("max_len") == 10L)
    assert(got(1).getAs[Long]("sum_len") == 14L)
    assert(got(1).getAs[Long]("waste_ppm") == 300000L)
    val base = Packing.paddingAudit(df, col("src"), "doc_id", col("len"),
        nBins = 1, slices = 4, lo = 0.0, hi = 16.0).collect()
    // unbucketed: cap 40, used 34 -> 150000 ppm
    assert(base.length == 1 && base(0).getAs[Long]("waste_ppm") == 150000L)
  }

  // ---------------------------------------------------------------- bpe

  test("bpeEncode: chained merges build hierarchically; greedy " +
      "left-to-right pairing on runs; rules apply in list order") {
    val merges = Seq("t" -> "a", "l" -> "e", "b" -> "le", "ta" -> "ble")
    val df = Seq((1L, "table tattle stable data")).toDF("doc_id", "text")
    val got = df.select(Text.bpeEncode(col("text"), merges)).head.getString(0)
    // table: full chain; tattle: ta + t + t + le; stable: s + table;
    // data: d + a + ta (greedy finds (t,a) at position 3 only)
    assert(got ==
      "table ta\u001Ft\u001Ft\u001Fle s\u001Ftable d\u001Fa\u001Fta")
    // runs pair greedily left-to-right: aaaa -> (aa)(aa), aaa -> (aa)a
    val run = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
      .select(Text.bpeEncode(col("text"), Seq("a" -> "a")))
      .head.getString(0)
    assert(run == "aa\u001Faa aa\u001Fa")
    // merged symbols do NOT re-merge under a later rule's first side
    // unless the rule names the merged symbol exactly
    val noCascade = Seq((1L, "ab")).toDF("doc_id", "text")
      .select(Text.bpeEncode(col("text"), Seq("a" -> "b", "a" -> "bc")))
      .head.getString(0)
    assert(noCascade == "ab")
  }

  test("bpeEncode: multi-space runs collapse (empty words dropped); " +
      "empty doc encodes to ''; the U+001F separator in a word fails loudly") {
    val df = Seq((1L, "a  b"), (2L, "")).toDF("doc_id", "text")
    val got = df.orderBy("doc_id")
      .select(Text.bpeEncode(col("text"), Seq("a" -> "b")))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("a b", "")) // not merged: different words
    val bad = Seq((1L, "a\u001Fb")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      bad.select(Text.bpeEncode(col("text"), Seq("a" -> "b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("bpeEncode plan: zero shuffle, rides the scan") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = df.select(Text.bpeEncode(col("text"), Seq("a" -> "b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---------------------------------------------------------------- rrf

  test("rrfFuse: both-lists ids sum reciprocals, one-sided ids keep a " +
      "NULL rank audit column, topK truncates on (rrf desc, id)") {
    import graft.ext.Similarity
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val got = Similarity.rrfFuse(a, b, "id", topK = 3, kRrf = 60)
      .collect()
    // id 20: 1/62 + 1/61 tops everything; id 10: 1/61 beats id 40: 1/62
    assert(got.map(_.getLong(0)).toSeq == Seq(20L, 10L, 40L))
    assert(got(0).getDouble(3) == 1.0 / 62.0 + 1.0 / 61.0)
    assert(got(1).isNullAt(2) && got(2).isNullAt(1)) // audit NULLs
    // id 30 (1/63, rank 4 of 4) fell to topK
    assert(!got.map(_.getLong(0)).contains(30L))
  }

  test("bm25TopK plan: stats broadcast, top-k via TakeOrdered (no " +
      "global sort), single corpus scan per side") {
    val df = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = Text.bm25TopK(df, Seq("b"), k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
