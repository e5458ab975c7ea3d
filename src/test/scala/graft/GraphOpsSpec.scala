package graft

import org.apache.spark.sql.functions._
import graft.ops.{RankProp, Sessionize}
import graft.ext.Similarity

/** Round-8 operators: sessionization boundaries/rollup, integer rank
  * propagation invariants, quantized-retrieval exactness.
  */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: 3 events in one session, then a 2h gap → second session
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (1L, 11L, ts("2024-01-01 10:10:00")),
    (1L, 12L, ts("2024-01-01 10:40:00")),
    (1L, 13L, ts("2024-01-01 12:41:00")),
    // user 2: single event
    (2L, 20L, ts("2024-01-01 09:00:00")),
    // user 3: two events EXACTLY gap seconds apart → same session
    (3L, 30L, ts("2024-01-01 08:00:00")),
    (3L, 31L, ts("2024-01-01 09:00:00"))
  ).toDF("user_id", "event_id", "ts")

  test("sessionize.assign numbers sessions per user, 1-based, gap-exact") {
    val got = Sessionize.assign(events, "user_id", "ts", "event_id",
        gapSec = 3600L)
      .select("user_id", "event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L), (1L, 13L, 2L),
      (2L, 20L, 1L),
      (3L, 30L, 1L), (3L, 31L, 1L))) // gap == gapSec is NOT a break
  }

  test("sessionize.summary: counts, bounds, exact microsecond duration") {
    val got = Sessionize.summary(events, "user_id", "ts", "event_id",
        gapSec = 3600L)
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 2400L * 1000000L), // 10:00 → 10:40
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L),
      (3L, 1L, 2L, 3600L * 1000000L)))
  }

  test("sessionize plans ONE exchange: rollup reuses the window shuffle") {
    val plan = Sessionize.summary(events, "user_id", "ts", "event_id", 3600L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("rankProp: isolated nodes keep base score; symmetric pair splits") {
    // graph: 1—2 (one pair), node 3 isolated
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val got = RankProp.propagate(pairs, "a", "b", nodes, "id", iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // deg(1)=deg(2)=1: score alternates but fixed point of
    // s' = 150000 + 850000*s/1e6 → s = 10^6 exactly at every iteration
    assert(got.toSeq == Seq((1L, 1000000L), (2L, 1000000L), (3L, 150000L)))
  }

  test("rankProp: star graph concentrates authority on the hub") {
    // hub 0 connected to leaves 1..4
    val pairs = (1L to 4L).map(l => (0L, l)).toDF("a", "b")
    val nodes = (0L to 4L).toDF("id")
    val scores = RankProp.propagate(pairs, "a", "b", nodes, "id", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(0L) > scores(1L), s"hub must outrank leaves: $scores")
    assert((1L to 4L).map(scores).distinct.size == 1,
      "leaves are symmetric → equal scores")
    // exact replay of the recurrence in test code (BIGINT semantics)
    var hub = 1000000L; var leaf = 1000000L
    for (_ <- 1 to 3) {
      val nh = 150000L + 850000L * (4L * (leaf / 1L)) / 1000000L
      val nl = 150000L + 850000L * (hub / 4L) / 1000000L
      hub = nh; leaf = nl
    }
    assert(scores(0L) == hub && scores(1L) == leaf)
  }

  test("quantizedTopK: integer scores, self is rank 1, ties break on id") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)), // identical direction to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizedTopK(
        emb.filter(col("vec_id") === 0), emb, k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // codes for (1,0,0) are (127,0,0): dot=16129 for cands 0 and 1
    // (tie breaks on cand_id), 0 for the orthogonal vector, -16129 for
    // the opposite one — k=3 keeps 0, 1, then 2
    assert(got.toSeq == Seq((1L, 0L, 16129L), (2L, 1L, 16129L),
      (3L, 2L, 0L)))
  }

  test("twoStageTopK == bruteForce when the shortlist covers the corpus") {
    val rnd = new scala.util.Random(7)
    val emb = (0L until 12L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("probe_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // expand=4 → shortlist 12 = whole corpus → stage 2 IS brute force
    val two = rows(Similarity.twoStageTopK(probes, emb, k = 3, expand = 4))
    val brute = rows(Similarity.bruteForceTopK(probes, emb, k = 3))
    assert(two.toSeq == brute.toSeq)
  }

  test("native quantize/randomProject are bit-equal to the HOF contracts") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 50L).map(i => (i,
      if (i == 0) Array.fill(16)(0f) // all-zero → all-zero codes
      else Array.fill(16)(rnd.nextFloat() * 4f - 2f)))
      .toDF("vec_id", "embedding")
    val q = vecs.select(
        Similarity.quantizeInt8(col("embedding")).as("n"),
        Similarity.quantizeInt8Hof(col("embedding")).as("h"),
        Similarity.randomProject(col("embedding"), 5).as("pn"),
        Similarity.randomProjectHof(col("embedding"), 5).as("ph"))
      .collect()
    q.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"codes differ: $r")
      assert(r.getSeq[Double](2) == r.getSeq[Double](3), s"proj differ: $r")
    }
  }

  test("repetition: dup n-gram fractions and keep verdict") {
    val docs = Seq(
      (1L, "a b c d e"),             // 4 distinct bigrams, 0 dup
      (2L, "x y x y x y"),           // bigrams: xy yx xy yx xy → 3 dup of 5
      (3L, "one"),                   // no bigrams at all
      (4L, "")                       // split("") = [""] → no bigrams
    ).toDF("doc_id", "text")
    val got = graft.ext.Text.repetition(docs, "doc_id", "text",
        dupBigramMax = 0.30, dupTrigramMax = 0.20)
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 0L)
    assert(r1.getDouble(3) == 0.0 && r1.getBoolean(7))
    val r2 = got(1)
    assert(r2.getLong(1) == 5L && r2.getLong(2) == 3L)
    assert(r2.getDouble(3) == 0.6 && !r2.getBoolean(7))
    // trigrams of doc 2: xyx yxy xyx yxy → 2 dup of 4
    assert(r2.getLong(4) == 4L && r2.getLong(5) == 2L)
    val r3 = got(2)
    assert(r3.getLong(1) == 0L && r3.getDouble(3) == 0.0
      && r3.getBoolean(7))
    assert(got(3).getLong(1) == 0L && got(3).getBoolean(7))
  }

  test("autoPlanes: occupancy-constant sizing pins the measured points") {
    // the sf0.1 corpus (2,000 vectors) must keep the pinned planes=4,
    // and the 30x stress corpus must get the measured-correct 9 (the
    // crossover where planes=4's maxBucket cap truncates knnGraph)
    assert(Similarity.autoPlanes(2000L) == 4)
    assert(Similarity.autoPlanes(60000L) == 9)
    // base floor: tiny corpora never drop below wide-bucket recall
    assert(Similarity.autoPlanes(0L) == 4)
    assert(Similarity.autoPlanes(100L) == 4)
    // the defining invariant: expected occupancy n / 2^planes stays at
    // or under targetBucket whenever planes isn't floored at base
    for (n <- Seq(10000L, 123456L, 10000000L, 1234567890L)) {
      val p = Similarity.autoPlanes(n)
      assert(n.toDouble / (1L << p) <= 128.0, s"occupancy blown at n=$n")
      // and minimality: one fewer plane would blow the target
      assert(p == 4 || n.toDouble / (1L << (p - 1)) > 128.0,
        s"oversized planes at n=$n")
    }
    // 63-plane ceiling (bucket ids are sign bits of one Long)
    assert(Similarity.autoPlanes(Long.MaxValue, targetBucket = 1) == 63)
  }

  test("PlanesAuto default: knnGraph/semanticDedup auto-size from the " +
      "corpus count; explicit planes pass through untouched") {
    // round-11 default flip: callers who pass nothing get the
    // occupancy-constant rule — the measured points (4 at the sf0.1
    // corpus, 9 at the 30x stress corpus) checked via the hint path
    val vecs = (1L to 60L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 13) % 29 - 14).toFloat))
    }.toDF("vec_id", "embedding")
    assert(Similarity.resolvePlanes(vecs, Similarity.PlanesAuto,
      Some(2000L)) == 4)
    assert(Similarity.resolvePlanes(vecs, Similarity.PlanesAuto,
      Some(60000L)) == 9)
    // no hint -> one count job; 60 rows floor at base=4
    assert(Similarity.resolvePlanes(vecs, Similarity.PlanesAuto,
      None) == 4)
    // explicit values pass through, out-of-range ones fail loudly
    assert(Similarity.resolvePlanes(vecs, 9, Some(10L)) == 9)
    intercept[IllegalArgumentException] {
      Similarity.resolvePlanes(vecs, 64, None)
    }
    // default-arg call == explicit autoPlanes(count) call, row-for-row
    val auto = Similarity.knnGraph(vecs, k = 3)
      .collect().map(_.toSeq).toSet
    val pinned = Similarity.knnGraph(vecs, k = 3,
        planes = Similarity.autoPlanes(60L))
      .collect().map(_.toSeq).toSet
    assert(auto == pinned && auto.nonEmpty)
    val autoSd = Similarity.semanticDedup(vecs, threshold = 0.99)
      .collect().map(_.toSeq).toSet
    val pinnedSd = Similarity.semanticDedup(vecs, threshold = 0.99,
        planes = Similarity.autoPlanes(60L))
      .collect().map(_.toSeq).toSet
    assert(autoSd == pinnedSd)
  }

  test("knnGraph: bounded-heap top-k == window formulation per bucket") {
    import org.apache.spark.sql.expressions.Window
    val vecs = (1L to 60L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 13) % 29 - 14).toFloat))
    }.toDF("vec_id", "embedding")
    val got = Similarity.knnGraph(vecs, k = 3, planes = 2)
      .select("vec_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: explicit bucket + cosine + row_number window
    val e = vecs.select(col("vec_id"),
        Similarity.toDouble(col("embedding")).as("embd"))
      .withColumn("bucket", Similarity.lshBucket(col("embd"), 2))
    val want = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("neighbor_id"),
        Similarity.cosine(col("a.embd"), col("b.embd")).as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("score").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= 3)
      .select("vec_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("knnGraph: oversized buckets are dropped, not exploded") {
    // planes=1 → 2 buckets; cap of 5 must drop any bucket bigger than 5
    val vecs = (1L to 40L).map { i =>
      (i, Array.tabulate(4)(d => (i + d).toFloat))
    }.toDF("vec_id", "embedding")
    val all = Similarity.knnGraph(vecs, k = 2, planes = 1,
      maxBucket = 5)
    val sizes = vecs.select(
        Similarity.lshBucket(Similarity.toDouble(col("embedding")), 1)
          .as("bucket"))
      .groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keptIds = all.select("vec_id").distinct().count()
    val expected = sizes.valuesIterator.filter(_ <= 5).sum
    assert(keptIds == expected,
      s"sizes=$sizes kept=$keptIds expected=$expected")
  }

  test("collocations: lift ranks glued pairs above frequent-word pairs") {
    // "new york" always adjacent; "the" everywhere dilutes "the end"
    val docs = Seq.tabulate(10) { i =>
      (i.toLong, "new york " + ("the end " * (i % 3 + 1)).trim)
    }.toDF("doc_id", "text")
    val got = graft.ext.Text.collocations(docs, "text", topK = 5,
      minCount = 5L).collect()
    assert(got.nonEmpty)
    val top = got.head
    assert(top.getString(0) == "new york", s"top=$top")
    // hand-check: c_xy=10, c_x=10, c_y=10, N = total tokens
    val n = docs.select(explode(split(col("text"), " "))).count()
    val lift = (10.0 / 10.0) * (n.toDouble / 10.0)
    assert(top.getLong(1) == 10L && top.getDouble(4) == lift)
    // every emitted pair respects the minCount floor
    got.foreach(r => assert(r.getLong(1) >= 5L))
  }

  test("misraGries: exact when distinct items fit the capacity") {
    val items = Seq("a", "a", "a", "b", "b", "c").toDF("item")
      .repartition(3)
    val got = graft.ext.Freq.heavyHitters(items, "item", capacity = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a", 3L), (2L, "b", 2L), (3L, "c", 1L)))
  }

  test("misraGries: guarantees hold under eviction and merge") {
    // zipf-ish stream: item i occurs 2^(8-i) times, i = 1..8 → N = 510;
    // capacity 3 forces constant eviction, repartition(7) forces merges
    val stream = (1 to 8).flatMap(i => Seq.fill(1 << (8 - i))(s"t$i"))
    val items = stream.toDF("item").repartition(7)
    val n = stream.size.toLong
    val cap = 3
    val est = graft.ext.Freq.heavyHitters(items, "item", cap)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est.size <= cap)
    val exact = stream.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    exact.foreach { case (k, cnt) =>
      val e = est.getOrElse(k, 0L)
      assert(e <= cnt, s"$k overcounted: est=$e cnt=$cnt")
      assert((cnt - e) * (cap + 1) <= n, s"$k err bound: est=$e cnt=$cnt")
      if (cnt * (cap + 1) > n)
        assert(est.contains(k), s"heavy item $k missing from sketch")
    }
  }

  test("heavyHittersAudit: exact top-k rows, all guarantee facts true") {
    val items = (1 to 6).flatMap(i => Seq.fill(i * i)(s"w$i"))
      .toDF("item").repartition(5)
    val got = graft.ext.Freq.heavyHittersAudit(items, "item",
      capacity = 2, topK = 4).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("w6", "w5", "w4", "w3"))
    assert(got.map(_.getLong(1)).toSeq == Seq(36L, 25L, 16L, 9L))
    got.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4), r)
    }
  }

  test("quantileAudit: GK rank guarantees hold on a skewed column") {
    // heavy-tailed values, many partitions → summaries genuinely merge
    val vals = (1 to 2000).map(i => (i.toLong, (i * i).toDouble / 100.0))
      .toDF("id", "v").repartition(11)
    val got = graft.ext.Freq.quantileAudit(vals, "v",
      ps = Seq(0.1, 0.5, 0.9, 0.99), accuracy = 50).collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(0.1, 0.5, 0.9, 0.99))
    got.foreach { r =>
      assert(r.getLong(1) == 2000L)
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4), r)
    }
  }

  test("plan shapes: knnGraph/weightedPriority/heavyHitters stay off " +
      "windows and keep map-side partials") {
    val vecs = (1L to 30L).map(i =>
      (i, Array.tabulate(8)(d => ((i + d) % 7 - 3).toFloat)))
      .toDF("vec_id", "embedding").repartition(4)
    val knn = Similarity.knnGraph(vecs, k = 3, planes = 2)
      .queryExecution.executedPlan.toString
    // ranking via bounded heaps (map-side partial), never a window;
    // the bucket-size cap joins via broadcast, not another shuffle
    assert(knn.contains("partial_top_k_by_score"), knn.take(800))
    assert(!knn.contains("Window"), knn.take(800))
    assert(knn.contains("BroadcastHashJoin"), knn.take(800))

    val docs = (1L to 50L).map(i => (i, s"s${i % 3}", i % 9 + 1))
      .toDF("doc_id", "source", "w").repartition(4)
    val wp = graft.ext.Sampling.weightedPriority(docs, col("source"),
        "doc_id", col("w"), k = 3)
      .queryExecution.executedPlan.toString
    assert(wp.contains("partial_top_k_by_score"), wp.take(800))
    assert(!wp.contains("Window"), wp.take(800))

    val items = Seq("a", "b", "a").toDF("item").repartition(3)
    val hh = graft.ext.Freq.heavyHitters(items, "item", 4)
      .queryExecution.executedPlan.toString
    // two-phase sketch: capacity-bounded partial maps, then merge
    assert(hh.contains("partial_misra_gries"), hh.take(800))
  }

  test("semanticDedup: transitive clusters, min-id canonical, drops") {
    // two tight clusters (1,2,3 near-identical; 10,11 near-identical)
    // plus isolated 20: chains must close transitively even if e.g.
    // 1~3 only ever surfaces via 2
    def v(base: Int, jitter: Float) =
      Array.tabulate(8)(d => math.sin(base * 31 + d).toFloat + jitter)
    val vecs = Seq(
      (1L, v(1, 0f)), (2L, v(1, 0.01f)), (3L, v(1, 0.02f)),
      (10L, v(2, 0f)), (11L, v(2, 0.01f)),
      (20L, v(3, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, threshold = 0.99,
        k = 5, planes = 1)
      .orderBy("component").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 1L, 2L), (10L, 2L, 10L, 1L)),
      got.mkString(", "))
  }

  test("rankSliced == window formulation, ties break on id") {
    import org.apache.spark.sql.expressions.Window
    // scores collide on purpose (i % 40): tie-break paths are exercised
    val rows = (1L to 400L).map(i =>
      (i, s"k${i % 3}", (i % 40).toDouble / 40.0))
      .toDF("id", "key", "score").repartition(7)
    val got = graft.ops.ScaleOps.rankSliced(rows, col("key"), "id",
        col("score"), slices = 8, lo = 0.0, hi = 1.0)
      .select("id", "rank", "pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("key")
      .orderBy(col("score").desc, col("id").asc)
    val n = Window.partitionBy("key")
    val want = rows
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("pct",
        when(count(lit(1)).over(n) === 1L, lit(0.0))
          .otherwise((col("rank") - 1L).cast("double") /
            (count(lit(1)).over(n) - 1L).cast("double")))
      .select("id", "rank", "pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // out-of-range scores clamp into the edge slices, ranks still exact
    val oob = Seq((1L, "a", -5.0), (2L, "a", 0.5), (3L, "a", 99.0))
      .toDF("id", "key", "score")
    val gotOob = graft.ops.ScaleOps.rankSliced(oob, col("key"), "id",
        col("score"), slices = 4, lo = 0.0, hi = 1.0)
      .select("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotOob == Set((3L, 1L), (2L, 2L), (1L, 3L)))
  }

  test("sourceOverlap: exact vocab sizes, intersection, jaccard") {
    val docs = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "c d"),
      (3L, "s2", "c d e"), (4L, "s3", "x y")
    ).toDF("doc_id", "source", "text")
    val got = graft.ext.Text.sourceOverlap(docs, "source", "text")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // s1={a,b,c,d} s2={c,d,e} overlap {c,d}; s3 disjoint → no row
    assert(got.toSeq == Seq(("s1", "s2", 4L, 3L, 2L, 2.0 / 5.0)))
  }

  test("dupComponents: pointer jumping closes a 300-hop chain in " +
      "20 rounds") {
    // a pure path graph — worst case for plain min-label propagation
    // (needs 300 rounds); path halving must close it in O(log n)
    val chain = (1L until 300L).map(i => (i, i + 1L)).toDF("id_a", "id_b")
    val got = graft.ext.Dedup.dupComponents(chain, maxIter = 20)
      .agg(countDistinct("component").as("nc"),
        min("component").as("mn"), count(lit(1)).as("n")).collect()(0)
    assert(got.getLong(0) == 1L && got.getLong(1) == 1L
      && got.getLong(2) == 300L)
  }

  test("fuzzyKeyPairs: blocked levenshtein pairs, cap respected") {
    val rows = Seq(
      (1L, "red widget"), (2L, "rad widget"),   // dist 1, same block
      (3L, "blue widget"),                      // dist 4 from both
      (4L, "red bolt"), (5L, "red belt"),       // dist 1, blocks differ
      (6L, "green gear")
    ).toDF("id", "name")
    val got = graft.ext.Dedup.fuzzyKeyPairs(rows, "id", "name",
        substring_index(col("name"), " ", -1), maxDist = 4)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (4,5) NOT found: blocks "bolt" vs "belt" differ — the documented
    // blocking recall trade-off
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // cap: block "widget" has 3 rows; maxBlock=2 must drop all its pairs
    val capped = graft.ext.Dedup.fuzzyKeyPairs(rows, "id", "name",
        substring_index(col("name"), " ", -1), maxDist = 4, maxBlock = 2)
      .count()
    assert(capped == 0L)
    val audit = graft.ext.Dedup.oversizedFuzzyBlocks(rows,
        substring_index(col("name"), " ", -1), maxBlock = 2).collect()
    assert(audit.map(_.getString(0)).toSet == Set("widget"))
  }

  test("clusterCohesion: cliques dense, chains flagged, pairs exempt") {
    // component 1: triangle {1,2,3} (3 edges, density 1e6)
    // component 10: chain 10-11-12 (2 edges, density 666666 -> suspect)
    // component 20: pair {20,21} (density 1e6 by construction, n=2 exempt)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (12L, 10L), (20L, 20L), (21L, 20L)).toDF("id", "component")
    val got = graft.ext.Dedup.clusterCohesion(pairs, labels)
      .orderBy("component")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 1000000L, false),
      (10L, 3L, 2L, 666666L, true),
      (20L, 2L, 1L, 1000000L, false)))
  }

  test("episodes: in-order label concat per session, gap splits sequences") {
    val got = Sessionize.episodes(events, "user_id", "ts", "event_id",
        "event_id", gapSec = 3600L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "episode")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, "10,11,12"), // one session, exact ts order
      (1L, 2L, 1L, "13"),       // 2h gap -> new episode
      (2L, 1L, 1L, "20"),
      (3L, 1L, 2L, "30,31")))   // exactly-gap boundary stays together
  }
}
