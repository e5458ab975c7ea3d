package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.ops.BloomJoin

/** Bloom anti-join must be byte-equal to the plain anti join (the bloom
  * only routes rows, never decides membership); deterministic sampling
  * must be reproducible, nested across rates, and per-stratum exact.
  */
class BloomSamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val big = ((1L to 500L).map(i => (Some(i), s"p_$i")) ++
    Seq((Option.empty[Long], "p_null1"), (Option.empty[Long], "p_null2")))
    .toDF("k", "payload")
  // seen: every third key, plus keys the big side doesn't have
  private lazy val seen = (3L to 900L by 3L).map(Tuple1(_)).toDF("k")

  test("bloom antiJoin equals plain left_anti, null keys kept") {
    val viaBloom = BloomJoin.antiJoin(big, seen, "k",
        expectedItems = 1000L, fpp = 0.03)
      .orderBy(col("k").asc_nulls_first, col("payload"))
      .collect().toSeq
    val plain = big.join(seen, Seq("k"), "left_anti")
      .orderBy(col("k").asc_nulls_first, col("payload"))
      .collect().toSeq
    assert(viaBloom == plain)
    assert(viaBloom.count(_.isNullAt(0)) == 2) // null-key rows survive
  }

  test("bloom has no false negatives: every seen key is a might-hit") {
    val bf = BloomJoin.buildFilter(seen, "k", expectedItems = 1000L,
      fpp = 0.03)
    val misses = seen.filter(!BloomJoin.mightContain(bf, col("k"))).count()
    assert(misses == 0L)
  }

  test("skewAdvisor: exact shares, cross-product verdict, salt sizing") {
    // key "hot" has 8 of 12 rows (mean 3, 4 keys): skewed at factor 2;
    // the others (2, 1, 1) are not
    val rows = Seq.fill(8)("hot") ++ Seq("warm", "warm", "c1", "c2")
    val df = rows.toDF("k")
    val got = graft.ext.Profiler.skewAdvisor(df, col("k"), topK = 10,
        factor = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    // ordered by cnt desc, key asc
    assert(got.map(_._1).toSeq == Seq("hot", "warm", "c1", "c2"))
    val hot = got(0)
    assert(hot == (("hot", 8L, 666666L, true, 3L))) // 8*1e6/12; ceil(8/3)=3
    assert(got(1) == (("warm", 2L, 166666L, false, 1L)))
    assert(got.count(_._4) == 1) // only `hot` flagged at factor 2
    // topK truncates deterministically
    val top1 = graft.ext.Profiler.skewAdvisor(df, col("k"), topK = 1,
      factor = 2L).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "hot")
  }

  test("profiler: nulls counted, distinct excludes null, min/max ignore null") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null),
      (2L, "b"), (null, "a")).toDF("k", "v")
    val got = graft.ext.Profiler.profile(df, Seq("k", "v"))
      .orderBy("col_name").collect()
    val k = got(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 3 && k.getLong(2) == 1)
    assert(k.getLong(3) == 2) // distinct non-null {1,2}
    assert(k.getString(4) == "1" && k.getString(5) == "2")
    val v = got(1)
    assert(v.getLong(1) == 3 && v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getString(4) == "a" && v.getString(5) == "b")
  }

  test("deterministic sample: reproducible, nested, roughly sized") {
    val docs = (1L to 2000L).map(i => (i, s"text $i")).toDF("id", "text")
    def ids(rate: Double): Set[Long] =
      Sampling.deterministic(docs, col("id"), rate)
        .select("id").collect().map(_.getLong(0)).toSet
    val s20a = ids(0.2)
    val s20b = ids(0.2)
    val s50 = ids(0.5)
    assert(s20a == s20b)            // reproducible
    assert(s20a.subsetOf(s50))      // nested: lower rate ⊆ higher rate
    assert(math.abs(s20a.size - 400) < 120) // ~rate·n, hash-uniform
    assert(math.abs(s50.size - 1000) < 150)
  }

  test("sampleHash matches a pure-Scala reference (constants pinned)") {
    // guards the portable constants: a drift here silently desyncs every
    // committed q47-style oracle
    val P = 1000000007L; val B = 31L
    def ref(s: String): Long = {
      val poly = s.foldLeft(0L)((acc, ch) => (acc * B + ch.toLong) % P)
      (((7L * 40503 + 17) % P) * poly % P + (7L * 97 + 1) % P) % P
    }
    val keys = Seq("0", "1", "42", "999983", "-7", "hello world", "",
      (1L to 40L).mkString(","))
    val got = keys.toDF("k")
      .select(Sampling.sampleHash(col("k")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == keys.map(ref))
  }

  test("stratified sample equals per-stratum uniform samples") {
    val docs = (1L to 1500L).map(i =>
      (i, Seq("en", "de", "zh")(i.toInt % 3))).toDF("id", "lang")
    val rates = Map("en" -> 0.6, "de" -> 0.3)
    val got = Sampling.stratified(docs, col("id"), col("lang"), rates,
        defaultRate = 0.05)
      .orderBy("id").collect().toSeq
    val want = Seq("en" -> 0.6, "de" -> 0.3, "zh" -> 0.05).map {
      case (lang, r) =>
        Sampling.deterministic(docs.filter(col("lang") === lang),
          col("id"), r)
    }.reduce(_ unionByName _).orderBy("id").collect().toSeq
    assert(got == want)
    // the zh stratum exercises the default-rate fallback, non-trivially
    assert(got.exists(_.getString(1) == "zh"))
  }

  test("stratified: unlisted stratum falls back under ANSI mode") {
    val docs = (1L to 200L).map(i => (i, "xx")).toDF("id", "lang")
    val prior = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // "xx" is absent from the rate map: element_at would throw
      // MAP_KEY_DOES_NOT_EXIST here; try_element_at must fall through
      // to defaultRate.
      val kept = Sampling.stratified(docs, col("id"), col("lang"),
        Map("en" -> 0.9), defaultRate = 1.0).count()
      assert(kept == 200L)
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("stratifiedSql escapes single quotes in stratum values") {
    val sql = Sampling.stratifiedSql("id", "lang",
      Map("o'brien" -> 0.5), defaultRate = 0.1)
    assert(sql.contains("'o''brien'"))
    assert(!sql.contains("'o'brien'"))
  }

  test("capPerKey: keeps exactly the top-n hash winners per key") {
    val docs = (1L to 900L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val capped = Sampling.capPerKey(docs, col("src"), "id", n = 10)
    val byKey = capped.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.toSet == Set(10L), byKey.toString)
    // same winners as the window formulation, row for row
    import org.apache.spark.sql.expressions.Window
    val want = docs
      .withColumn("__h", Sampling.sampleHash(col("id").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("__h").desc, col("id").asc)))
      .filter(col("rn") <= 10).select("id").as[Long].collect().toSet
    assert(capped.select("id").as[Long].collect().toSet == want)
    // scale contract: the plan aggregates with bounded heaps, no Window
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by_score"), plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
  }

  test("capPerKey: a key with fewer rows than the cap keeps them all") {
    val docs = ((1L to 3L).map(i => (i, "tiny")) ++
      (4L to 40L).map(i => (i, "big"))).toDF("id", "src")
    val capped = Sampling.capPerKey(docs, col("src"), "id", n = 5)
    assert(capped.filter(col("src") === "tiny").count() == 3L)
    assert(capped.filter(col("src") === "big").count() == 5L)
  }

  test("shardAssign: pos is the portable hash, shard its mod, rows intact") {
    val docs = (1L to 400L).map(i => (i, s"d$i")).toDF("id", "payload")
    val out = Sampling.shardAssign(docs, col("id"), numShards = 8)
    assert(out.count() == 400L)
    assert(out.filter(col("shard") < 0 || col("shard") >= 8).isEmpty)
    assert(out.filter(col("pos") =!=
      Sampling.sampleHash(col("id").cast("string"))).isEmpty)
    assert(out.filter(col("shard") =!= pmod(col("pos"), lit(8L)).cast("int"))
      .isEmpty)
    // every shard is hit at n=400 (hash spreads short numeric keys)
    assert(out.select("shard").distinct().count() == 8L)
  }
}
