package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, Text}

/** Round-6 corpus-preparation operators: decontamination, temperature
  * mixture resampling, quality rules, PII redaction.
  */
class MixGateSpec extends SparkSuite {
  import spark.implicits._

  test("decontaminate: drops exactly docs sharing an n-gram with benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 4-gram with bench
      (2L, "one two three four five"),        // clean
      (3L, "zz alpha beta gamma delta"),      // shares (shifted window)
      (4L, "beta alpha gamma delta epsilon")  // same tokens, no shared 4-gram
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "intro alpha beta gamma delta outro"))
      .toDF("doc_id", "text")
    val kept = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("decontaminate: short benchmark docs contribute no grams") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b")).toDF("doc_id", "text") // < n tokens
    assert(Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .count() == 1L)
  }

  test("temperatureMix: head stratum keeps baseRate, rare strata keep more") {
    val docs = (1L to 4000L).map { i =>
      (i, if (i % 5 == 0) "rare" else "head") // 800 rare, 3200 head
    }.toDF("id", "s")
    val out = Sampling.temperatureMix(docs, col("id"), col("s"), 0.2)
    val by = out.groupBy("s").count().as[(String, Long)].collect().toMap
    // head: rate 0.2 of 3200 = ~640; rare: 0.2*sqrt(4) = 0.4 of 800 = ~320
    assert(math.abs(by("head") - 640.0) / 640.0 < 0.15, by.toString)
    assert(math.abs(by("rare") - 320.0) / 320.0 < 0.15, by.toString)
    // deterministic: identical selection on re-run
    val again = Sampling.temperatureMix(docs, col("id"), col("s"), 0.2)
    assert(out.select("id").except(again.select("id")).isEmpty)
    assert(again.select("id").except(out.select("id")).isEmpty)
  }

  test("temperatureMix: null-stratum rows form a stratum, not a drop") {
    val docs = ((1L to 300L).map(i => (i, "head")) ++
      (301L to 400L).map(i => (i, null: String))).toDF("id", "s")
    val out = Sampling.temperatureMix(docs, col("id"), col("s"), 0.5)
    val nullKept = out.filter(col("s").isNull).count()
    // null stratum: 100 rows at rate min(1, 0.5*sqrt(3)) ≈ 0.866 → ~87;
    // the pre-fix === join dropped all of them.
    assert(nullKept > 50L, s"null-stratum rows dropped: kept $nullKept")
    // and the non-null stratum is unaffected by the null group's presence
    val headOnly = Sampling.temperatureMix(
      docs.filter(col("s").isNotNull), col("id"), col("s"), 0.5)
    assert(out.filter(col("s") === "head").count() >= headOnly.count())
  }

  test("temperatureMix: nested across baseRate sweeps") {
    val docs = (1L to 1000L).map(i => (i, s"s${i % 3}")).toDF("id", "s")
    val lo = Sampling.temperatureMix(docs, col("id"), col("s"), 0.1)
      .select("id").as[Long].collect().toSet
    val hi = Sampling.temperatureMix(docs, col("id"), col("s"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi), s"${(lo -- hi).take(5)} kept at 0.1 but not 0.5")
  }

  test("prepareTrainingData equals the hand-chained stages") {
    import graft.ext.{Curation, Sampling}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val got = Curation.prepareTrainingData(corpus, bench)
      .select("doc_id", "shard").orderBy("doc_id").collect().toSeq

    val passing = Text.qualityRules(corpus).filter(col("passes"))
      .select("doc_id")
    val gated = corpus.join(passing, Seq("doc_id"), "left_semi")
    val keepers = gated
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
    val deduped = gated.join(keepers, Seq("doc_id"), "left_semi")
    val clean = Dedup.decontaminate(deduped, bench, "doc_id", "text", 4)
    val capped = Sampling.capPerKey(clean, col("source"), "doc_id", 15,
      Sampling.seededHash(7))
    val mixed = Sampling.temperatureMix(capped, col("doc_id"), col("lang"),
      0.5, Sampling.seededHash(13))
    val want = Sampling.shardAssign(mixed, col("doc_id"), 4,
      Sampling.seededHash(19))
      .select("doc_id", "shard").orderBy("doc_id").collect().toSeq
    assert(got == want)
    // every stage genuinely filters at this SF (no stage is a no-op)
    assert(got.nonEmpty && got.size < corpus.count())
    assert(capped.count() < clean.count())
    assert(mixed.count() < capped.count())
  }

  test("qualityRules: each degenerate doc fails exactly its rule") {
    val docs = Seq(
      (1L, Seq.fill(50)("word").mkString(" ")),          // repetition
      (2L, "too short"),                                  // length
      (3L, Seq.fill(40)("abcdefghijklmnop").zipWithIndex
        .map { case (w, i) => w + i }.mkString(" ")),     // long tokens
      (4L, (1 to 50).map(i => s"tok$i").mkString(" "))    // healthy
    ).toDF("doc_id", "text")
    val r = Text.qualityRules(docs).collect()
      .map(row => row.getLong(0) -> row).toMap
    assert(!r(1L).getAs[Boolean]("unique_ok"))
    assert(!r(1L).getAs[Boolean]("rep_ok"))
    assert(!r(2L).getAs[Boolean]("len_ok"))
    assert(!r(3L).getAs[Boolean]("mean_len_ok"))
    assert(r(4L).getAs[Boolean]("passes"))
    assert(!r(1L).getAs[Boolean]("passes") &&
      !r(2L).getAs[Boolean]("passes") && !r(3L).getAs[Boolean]("passes"))
  }

  test("redact: masks email, url, phone, long number; leaves prose alone") {
    val got = Seq("ping bob.smith+x@corp.example.com or " +
        "https://x.example/path?q=1 call +1 (415) 555-0199 acct 54321 " +
        "but keep year 199 and word9 intact")
      .toDF("text").select(Text.redact(col("text"))).as[String].head()
    // (an 8+-digit run is phone-shaped to the heuristic and masks as
    // <PHONE> — still masked, just typed differently; 4-7 digit runs
    // fall through to <NUM>)
    assert(got == "ping <EMAIL> or <URL> call +<PHONE> acct <NUM> " +
      "but keep year 199 and word9 intact", got)
  }

  test("redact: mask order prevents double-firing inside masked spans") {
    val got = Seq("mail a1234567@ex.org end")
      .toDF("text").select(Text.redact(col("text"))).as[String].head()
    // digits inside the email must not survive as a separate <NUM>
    assert(got == "mail <EMAIL> end", got)
  }

  test("weightedPriority: bounded-heap top-k == window formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", (i % 17) + 1L))
      .toDF("doc_id", "source", "w")
    val got = Sampling.weightedPriority(docs, col("source"), "doc_id",
        col("w"), k = 7)
      .select("stratum", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: explicit priority + row_number window
    val pri = Sampling.spreadHash(23)(col("doc_id").cast("string"))
      .cast("double") / col("w").cast("double")
    val want = docs.withColumn("__pri", pri)
      .withColumn("rank", row_number().over(Window.partitionBy("source")
        .orderBy(col("__pri").asc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= 7)
      .select(col("source"), col("rank"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.size == 14)
  }

  test("weightedPriority: zero/negative weights are excluded") {
    val docs = Seq((1L, "a", 5L), (2L, "a", 0L), (3L, "a", -2L))
      .toDF("doc_id", "source", "w")
    val ids = Sampling.weightedPriority(docs, col("source"), "doc_id",
        col("w"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("waterfill: allocation sums to budget; under-level sources keep all") {
    val rows = Seq(("tiny", 10L), ("small", 100L), ("big", 1000L),
      ("huge", 5000L)).flatMap { case (s, n) => Seq((s, n)) }
      .toDF("source", "tok")
    val got = Sampling.waterfill(rows, col("source"), col("tok"),
        budget = 1500L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // sorted totals: 10, 100, 1000, 5000; budget 1500
    // i=1: 1500 <= 4*10? no. i=2: 1490 <= 3*100? no.
    // i=3: 1390 <= 2*1000? yes → level = 1390 div 2 = 695, rem = 0
    assert(got("tiny") == ((10L, 10L, false)))
    assert(got("small") == ((100L, 100L, false)))
    assert(got("big") == ((1000L, 695L, true)))
    assert(got("huge") == ((5000L, 695L, true)))
    assert(got.values.map(_._2).sum == 1500L)
  }

  test("waterfill: remainder goes +1 to first capped sources by name") {
    val rows = Seq(("a", 100L), ("b", 100L), ("c", 100L))
      .toDF("source", "tok")
    val got = Sampling.waterfill(rows, col("source"), col("tok"),
        budget = 200L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // level = 200 div 3 = 66 rem 2 → a,b get 67, c gets 66
    assert(got == Map("a" -> 67L, "b" -> 67L, "c" -> 66L))
  }

  test("waterfill: budget >= total leaves every source uncapped") {
    val rows = Seq(("a", 10L), ("b", 20L)).toDF("source", "tok")
    val got = Sampling.waterfill(rows, col("source"), col("tok"),
        budget = 100L).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3),
        r.isNullAt(4))).toSet
    assert(got == Set(("a", 10L, false, true), ("b", 20L, false, true)))
  }
}
