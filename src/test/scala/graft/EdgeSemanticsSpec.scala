package graft

import org.apache.spark.sql.functions._

/** Defined semantics for the degenerate inputs real 100 TB corpora carry
  * (found by the fuzz-corpus oracle gate, tools/gen_fuzz.py): empty
  * documents, zero/huge embeddings, astral-plane (non-BMP) text,
  * punctuation that collides with internal encodings. Each case here is
  * the unit-level pin of a cross-engine divergence or crash that gate
  * surfaced — the full-corpus proof is `Verify` + `check_oracle.py` over
  * a generated fuzz dir; these keep the semantics from regressing in
  * plain `sbt test`.
  */
class EdgeSemanticsSpec extends SparkSuite {
  import graft.ext.{Similarity, Text}
  import graft.functions.{NativeHash, NativeString}

  test("qualityScore of an empty text is defined (no divide-by-zero)") {
    import spark.implicits._
    val got = Seq(("", 1L), ("the fast table", 2L)).toDF("text", "doc_id")
      .select(Text.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    // empty: nStop/nTok = 0/1, punct fraction DEFINED 0 → 0*2 + 1 + 0.01
    assert(got(0) == 1.01)
    assert(!got.exists(_.isNaN))
  }

  test("cosine with a zero-norm side is 0.0 on all three paths") {
    import spark.implicits._
    val df = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
        (Array(0f, 0f, 0f), Array(0f, 0f, 0f)))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val native = df.select(Similarity.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val hof = df.select(Similarity.cosineHof(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(native.toSeq == Seq(0.0, 0.0))
    assert(hof.toSeq == Seq(0.0, 0.0))
    // and a zero vector can never out-rank a genuine neighbor
    val real = df.limit(1).select(
      Similarity.cosine(col("b"), col("b"))).head.getDouble(0)
    assert(real == 1.0 && real > native(0))
  }

  test("portable hash folds code points: astral chars hash as ONE value " +
      "and native == HOF twin") {
    import spark.implicits._
    val texts = Seq("🚀 data 🚀", "déjà vu",
      "你好 世界", "plain ascii")
    val df = texts.toDF("text")
    val native = df.select(NativeHash.polyHash(col("text")))
      .collect().map(_.getLong(0))
    val hof = df.select(graft.functions.PortableHash.polyHash(col("text")))
      .collect().map(_.getLong(0))
    assert(native.toSeq == hof.toSeq)
    // first fold step of "🚀..." is the code point 128640, not a
    // surrogate half (55357)
    val first = df.limit(1).select(NativeHash.polyHash(lit("🚀")))
      .head.getLong(0)
    assert(first == 128640L % graft.functions.PortableHash.P)
  }

  test("char shingles and char jaccard window code points") {
    import spark.implicits._
    // "🚀ab" = 3 code points → two 2-grams; a code-unit window would
    // see 4 units → three 2-grams (one splitting the surrogate pair)
    val df = Seq("🚀ab").toDF("text")
    val n = df.select(size(NativeHash.charShingleHashes(col("text"), 2)))
      .head.getInt(0)
    assert(n == 2)
    // jaccard of the emoji text with itself is exactly 1 (self-identical
    // sets) and with a BMP-only text is computable, never NaN
    val j = df.select(NativeString.charJaccard(col("text"), col("text"), 2))
      .head.getDouble(0)
    assert(j == 1.0)
  }

  test("bpeEncode is total over punctuation (';' is data, not syntax) " +
      "and symbolizes astral chars as one symbol") {
    import spark.implicits._
    val df = Seq("a;b c", "🚀x").toDF("text")
    val got = df.select(Text.bpeEncode(col("text"), Seq("a" -> "b")))
      .collect().map(_.getString(0))
    // ';' rides through as an ordinary char symbol
    assert(got(0) == "a;b c")
    // the emoji is ONE symbol, so "🚀x" has two symbols, not three
    assert(got(1) == "🚀x")
  }

  test("centsSafe: NULL/NaN/±Inf/absurd-magnitude measurements are " +
      "missing, not crashes") {
    import spark.implicits._
    val df = Seq(Some(1.25), None, Some(Double.NaN),
        Some(Double.PositiveInfinity), Some(Double.NegativeInfinity),
        Some(1e17), Some(Double.MaxValue))
      .toDF("value")
    val got = df.select(queries.Q.centsSafe(col("value")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq ==
      Seq(Some(125L), None, None, None, None, None, None))
    // an aggregate over the dirty column: sum skips missing, count(*)
    // still counts every event — one bad reading cannot kill a stream
    val agg = df.agg(sum(queries.Q.centsSafe(col("value"))).as("s"),
      count(lit(1)).as("n")).head
    assert(agg.getLong(0) == 125L && agg.getLong(1) == 7L)
  }

  test("normalized fingerprint: native == HOF twin on full-mapping " +
      "lowercase (U+0130) and astral text") {
    import spark.implicits._
    val df = Seq("İstanbul DEDUP test", "🚀 Data 🚀", "Plain. Words,")
      .toDF("text")
    val native = df.select(Text.fingerprint(col("text")))
      .collect().map(_.getLong(0))
    val hof = df.select(Text.fingerprintHof(col("text")))
      .collect().map(_.getLong(0))
    assert(native.toSeq == hof.toSeq)
  }

  test("rankSliced: non-finite scores rank where both engines sort them " +
      "(NaN/+Inf top, -Inf bottom), no crash, no guard trip") {
    import spark.implicits._
    val df = Seq((1L, "k", 5.0), (2L, "k", Double.NaN),
      (3L, "k", Double.PositiveInfinity),
      (4L, "k", Double.NegativeInfinity), (5L, "k", 7.0))
      .toDF("id", "t", "v")
    val got = graft.ops.ScaleOps.rankSliced(df, col("t"), "id", col("v"),
        slices = 4, lo = 0.0, hi = 10.0)
      .orderBy("rank").collect().map(r => r.getAs[Long]("id"))
    // NaN first (both engines sort NaN greatest), then +Inf, then the
    // finite values descending, then -Inf
    assert(got.toSeq == Seq(2L, 3L, 5L, 1L, 4L))
  }

  test("empty inputs are total: bloom anti join, IVF index, perceptron, " +
      "quantile audit, merged lake read, stats-pruned commits") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val someDocs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    // empty seen set admits everything (and must not NPE in the bloom)
    assert(graft.ops.BloomJoin.antiJoin(someDocs, emptyDocs, "doc_id",
      expectedItems = 16).count() == 2)
    // empty corpus → empty index → empty searches, not a k-means crash
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val idx = ext.Similarity.IvfIndex.build(emptyEmb, nCentroids = 4)
    assert(idx.search(emptyEmb, k = 3).isEmpty)
    // all-identical corpus (dup-gate class): k must clamp to the
    // DISTINCT vector count — Spark ML's aggregator crashes when k
    // exceeds the distinct points — and search still ranks by the
    // deterministic (score DESC, cand_id) tie-break
    val monoEmb = (0L until 12L)
      .map(i => (i, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val monoIdx = ext.Similarity.IvfIndex.build(monoEmb, nCentroids = 4)
    val monoTop = monoIdx.search(monoEmb.filter(col("vec_id") === 7L), k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("cand_id")).toSeq
    assert(monoTop == Seq(0L, 1L, 2L),
      s"mono-corpus tie-break drifted: $monoTop")
    // training on nothing: zero gradient, zero misses, epochs intact
    val learned = ext.Learn.perceptron(emptyDocs,
      Seq(lit(1L), length(col("text")).cast("long")),
      label = length(col("text")) > 0, epochs = 3).collect()
    assert(learned.length == 3 &&
      learned.forall(r => (1 to 3).forall(i => r.getLong(i) == 0L)))
    // quantile audit: one row PER PROBE even over nothing, vacuously ok
    val audit = ext.Freq.quantileAudit(
      Seq.empty[Double].toDF("value"), "value", ps = Seq(0.25, 0.75))
      .collect()
    assert(audit.length == 2 && audit.forall(r =>
      r.getAs[Long]("n_rows") == 0L && r.getAs[Boolean]("in_range")))
    // an empty-but-present lake is a lake (schema from footers)
    val d = tmpDir()
    emptyDocs.write.parquet(s"$d/gen=a")
    val merged = graft.lake.DataLake.readMerged(spark, d)
    assert(merged.isDefined && merged.get.isEmpty)
    // an empty stats-tracked commit is always prunable
    val vdir = tmpDir()
    graft.lake.Versioned.commitWithStats(spark, vdir, emptyDocs, "doc_id")
    val pruned = graft.lake.Versioned.readPruned(spark, vdir, "doc_id",
      0L, 100L)
    assert(pruned.isEmpty && pruned.inputFiles.length <= 1)
  }

  test("groupDiversity survives huge-magnitude elements (decimal " +
      "squares, no long overflow)") {
    import spark.implicits._
    val df = Seq((0, Array(1e6f, 0f)), (0, Array(1e6f, 2f)))
      .toDF("label", "embedding")
    val r = Similarity.groupDiversity(df).collect()
    assert(r.length == 1)
    val div = r(0).getAs[Double]("diversity")
    // variance of {0, 2} in dim 2 only: E[x²]−E[x]² = 2−1 = 1
    assert(math.abs(div - 1.0) < 1e-6, s"diversity was $div")
  }
}
