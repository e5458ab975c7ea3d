package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, Text}

/** Extension operators: dedup invariants, similarity ranking, text
  * analysis, multimodal plumbing.
  */
class ExtSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog indeed"), // near dup (superset)
    (3L, "completely different content about spark engines and scale"),
    (4L, "short doc")
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest id per group") {
    val out = docs.transform(Dedup.exact(Seq("text"), "doc_id"))
      .orderBy("keep_doc_id").collect()
    assert(out.length == 4)
    assert(out.head.getLong(1) == 0L && out.head.getLong(2) == 2L)
  }

  test("minhash: identical docs → identical signature; near-dup shares buckets") {
    val sigs = docs.filter($"doc_id" < 4)
      .select($"doc_id", Dedup.minHashSignature($"text", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    val cands = Dedup.minHashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L))) // exact dup always a candidate
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc isn't
  }

  test("ngram jaccard: 1.0 for identical, 0 for disjoint, symmetric-ish middle") {
    val rows = docs.as("a").crossJoin(docs.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.ngramJaccard($"a.text", $"b.text").as("j"))
      .collect()
    // doc 4 has < 3 tokens → empty shingle set → NULL jaccard by definition
    assert(rows.filter(r => r.getLong(0) == 4L && r.getLong(1) == 4L)
      .forall(_.isNullAt(2)))
    val j = rows.filterNot(_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j((0L, 3L)) == 0.0)
    assert(j((0L, 2L)) == 7.0 / 8.0) // shingles of 0 ⊂ shingles of 2
  }

  test("native hash expressions are bit-identical to the HOF reference forms") {
    // ≥3 tokens: the domain every caller filters to (short docs diverge by
    // design: native minhash yields zeros where the HOF form yields nulls)
    val cmp = docs.filter(size(split($"text", " ")) >= 3).select(
      Dedup.minHashSignature($"text", 16).as("nat_sig"),
      Dedup.minHashSignatureHof($"text", 16).as("hof_sig"),
      Dedup.simHash($"text").as("nat_sh"),
      Dedup.simHashHof($"text").as("hof_sh"),
      graft.functions.NativeHash.polyHash($"text").as("nat_ph"),
      graft.functions.PortableHash.polyHash($"text").as("hof_ph"),
      Text.fingerprint($"text").as("nat_fp"),
      Text.fingerprintHof($"text").as("hof_fp"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
      assert(r.getLong(4) == r.getLong(5))
      assert(r.getLong(6) == r.getLong(7))
    }
  }

  test("simhash: identical → hamming 0; near-dup closer than unrelated") {
    val sh = docs.select($"doc_id", Dedup.simHash($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(0L, 1L) == 0)
    assert(ham(0L, 2L) < ham(0L, 3L))
  }

  test("nearDuplicates two-phase pipeline finds the planted pair") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((0L, 1L)) && nd.contains((0L, 2L)))
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("native vector expressions are bit-identical to HOF reference forms") {
    val e = Similarity.toDouble($"embedding")
    val cmp = vecs.as("a").crossJoin(vecs.as("b")).select(
      Similarity.cosine(Similarity.toDouble($"a.embedding"),
        Similarity.toDouble($"b.embedding")).as("nat"),
      Similarity.cosineHof(Similarity.toDouble($"a.embedding"),
        Similarity.toDouble($"b.embedding")).as("hof"),
      Similarity.lshBucket(Similarity.toDouble($"a.embedding"), 8).as("nb"),
      Similarity.lshBucketHof(Similarity.toDouble($"a.embedding"), 8).as("hb"))
      .collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("int8 quantization: codes bounded, signs preserved, max maps to ±127") {
    val rows = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)), // max|v|=1.0 → -1.0 → -127
      (2L, Array(0.0f, 0.0f)),               // all-zero → zero codes, null scale
      (3L, Array(3.0f)))                     // single → 127
      .toDF("vec_id", "embedding")
    val got = rows.select($"vec_id",
        Similarity.quantizeInt8($"embedding").as("q"),
        Similarity.quantScale($"embedding").as("s"))
      .orderBy("vec_id").collect()
    assert(got(0).getSeq[Long](1) == Seq(64L, -127L, 32L, 0L)) // 0.5*127+0.5 → 64
    assert(got(1).getSeq[Long](1) == Seq(0L, 0L) && got(1).isNullAt(2))
    assert(got(2).getSeq[Long](1) == Seq(127L))
    // dequantized values stay within half a step of the originals
    val s0 = got(0).getDouble(2)
    val deq = got(0).getSeq[Long](1).map(_ / s0)
    Seq(0.5, -1.0, 0.25, 0.0).zip(deq).foreach { case (v, d) =>
      assert(math.abs(v - d) <= 0.5 / s0 + 1e-12)
    }
  }

  test("cosine top-k ranks by similarity with deterministic ties") {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, k = 4).orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(top.head.getDouble(3) == 1.0) // self-similarity exactly 1? (a·a)/(|a||a|)
  }

  test("lsh ann: identical vectors share a bucket; opposite vectors don't") {
    val b = vecs.select($"vec_id",
      Similarity.lshBucket(Similarity.toDouble($"embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) != b(3L)) // sign-flipped → complement bucket
    val ann = Similarity.annTopK(vecs.filter($"vec_id" === 0), vecs, k = 4)
      .collect().map(_.getLong(2)).toSet
    assert(ann.contains(0L) && !ann.contains(3L))
  }

  test("ivf ann: self-match first, decent recall vs brute force") {
    // denser corpus: 40 deterministic pseudo-random 8-dim vectors
    val corpus = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d =>
        (((i * 131 + d * 31 + 7) % 97).toFloat - 48f) / 48f))
    }.toDF("vec_id", "embedding")
    val probes = corpus.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(probes, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val ivf = Similarity.ivfTopK(probes, corpus, k = 5,
        nCentroids = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // self-match always rank 1 (cosine 1.0, probe ∈ corpus ∈ its own cell)
    ivf.filter(_._2 == 1L).foreach { case (p, _, c) => assert(p == c) }
    // recall@5 ≥ 3/5 per probe with half the cells probed
    val byProbe = ivf.groupBy(_._1)
    byProbe.foreach { case (p, rows) =>
      val hit = rows.map(_._3).toSet
        .intersect(brute(p).map(_._2).toSet).size
      assert(hit >= 3, s"probe $p recall $hit/5")
    }
  }

  test("text analysis counts and fingerprint invariance") {
    val r = Seq("The quick, brown fox! the end.").toDF("text")
      .transform(Text.analyze()).head
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_stopwords") == 1) // only the bare lowercase "the"
    assert(r.getAs[Int]("n_punct") == 3)
    // fingerprint invariant to case, punctuation, token order
    val fp = Seq(
      "Hello World again", "world hello AGAIN!", "hello world other")
      .toDF("text").select(Text.fingerprint($"text")).as[Long].collect()
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("native char jaccard equals the array-built HOF form") {
    val rows = docs.as("a").crossJoin(docs.as("b")).select(
      Dedup.charNgramJaccard($"a.text", $"b.text").as("nat"),
      Dedup.charNgramJaccardHof($"a.text", $"b.text").as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native countSubstr equals the replace-based HOF formula") {
    val texts = Seq("ababab", "the then there", "", "aaaa", "xyz").toDF("text")
    Seq("ab", "th", "aa").foreach { bg =>
      val rows = texts.select(
        graft.functions.NativeString.countSubstr($"text", bg).as("nat"),
        Text.bigramCountHof($"text", bg).as("hof")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"bg=$bg got ${r.getLong(0)} vs ${r.getLong(1)}"))
    }
  }

  test("langId is deterministic and favors matching bigram profiles") {
    val out = Seq("the then there rhythm", "esos estados espanoles")
      .toDF("text").select(Text.langId($"text")).as[String].collect()
    assert(out(0) == "en" && out(1) == "es")
  }

  test("multimodal: synthetic schema and byte sampling") {
    val media = Multimodal.synthesizeFromText(docs, "doc_id", "text")
    assert(media.schema("bytes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.select("meta.width").head.getInt(0) == 64 + 0 % 640)
    // sampleBytes: stride 1 over 'the...' → ascii codes of the text
    val s = media.filter($"media_id" === 4L)
      .select(Multimodal.sampleBytes($"bytes", 1, 4)).head.getSeq[Int](0)
    assert(s == Seq('s'.toInt, 'h'.toInt, 'o'.toInt, 'r'.toInt))
  }

  test("multimodal: real WAV payloads parse back to the exact samples") {
    import graft.ext.Multimodal
    val ids = Seq(0L, 1L, 7L, 49L, 123L).toDF("doc_id")
    val got = Multimodal.decodeAudio(Multimodal.synthesizeAudio(ids))
      .orderBy("media_id").collect()
    got.foreach { d =>
      val n = Multimodal.synthSampleCount(d.media_id)
      val samples = (0 until n).map(Multimodal.synthSample(d.media_id, _))
      assert(d.sample_rate == Multimodal.AudioRate && d.bits_per_sample == 8)
      assert(d.n_samples == n.toLong)
      assert(d.sum_samples == samples.map(_.toLong).sum)
      assert(d.max_sample == samples.max)
      assert(d.duration_us == n.toLong * 1000000L / Multimodal.AudioRate)
      assert(d.decim_sum ==
        samples.zipWithIndex.collect { case (v, i) if i % 4 == 0 => v.toLong }.sum)
    }
  }

  test("multimodal: WAV chunk walk skips unknown chunks before data") {
    import graft.ext.Multimodal
    // take a synthesized WAV and splice a LIST chunk between fmt and data
    val wav = Multimodal.synthesizeAudio(Seq(5L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]]("bytes")
    val listChunk =
      "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
        "INFO".getBytes("US-ASCII")
    val spliced = wav.slice(0, 36) ++ listChunk ++ wav.drop(36)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val total = spliced.length - 8
    Seq(0, 1, 2, 3).foreach(i =>
      spliced(4 + i) = ((total >> (8 * i)) & 0xff).toByte)
    val d = Multimodal.decodeAudio(
        Seq((5L, spliced)).toDF("media_id", "bytes"))
      .collect()(0)
    val n = Multimodal.synthSampleCount(5L)
    assert(d.n_samples == n.toLong)
    assert(d.sum_samples ==
      (0 until n).map(Multimodal.synthSample(5L, _).toLong).sum)
  }

  test("multimodal: WAV with fmt after data still parses (spec-legal order)") {
    import graft.ext.Multimodal
    // id=6 → n = 6%50+10 = 16 samples (even, so no pad-byte ambiguity)
    val wav = Multimodal.synthesizeAudio(Seq(6L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]]("bytes")
    val header = wav.slice(0, 12)        // RIFF....WAVE
    val fmtChunk = wav.slice(12, 36)     // "fmt " + len + 16-byte body
    val dataChunk = wav.drop(36)         // "data" + len + samples
    val reordered = header ++ dataChunk ++ fmtChunk
    val d = Multimodal.decodeAudio(
        Seq((6L, reordered)).toDF("media_id", "bytes"))
      .collect()(0)
    val n = Multimodal.synthSampleCount(6L)
    assert(d.n_samples == n.toLong)
    assert(d.sum_samples ==
      (0 until n).map(Multimodal.synthSample(6L, _).toLong).sum)
  }

  test("multimodal: truncated WAV data chunk fails loudly, not with AIOOBE") {
    import graft.ext.Multimodal
    val wav = Multimodal.synthesizeAudio(Seq(6L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]]("bytes")
    val truncated = wav.dropRight(5) // declared data length now exceeds bytes
    val e = intercept[Exception] {
      Multimodal.decodeAudio(
        Seq((6L, truncated)).toDF("media_id", "bytes")).collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(messages.exists(_.contains("truncated data chunk")))
  }

  test("multimodal: real y4m payloads parse back to exact frame lumas") {
    import graft.ext.Multimodal
    val ids = Seq(0L, 1L, 4L, 11L, 59L).toDF("doc_id")
    val got = Multimodal.decodeVideo(
        Multimodal.synthesizeVideo(ids), frameStride = 2)
      .orderBy("media_id").collect()
    got.foreach { d =>
      val id = d.media_id
      val (w, h, nf) = (Multimodal.synthVideoW(id),
        Multimodal.synthVideoH(id), Multimodal.synthFrames(id))
      def frameLuma(f: Int): Long =
        (for { y <- 0 until h; x <- 0 until w }
          yield Multimodal.synthLuma(id, f, x, y).toLong).sum
      assert(d.width == w && d.height == h && d.n_frames == nf.toLong)
      assert(d.duration_us == nf.toLong * 1000000L / Multimodal.VideoFps)
      assert(d.total_luma == (0 until nf).map(frameLuma).sum)
      assert(d.sampled_luma ==
        (0 until nf by 2).map(frameLuma).sum)
    }
  }

  test("multimodal: y4m parser tolerates per-frame parameters") {
    import graft.ext.Multimodal
    val wav = Multimodal.synthesizeVideo(Seq(3L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]]("bytes")
    // rewrite each bare "FRAME\n" marker as "FRAME Xtest\n" (the format
    // allows per-frame parameters; a fixed-offset parser would break)
    val raw = new String(wav.map(_.toChar))
    val hdrEnd = raw.indexOf('\n') + 1
    val out = new java.io.ByteArrayOutputStream()
    out.write(wav, 0, hdrEnd)
    var off = hdrEnd
    val frameLen = Multimodal.synthVideoW(3L) * Multimodal.synthVideoH(3L)
    while (off < wav.length) {
      out.write("FRAME Xtest\n".getBytes("US-ASCII"))
      off += 6 // past original FRAME\n
      out.write(wav, off, frameLen)
      off += frameLen
    }
    val d = Multimodal.decodeVideo(
        Seq((3L, out.toByteArray)).toDF("media_id", "bytes"))
      .collect()(0)
    assert(d.n_frames == Multimodal.synthFrames(3L).toLong)
  }

  test("multimodal: real PNG/BMP payloads decode back to the exact pattern") {
    val imgs = Multimodal.synthesizeImages(docs, "doc_id")
    // payloads are genuine container formats (magic bytes), not fakes
    imgs.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      r.getAs[String]("fmt") match {
        case "png" => assert(bytes.take(4).toSeq ==
          Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
        case "bmp" => assert(bytes.take(2).toSeq ==
          Seq('B'.toByte, 'M'.toByte))
        case other => fail(s"unexpected fmt $other")
      }
    }
    val feats = Multimodal.decodeImages(imgs, targetW = 4, targetH = 3)
      .collect()
    assert(feats.length == 5)
    feats.foreach { f =>
      val id = f.media_id
      val w = Multimodal.synthWidth(id)
      val h = Multimodal.synthHeight(id)
      // decoded dims and mean pixel must equal the synthesis formula —
      // PNG and BMP are lossless, so this is exact, not approximate
      assert(f.width == w && f.height == h && f.n_pixels == w.toLong * h)
      val exp = (for { y <- 0 until h; x <- 0 until w }
        yield Multimodal.synthPixel(id, x, y)).sum
      assert(f.brightness == exp.toDouble / (w * h))
      val rw = math.min(w, 4)
      val rh = math.min(h, 3)
      assert(f.resized_w == rw && f.resized_h == rh)
      val expR = (for { yp <- 0 until rh; xp <- 0 until rw }
        yield Multimodal.synthPixel(id, xp * w / rw, yp * h / rh)).sum
      assert(f.resized_brightness == expR.toDouble / (rw * rh))
    }
  }

  test("multimodal: quadrant features from the DECODED raster equal " +
      "the synthesis formula per quadrant") {
    val imgs = Multimodal.synthesizeImages(
      Seq(0L, 1L).toDF("doc_id"), "doc_id")
    val feats = Multimodal.imageFeatures(imgs)
      .orderBy("media_id").collect()
    // id 0: 2×2 — one pixel per quadrant: v(0,0)=0 v(1,0)=7 v(0,1)=13
    // v(1,1)=20
    assert(feats(0).getSeq[Double](1) == Seq(0.0, 7.0, 13.0, 20.0))
    // id 1: 3×3, split at 1: quadrant sums from the formula
    def v(id: Long, x: Int, y: Int) = Multimodal.synthPixel(id, x, y)
    val q0 = v(1, 0, 0)
    val q1 = v(1, 1, 0) + v(1, 2, 0)
    val q2 = v(1, 0, 1) + v(1, 0, 2)
    val q3 = v(1, 1, 1) + v(1, 2, 1) + v(1, 1, 2) + v(1, 2, 2)
    assert(feats(1).getSeq[Double](1) ==
      Seq(q0.toDouble, q1.toDouble, q2.toDouble, q3.toDouble))
  }

  test("native wordShingles equals the HOF reference form") {
    val texts = Seq(
      "a b c d e",            // normal
      "a b",                  // shorter than n
      "",                     // empty → one empty token
      "a  b c",               // double space → empty middle token
      "a b c ",               // trailing space → trailing empty token
      "one",                  // single token
      "x y z"                 // exactly n tokens
    ).toDF("t")
    Seq(1, 2, 3, 4).foreach { n =>
      val rows = texts.select(
        Dedup.wordShingles(col("t"), n).as("native"),
        Dedup.wordShinglesHof(col("t"), n).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("randomProject: matches the scalar replica, dims and signs right") {
    val P = 1000000007L
    def aff(j: Long, x: Long): Long =
      ((j * 40503L + 17L) % P * x % P + (j * 97L + 1L) % P) % P
    def sign(j: Int, k: Int, seed: Long = 7L): Double =
      if (aff(seed + 4, aff(seed, j * 1024L + k)) % 2 == 0) 1.0 else -1.0
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(-0.5f, 0.25f, 8.0f, -2.0f)))
    val got = vecs.toDF("id", "emb")
      .select(col("id"), Similarity.randomProject(col("emb"), 3).as("p"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    vecs.zip(got).foreach { case ((id, emb), (gid, proj)) =>
      assert(id == gid && proj.length == 3)
      val want = (0 until 3).map(j =>
        emb.indices.foldLeft(0.0)((acc, k) =>
          acc + emb(k).toDouble * sign(j, k)))
      assert(proj == want, s"id=$id got=$proj want=$want")
    }
    // the sign matrix is not degenerate: some sign differs across (j,k)
    val signs = for { j <- 0 until 3; k <- 0 until 4 } yield sign(j, k)
    assert(signs.toSet == Set(1.0, -1.0))
  }

  test("vocabCoverage: counts in-vocab occurrences, ties broken by token") {
    val docs = Seq(
      (1L, "a a b rare1"),   // 4 tokens
      (2L, "a b b rare2"),
      (3L, "c c c c")
    ).toDF("doc_id", "text")
    // counts: a=3, b=3, c=4, rare1=1, rare2=1 → top-3 = c(4), a(3), b(3)
    val got = Text.vocabCoverage(docs, "doc_id", "text", topK = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((1L, 4L, 3L, 1.0 - 3.0 / 4.0)))
    assert(got(1) == ((2L, 4L, 3L, 1.0 - 3.0 / 4.0)))
    assert(got(2) == ((3L, 4L, 4L, 0.0)))
    // topK boundary tie (a vs b at count 3) resolves by token order: with
    // topK=2 the vocab is {c, a} — b no longer counts
    val k2 = Text.vocabCoverage(docs, "doc_id", "text", topK = 2)
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(k2.toSeq == Seq(2L, 1L, 4L))
  }
}
