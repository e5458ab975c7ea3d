package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.transform.WeatherTransforms
import graft.warehouse.Merge

/** Property-based invariants (SURVEY.md §5.2): MG1 idempotence, MG2
  * convergence, dedup disjointness, datetime round-trips, cardinal
  * totality. Samples kept small — each property materializes Spark jobs.
  */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  /** Run a ScalaCheck property with a small sample count (each sample
    * materializes Spark jobs) and surface failures through ScalaTest.
    */
  private def check(prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withMaxSize(12),
      prop)
    assert(res.passed, res.status.toString)
  }

  // unique keys per frame (dropDuplicates keeps an ARBITRARY row, which
  // would make the test itself nondeterministic)
  private val keyedRows: Gen[List[(Long, String)]] =
    Gen.mapOf(Gen.zip(Gen.choose(0L, 8L), Gen.alphaStr.map(_.take(6))))
      .map(_.toList)

  test("MG1 insert-if-absent is idempotent and never duplicates keys") {
    check(Prop.forAll(keyedRows, keyedRows) { (t, s) =>
      val target = t.toDF("id", "v")
      val stage = s.toDF("id", "v")
      val once = target.unionByName(
        Merge.insertIfAbsent(target, stage, Seq("id")))
      // replay: nothing new
      assert(Merge.insertIfAbsent(once, stage, Seq("id")).isEmpty)
      // key set = union of key sets, no duplicates
      val keys = once.select("id").as[Long].collect().sorted.toSeq
      assert(keys == keys.distinct)
      assert(keys.toSet == (t.map(_._1) ++ s.map(_._1)).toSet)
      true
    })
  }

  test("MG2 SCD1 converges: same stage twice = once; stage wins on match") {
    check(Prop.forAll(keyedRows, keyedRows) { (t, s) =>
      val audit = to_date(lit("2026-08-12"))
      def withAudit(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("fecha_actualizacion_origen", to_date(lit("2025-01-01")))
        .withColumn("fecha_actualizacion", to_date(lit("2025-01-01")))
      val target = withAudit(t.toDF("id", "v"))
      val stage = withAudit(s.toDF("id", "v"))
      val once = Merge.scd1(target, stage, "id", auditDate = audit)
      val twice = Merge.scd1(once, stage, "id", auditDate = audit)
      val c1 = once.orderBy("id", "v").collect().toSeq
      val c2 = twice.orderBy("id", "v").collect().toSeq
      assert(c1 == c2)
      // every staged key carries the staged value
      val vals = once.select("id", "v").as[(Long, String)].collect().toMap
      s.toMap.foreach { case (k, _) =>
        assert(vals(k) == s.toMap.apply(k))
      }
      true
    })
  }

  test("anti-join dedup output is disjoint from previous keys") {
    check(Prop.forAll(keyedRows, keyedRows) { (prev, inc) =>
      val p = prev.toDF("id", "v")
      val i = inc.toDF("id", "v")
      val fresh = Merge.insertIfAbsent(p, i, Seq("id"))
        .select("id").as[Long].collect().toSet
      assert(fresh.intersect(prev.map(_._1).toSet).isEmpty)
      true
    })
  }

  test("fixed-offset shift round-trips; date format re-parses") {
    check(Prop.forAll(Gen.choose(0L, 4102444800L)) { epoch =>
      val df = Seq(epoch).toDF("e")
        .select(timestamp_seconds(col("e")).as("ts"))
      val r = df.select(
        (WeatherTransforms.shiftToLocalTime(col("ts")) +
          expr("INTERVAL 3 HOURS")).as("rt"),
        to_date(date_format(col("ts"), "dd/MM/yyyy"), "dd/MM/yyyy").as("d"),
        to_date(col("ts")).as("d0")).head
      assert(r.getTimestamp(0).getTime == epoch * 1000)
      assert(r.getDate(1) == r.getDate(2))
      true
    })
  }

  test("windCardinal is total over [0,360] with the 8 reference labels") {
    check(Prop.forAll(Gen.choose(0.0, 360.0)) { deg =>
      val c = Seq(deg).toDF("d")
        .select(WeatherTransforms.windCardinal(col("d"))).as[String].head()
      assert(Set("N", "NO", "W", "SE", "S", "SO", "E", "NE").contains(c))
      true
    })
  }

  private val docGen: Gen[List[(Long, String)]] =
    Gen.zip(Gen.choose(1L, 500L),
        Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))
      .map(List(_))
      .flatMap(h => Gen.listOfN(5, Gen.zip(Gen.choose(1L, 500L),
        Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" "))))
        .map(t => (h ++ t).distinctBy(_._1)))

  test("chunkTokens covers every token, in order, with exact seam overlap") {
    check(Prop.forAll(docGen, Gen.choose(2, 6), Gen.choose(0, 1)) {
      (docs, size, ov) =>
        val chunks = graft.ext.Text.chunkTokens(
            docs.toDF("doc_id", "text"), size = size, overlap = ov)
          .orderBy("doc_id", "chunk_id").collect()
          .groupBy(_.getLong(0))
        docs.foreach { case (id, text) =>
          val toks = text.split(" ", -1).toSeq
          val stride = size - ov
          val got = chunks(id).map(_.getString(2))
          // reassembly: first chunk + the non-overlap tail of the rest
          val rebuilt = got.head.split(" ", -1).toSeq ++
            got.tail.toSeq.flatMap(_.split(" ", -1).drop(ov).toSeq)
          assert(rebuilt == toks, s"reassembly mismatch for doc $id")
          // chunk count formula
          val want = 1 + math.max(0,
            (toks.length - size + stride - 1) / stride)
          assert(got.length == want)
        }
        true
    }, n = 6)
  }

  test("packGreedy partitions rows exactly and respects the budget") {
    check(Prop.forAll(
        Gen.listOfN(40, Gen.zip(Gen.choose(0L, 3L), Gen.choose(1L, 60L))),
        Gen.choose(50L, 120L)) { (rows, budget) =>
      val in = rows.zipWithIndex
        .map { case ((sh, sz), i) => (sh, i.toLong, sz) }
      val packed = graft.ext.Packing.packGreedy(
          in.toDF("s", "i", "n"), "s", "i", "n", budget)
        .collect()
      assert(packed.length == in.length) // bijection on rows
      // bins over budget only as singletons; fills are running sums
      packed.groupBy(p => (p.shard, p.bin)).foreach { case (_, bs) =>
        val tot = bs.map(_.n_tokens).sum
        assert(tot <= budget || bs.length == 1)
        assert(bs.maxBy(_.id).bin_fill == tot)
      }
      true
    }, n = 6)
  }

  test("CDC compaction equals the window idiom on random logs") {
    // random change logs (key, seq unique per key, op, payload):
    // the aggregate scale path must match row_number-over-seq-desc
    val logGen: Gen[List[(Long, Long, String, String)]] =
      Gen.mapOf(Gen.zip(
        Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L)),
        Gen.zip(Gen.oneOf("U", "U", "D"), Gen.alphaStr.map(_.take(4)))))
        .map(_.toList.map { case ((k, q), (o, p)) => (k, q, o, p) })
    check(Prop.forAll(logGen) { rows =>
      val log = rows.toDF("k", "seq", "op", "s")
      val viaAgg = graft.ops.ChangeApply
        .latestSnapshot(log, "k", Seq("seq"), "op", Seq("s"))
        .orderBy("k").collect().toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("seq").desc)
      val viaWindow = log
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select("k", "seq", "s")
        .orderBy("k").collect().toSeq
      assert(viaAgg == viaWindow, s"agg=$viaAgg window=$viaWindow")
      true
    }, n = 8)
  }

  test("bpeEncodeRaw: equals a list-fold reference on random corpora; " +
      "symbols always reassemble the input; counts never grow") {
    // independent reference: greedy per-rule pair scan over a List
    def ref(text: String, merges: Seq[(String, String)]): String =
      text.split(" ", -1).filter(_.nonEmpty).map { w =>
        var syms = w.map(_.toString).toList
        merges.foreach { case (a, b) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = syms
          while (rest.nonEmpty) rest match {
            case x :: y :: t if x == a && y == b =>
              out += (a + b); rest = t
            case x :: t => out += x; rest = t
          }
          syms = out.toList
        }
        syms.mkString("\u001F")
      }.mkString(" ")
    val sym = Gen.oneOf("a", "b", "c", "aa", "ab", "ba", "cb")
    val word = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val text = Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val merges = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(sym, sym)))
    // pure JVM property — no Spark jobs, so a real sample count is fine
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(text, merges) { (t, m) =>
        val flat = m.flatMap(p => Seq(p._1, p._2)).toArray
        val got = graft.functions.NativeString.bpeEncodeRaw(t, flat)
        val expected = ref(t, m)
        val reassembled = got.split(" ", -1).map(_.replace("\u001F", ""))
          .filter(_.nonEmpty).mkString(" ")
        val original = t.split(" ", -1).filter(_.nonEmpty).mkString(" ")
        val nSyms = got.split(" ", -1).filter(_.nonEmpty)
          .map(_.split("\u001F", -1).length).sum
        val nChars = original.replace(" ", "").length
        got == expected && reassembled == original &&
          (original.isEmpty || nSyms <= nChars)
      })
    assert(res.passed, res.status.toString)
  }

  test("bpeTrain: learned merges equal a naive in-memory trainer " +
      "(same argmax tie-break) on random corpora") {
    // independent reference: vocab dict + per-iteration pair count +
    // (cnt DESC, lhs, rhs) argmax, re-segmenting from scratch per round
    def refTrain(texts: Seq[String], n: Int): Seq[(Long, String, String,
        String, Long)] = {
      val vocab = texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
        .filter(_.forall(_.isLetterOrDigit))
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(String, String)]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, String, Long)]
      var done = false
      while (merges.length < n && !done) {
        val flat = merges.toSeq.flatMap(p => Seq(p._1, p._2)).toArray
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long]
        vocab.foreach { case (w, c) =>
          val syms = graft.functions.NativeString.bpeEncodeRaw(w, flat)
            .split("\u001F", -1)
          syms.sliding(2).foreach {
            case Array(x, y) =>
              counts((x, y)) = counts.getOrElse((x, y), 0L) + c
            case _ =>
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.minBy { case ((x, y), c) =>
            (-c, x, y) }
          merges += ((a, b))
          out += ((merges.length.toLong, a, b, a + b, c))
        }
      }
      out.toSeq
    }
    val word = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(corpus) { texts =>
      val df = texts.toDF("text")
      val got = graft.ext.Text.bpeTrain(df, nMerges = 3).orderBy("rank")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
      val expected = refTrain(texts, 3)
      assert(got == expected, s"got=$got expected=$expected texts=$texts")
      true
    }, n = 5)
  }

  test("perceptron: epoch trajectory equals a naive in-memory batch " +
      "loop on random integer data") {
    def refTrain(rows: Seq[(Long, Long, Boolean)],
        epochs: Int): Seq[(Long, Long, Long, Long)] = {
      var (w0, w1) = (0L, 0L)
      (1 to epochs).map { e =>
        val missed = rows.filter { case (x0, x1, lab) =>
          val y = if (lab) 1L else -1L
          y * (w0 * x0 + w1 * x1) <= 0
        }
        val miss = missed.size.toLong
        w0 += missed.map { case (x0, _, lab) =>
          (if (lab) 1L else -1L) * x0 }.sum
        w1 += missed.map { case (_, x1, lab) =>
          (if (lab) 1L else -1L) * x1 }.sum
        (e.toLong, w0, w1, miss)
      }
    }
    val row = Gen.zip(Gen.choose(-5L, 5L), Gen.choose(-5L, 5L),
      Gen.oneOf(true, false))
    val data = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, row))
    check(Prop.forAll(data) { rows =>
      val df = rows.toDF("x0", "x1", "lab")
      val got = graft.ext.Learn.perceptron(df,
          Seq(col("x0"), col("x1")), col("lab"), epochs = 4)
        .orderBy("epoch").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val expected = refTrain(rows, 4)
      assert(got == expected, s"got=$got expected=$expected rows=$rows")
      true
    }, n = 5)
  }

  test("similarityJoinExact equals in-JVM brute force for any rational " +
      "threshold (prefix + length filters are lossless)") {
    import graft.ext.Dedup
    // tiny vocab forces real shingle overlap; docs below the shingle
    // width produce empty sets and must never pair
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.chooseNum(2, 9).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val corpus = Gen.chooseNum(5, 12).flatMap(k => Gen.listOfN(k, doc))
    val thr = Gen.oneOf((1, 3), (1, 2), (2, 3), (3, 4), (1, 1))
    check(Prop.forAll(corpus, thr) { case (docs, (num, den)) =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.similarityJoinExact(df, "doc_id", "text",
          n = 3, thresholdNum = num, thresholdDen = den)
        .select("id_a", "id_b", "n_inter", "n_union")
        .as[(Long, Long, Long, Long)].collect().toSet
      // independent reference: the SAME hash expression yields each
      // doc's shingle set; pair enumeration + exact Jaccard in plain
      // Scala — no prefix filter, no length filter, no join
      val sets = df.select(col("doc_id"),
          array_distinct(Dedup.shingleHashes(col("text"), 3)).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        c = (sets(a).toSet & sets(b).toSet).size.toLong
        u = (sets(a).toSet | sets(b).toSet).size.toLong
        if c * den >= num * u
      } yield (a, b, c, u)).toSet
      assert(got == expected,
        s"thr=$num/$den got=$got expected=$expected docs=$docs")
      true
    }, n = 6)
  }

  test("dupComponents: driver union-find and distributed label " +
      "propagation agree with a BFS reference on random graphs") {
    import graft.ext.Dedup
    val edge = Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val graph = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, edge))
    check(Prop.forAll(graph) { es =>
      val pairs = es.toDF("id_a", "id_b")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "component").as[(Long, Long)].collect().toSet
      val small = rows(Dedup.dupComponents(pairs))
      val distributed = rows(Dedup.dupComponents(pairs, smallEdgeLimit = 0))
      // reference: min reachable id by BFS over the adjacency map
      val adj = (es ++ es.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expected = adj.keys.map { v =>
        var seen = Set(v); var frontier = Set(v)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= frontier
        }
        (v, seen.min)
      }.toSet
      assert(small == expected, s"small=$small expected=$expected es=$es")
      assert(distributed == expected,
        s"distributed=$distributed expected=$expected es=$es")
      true
    }, n = 5)
  }

  test("asOfSliced equals asOf on random event sets for any slice width") {
    import graft.ops.AsOfJoin
    val key = Gen.chooseNum(0L, 2L)
    val t = Gen.chooseNum(0L, 500L)
    val leftG = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(key, t)))
    // right unique per (key, time) — the operator's documented
    // requirement (duplicate-time matches are order-dependent)
    val rightG = Gen.mapOf(Gen.zip(Gen.zip(key, t), Gen.chooseNum(0L, 99L)))
      .map(_.toList.map { case ((k, rt), v) => (k, rt, v) })
    check(Prop.forAll(leftG, rightG, Gen.oneOf(7L, 50L, 1000L)) {
      (l, r, slice) =>
        val left = l.zipWithIndex
          .map { case ((k, lt), i) => (k, i.toLong, lt) }
          .toDF("k", "id", "lt")
        val right = r.toDF("k", "rt", "v")
        def rows(df: org.apache.spark.sql.DataFrame) = df
          .select("k", "id", "lt", "rt", "v")
          .as[(Long, Long, Long, Option[Long], Option[Long])]
          .collect().toSeq.sorted
        val plain = rows(AsOfJoin.asOf(left, right, "k", "lt", "rt"))
        val sliced = rows(
          AsOfJoin.asOfSliced(left, right, "k", "lt", "rt", slice))
        assert(sliced == plain,
          s"slice=$slice sliced=$sliced plain=$plain l=$l r=$r")
        true
    }, n = 6)
  }

  test("BMP fast paths equal the code-point-offsets reference on " +
      "arbitrary unicode (surrogates, combining marks, ASCII mixes)") {
    import graft.functions.{NativeHash, NativeString}
    import org.apache.spark.unsafe.types.UTF8String
    // char soup spanning every branch: ASCII, space, BMP CJK,
    // combining mark, astral emoji / math letters (surrogate pairs)
    val piece: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.oneOf("你", "好", "é", "́", "ß"),
      Gen.oneOf("🚀", "👩", "𝔘"))
    val uniStr: Gen[String] = Gen.listOf(piece).map(_.mkString)
    // references reproduce the pre-round-11 single-path formulations
    def shinglesRef(s: String, n: Int): Seq[Long] = {
      val offs = NativeString.codePointOffsets(s)
      val m = offs.length - 1 - (n - 1)
      if (m < 1) Seq.empty
      else (0 until m).map(t => NativeHash.polyRange(s, offs(t), offs(t + n)))
    }
    def jaccardRef(a: String, b: String, n: Int): Double = {
      def grams(s: String): Set[String] = {
        val offs = NativeString.codePointOffsets(s)
        val cps = offs.length - 1
        (0 to cps - n).map(t => s.substring(offs(t), offs(t + n))).toSet
      }
      val (sa, sb) = (grams(a), grams(b))
      val inter = sa.intersect(sb).size
      val union = sa.size + sb.size - inter
      if (union == 0) -1.0 else inter.toDouble / union
    }
    def bpeRef(s: String): String =
      s.split(" ", -1).filter(_.nonEmpty).map { w =>
        val offs = NativeString.codePointOffsets(w)
        (0 until offs.length - 1)
          .map(i => w.substring(offs(i), offs(i + 1))).mkString("\u001F")
      }.mkString(" ")
    check(Prop.forAll(uniStr, uniStr, Gen.choose(1, 4)) { (a, b, n) =>
      val got = NativeHash.charShingles(UTF8String.fromString(a), n)
      assert(got.toLongArray().toSeq == shinglesRef(a, n),
        s"charShingles diverged on '$a' n=$n")
      val j = NativeString.charJaccardRaw(a, b, n)
      assert(j == jaccardRef(a, b, n), s"charJaccard diverged on '$a'/'$b'")
      assert(NativeString.bpeEncodeRaw(a, Array.empty) == bpeRef(a),
        s"bpe symbolization diverged on '$a'")
      true
    }, n = 40)
  }
}
