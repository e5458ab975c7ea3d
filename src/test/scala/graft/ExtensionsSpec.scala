package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{NativeHash, NativeString, NativeVector}

/** The SQL surface: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve the
  * graft_* functions to the SAME native expressions as the DataFrame
  * API — checked by comparing SQL results against the Column-API values
  * in the extended session itself.
  */
class ExtensionsSpec extends SparkSuite {

  test("graft_* functions resolve from SQL and match the DataFrame API") {
    spark // force the shared suite session first
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // new session object on the SAME SparkContext. withExtensions, not
    // config("spark.sql.extensions", ...): the conf is STATIC — read
    // from the SparkContext at first-session build — so on a shared
    // test context it would be silently ignored; a production session
    // that owns its context uses the conf form from the class Scaladoc.
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      val viaSql = ext.sql(
        """SELECT
          |  graft_poly_hash('hello world') AS ph,
          |  graft_norm_fingerprint('B a. a c!') AS nf,
          |  graft_simhash32(graft_shingle_hashes('a b c d e f g', 3)) AS sh,
          |  graft_segment_hashes('a b c d e', 2) AS segs,
          |  graft_minhash_sig(graft_shingle_hashes('a b c d e f g'), 4) AS sig,
          |  graft_char_jaccard('abcdefgh', 'abcdefxx', 3) AS cj,
          |  graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS cos,
          |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |  graft_qdot(array(2L, -3L), array(10L, 4L)) AS qd,
          |  graft_quantize_int8(array(0.5D, -1.0D, 0.25D)) AS qc,
          |  graft_random_project(array(1.0D, 2.0D, 3.0D), 2) AS rp
          |""".stripMargin).collect()(0)
      val viaApi = ext.range(1).select(
        NativeHash.polyHash(lit("hello world")).as("ph"),
        NativeHash.normFingerprintCol(lit("B a. a c!")).as("nf"),
        NativeHash.simHash32(
          NativeHash.shingleHashes(lit("a b c d e f g"), 3)).as("sh"),
        NativeHash.segmentHashes(lit("a b c d e"), 2).as("segs"),
        NativeHash.minHashSig(
          NativeHash.shingleHashes(lit("a b c d e f g"), 3), 4).as("sig"),
        NativeString.charJaccard(lit("abcdefgh"), lit("abcdefxx"), 3).as("cj"),
        NativeVector.cosine(
          array(lit(1.0), lit(2.0)), array(lit(2.0), lit(4.0))).as("cos"),
        NativeVector.dot(
          array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("dot"),
        NativeVector.qdot(
          array(lit(2L), lit(-3L)), array(lit(10L), lit(4L))).as("qd"),
        NativeVector.quantizeInt8(
          array(lit(0.5), lit(-1.0), lit(0.25))).as("qc"),
        NativeVector.randomProject(
          array(lit(1.0), lit(2.0), lit(3.0)), 2, 7).as("rp"))
        .collect()(0)
      assert(viaSql.getLong(0) == viaApi.getLong(0))
      assert(viaSql.getLong(1) == viaApi.getLong(1))
      assert(viaSql.getLong(2) == viaApi.getLong(2))
      assert(viaSql.getSeq[Long](3) == viaApi.getSeq[Long](3))
      assert(viaSql.getSeq[Long](3).length == 3) // ceil(5 tokens / 2)
      assert(viaSql.getSeq[Long](4) == viaApi.getSeq[Long](4))
      assert(viaSql.getDouble(5) == viaApi.getDouble(5))
      assert(viaSql.getDouble(6) == viaApi.getDouble(6))
      assert(viaSql.getDouble(7) == viaApi.getDouble(7))
      assert(viaSql.getDouble(7) == 11.0)
      assert(viaSql.getLong(8) == viaApi.getLong(8))
      assert(viaSql.getLong(8) == 8L) // 2·10 + (−3)·4
      assert(viaSql.getSeq[Long](9) == viaApi.getSeq[Long](9))
      assert(viaSql.getSeq[Long](9) == Seq(64L, -127L, 32L))
      assert(viaSql.getSeq[Double](10) == viaApi.getSeq[Double](10))
      // non-literal width parameter must fail loudly, not mis-generate
      val e = intercept[Exception] {
        ext.sql("SELECT graft_shingle_hashes('a b c', CAST(id AS INT)) " +
          "FROM range(1)").collect()
      }
      assert(e.getMessage.contains("integer literal"))
      // aggregate + composed-hash functions from SQL
      val agg = ext.sql(
        """SELECT k, graft_top_k(CAST(v AS DOUBLE), id, 2) AS top
          |FROM VALUES (1, 10.0, 100L), (1, 30.0, 300L), (1, 20.0, 200L),
          |            (2, 5.0, 500L) AS t(k, v, id)
          |GROUP BY k ORDER BY k""".stripMargin).collect()
      val top1 = agg(0).getSeq[org.apache.spark.sql.Row](1)
      assert(top1.map(_.getLong(1)) == Seq(300L, 200L))
      assert(agg(1).getSeq[org.apache.spark.sql.Row](1)
        .map(_.getLong(1)) == Seq(500L))
      val mg = ext.sql(
        """SELECT graft_misra_gries(w, 8) AS sk
          |FROM VALUES ('a'), ('a'), ('a'), ('b'), ('b'), ('c')
          |AS t(w)""".stripMargin).collect()(0)
        .getSeq[org.apache.spark.sql.Row](0)
      assert(mg.map(r => (r.getString(0), r.getLong(1))) ==
        Seq(("a", 3L), ("b", 2L), ("c", 1L)))
      // bloom sketch from SQL: same aggregate the lake index builds on
      val bf = ext.sql(
        """SELECT graft_bloom_sketch(w, 100, 0.000001) AS bf
          |FROM VALUES ('x'), ('y'), ('z') AS t(w)""".stripMargin)
        .collect()(0).getAs[Array[Byte]](0)
      val filt = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bf))
      assert(filt.mightContainString("x") && filt.mightContainString("z") &&
        !filt.mightContainString("nope"))
      val hashes = ext.sql(
        """SELECT graft_sample_hash('42') AS h7,
          |       graft_seeded_hash('42', 7) AS h7b,
          |       graft_seeded_hash('42', 13) AS h13""".stripMargin)
        .collect()(0)
      assert(hashes.getLong(0) == hashes.getLong(1)) // seed 7 IS the default
      assert(hashes.getLong(0) != hashes.getLong(2)) // seeds decorrelate
      val viaApiHash = ext.range(1).select(
        graft.ext.Sampling.sampleHash(lit("42"))).collect()(0).getLong(0)
      assert(hashes.getLong(0) == viaApiHash)
      // tokenizer + substring counting from SQL, same exprs as the API
      val bpe = ext.sql(
        """SELECT graft_bpe_encode('table data', 't a,l e,b le,ta ble')
          |  AS enc,
          |  graft_count_substr('a;b;c d', ';') AS semis""".stripMargin)
        .collect()(0)
      assert(bpe.getString(0) == "table d\u001Fa\u001Fta")
      assert(bpe.getLong(1) == 2L)
      val viaApiBpe = ext.range(1).select(
        graft.ext.Text.bpeEncode(lit("table data"),
          Seq("t" -> "a", "l" -> "e", "b" -> "le", "ta" -> "ble")))
        .collect()(0).getString(0)
      assert(bpe.getString(0) == viaApiBpe)
      val badMerge = intercept[Exception] {
        ext.sql("SELECT graft_bpe_encode('x', 'a b,broken')").collect()
      }
      assert(Iterator.iterate(badMerge: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .exists(t => Option(t.getMessage).exists(_.contains("a b"))))
      // wrong argument count must name the function, not MatchError
      val arity = intercept[Exception] {
        ext.sql("SELECT graft_cosine(array(1.0D))").collect()
      }
      val msgs = Iterator.iterate(arity: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .toSeq
      assert(msgs.exists(m => m.contains("graft_cosine") &&
        m.contains("invalid number of arguments")), msgs.mkString(" | "))
    } finally {
      // detach the extended session and restore the suite's default so
      // later suites keep their un-extended resolution behavior
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
