package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._

/** Deduplication operators for training-data pipelines (SURVEY.md §2.11):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. Generalizes the
  * reference's two hand-rolled dedup gates (MG1 composite-key anti-join,
  * transf.py:329-362; J2 id-membership gate, main.py:127-133).
  *
  * Scale design: signatures (MinHash/SimHash) are computed per-row with
  * higher-order expressions — one scan, no shuffle, no UDF. The only
  * shuffle in the whole near-dup pipeline is the band-bucket exchange of
  * `(band, bucket, id)` tuples — a few bytes per row regardless of
  * document size — followed by a bucket-local self-join. That is the
  * standard 100 TB MinHash topology (shuffle the sketch, never the text).
  */
object Dedup {

  /** Exact dedup, deterministic representative: smallest `idCol` per key
    * group + group size. The scalable groupBy form of `dropDuplicates`
    * (hash aggregate with map-side partial; `dropDuplicates` itself keeps
    * an arbitrary row — unusable against an oracle).
    */
  def exact(keys: Seq[String], idCol: String)(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_" + idCol), count(lit(1)).as("n_dups"))

  /** API-parity one-liner: Spark's own `dropDuplicates` (keeps an
    * ARBITRARY row per key — fine in production, unusable against an
    * oracle; [[exact]] is the deterministic form).
    */
  def dropExact(keys: Seq[String])(df: DataFrame): DataFrame =
    df.dropDuplicates(keys)

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles: tokens joined back with spaces, one shingle per
    * window of `n` consecutive tokens. Empty array when the doc has fewer
    * than `n` tokens.
    */
  /** Word n-gram shingle strings — native one-pass expression
    * ([[wordShinglesHof]] is the built-in-composed reference form;
    * equality asserted in tests).
    */
  def wordShingles(text: Column, n: Int = 3): Column =
    graft.functions.NativeString.wordShingles(text, n)

  def wordShinglesHof(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    val m = size(toks) - (n - 1)
    // NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0] (it infers a
    // negative step), unlike DuckDB's empty generate_series(1, 0) — docs
    // shorter than n tokens must short-circuit to an empty shingle set.
    when(m < 1, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), greatest(m, lit(1))),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** DuckDB twin of [[wordShingles]] (1-based inclusive list slicing). */
  def wordShinglesSql(e: String, n: Int = 3): String =
    s"list_transform(generate_series(1, greatest(len(string_split($e,' ')) - ${n - 1}, 0)), " +
      s"i -> array_to_string(string_split($e,' ')[i:i+${n - 1}], ' '))"

  /** Portable hashes of the shingle set — native codegen'd expression
    * (graft.functions.NativeHash); [[shingleHashesHof]] is the
    * higher-order-function reference formulation (same values,
    * interpreted, ~100× slower — kept as the executable spec).
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graft.functions.NativeHash.shingleHashes(text, n)

  def shingleHashesHof(text: Column, n: Int = 3): Column =
    transform(wordShingles(text, n), s => polyHash(s))

  def shingleHashesSql(e: String, n: Int = 3): String =
    s"list_transform(${wordShinglesSql(e, n)}, s -> ${polyHashSql("s")})"

  // ------------------------------------------------------- char shingles

  /** Character n-gram shingles (stride 1) — robust to intra-token edits
    * where word shingles are not (a one-char typo kills 3 word-shingles
    * but only n char-shingles out of hundreds).
    */
  def charShingles(text: Column, n: Int = 5): Column = {
    val m = length(text) - (n - 1)
    when(m < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), greatest(m, lit(1))),
        i => call_function("substring", text, i, lit(n))))
  }

  def charShinglesSql(e: String, n: Int = 5): String =
    s"list_transform(generate_series(1, greatest(length($e) - ${n - 1}, 0)), " +
      s"i -> substring($e, i, $n))"

  /** Native hashes of the char shingle windows. */
  def charShingleHashes(text: Column, n: Int = 5): Column =
    graft.functions.NativeHash.charShingleHashes(text, n)

  def charShingleHashesSql(e: String, n: Int = 5): String =
    s"list_transform(${charShinglesSql(e, n)}, s -> ${polyHashSql("s")})"

  // -------------------------------------------------------------- MinHash

  /** MinHash signature: k minima of affine-permuted shingle hashes.
    * Null-free only when the doc has ≥ n tokens (else empty shingle set →
    * null minima); callers filter short docs first.
    */
  def minHashSignature(text: Column, k: Int = 16, n: Int = 3): Column =
    graft.functions.NativeHash.minHashSig(shingleHashes(text, n), k)

  /** HOF reference formulation of [[minHashSignature]] (same values). */
  def minHashSignatureHof(text: Column, k: Int = 16, n: Int = 3): Column = {
    val hs = shingleHashesHof(text, n)
    transform(sequence(lit(1), lit(k)),
      j => array_min(transform(hs, x => affine(j, x))))
  }

  def minHashSignatureSql(e: String, k: Int = 16, n: Int = 3): String =
    s"list_transform(generate_series(1, $k), " +
      s"j -> list_min(list_transform(${shingleHashesSql(e, n)}, x -> ${affineSql("j", "x")})))"

  /** Band hashes for LSH: the signature cut into `bands` slices of
    * `rows` entries, each folded to one bucket id.
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => combine(slice(sig, b * rows + 1, lit(rows))))

  def bandHashesSql(sigE: String, bands: Int, rows: Int): String =
    s"list_transform(generate_series(0, ${bands - 1}), " +
      s"b -> ${combineSql(s"($sigE)[b*$rows+1:b*$rows+$rows]")})"

  /** MinHash-LSH candidate pairs: docs sharing ≥1 band bucket.
    * Output: (idA, idB) with idA < idB, distinct.
    *
    * This is the scale path: only `(band, bucket, id)` shuffles; the
    * self-join is per-bucket. Skewed mega-buckets (boilerplate docs) are
    * the known hazard — AQE skew-join handles moderate skew; a production
    * run would also cap bucket size.
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, minTokens: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    lshCandidates(df.filter(size(split(col(textCol), " ")) >= minTokens),
      idCol, shingleHashes(col(textCol)), k, bands, maxBucket)

  /** Char-level variant of [[minHashCandidates]]. */
  def charMinHashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 5,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    lshCandidates(df.filter(length(col(textCol)) >= n), idCol,
      charShingleHashes(col(textCol), n), k, bands, maxBucket)

  /** Mega-bucket guard: an LSH bucket holding b rows yields b² candidate
    * pairs, so ONE boilerplate bucket (empty docs, license headers) turns
    * the bucket-local self-join quadratic. Buckets over the cap are
    * dropped before pairing — a documented recall trade (members of a
    * dropped bucket can still pair through their other bands; rows that
    * degenerate are exactly the ones near-dup semantics shouldn't chain
    * through). The default never triggers below ~16 M candidate pairs per
    * bucket; [[oversizedBuckets]] is the audit path for what a given cap
    * would drop.
    */
  val DefaultMaxBucket: Int = 4096

  /** Audit twin of the [[minHashCandidates]] cap: the (band, bucket, size)
    * rows a given `maxBucket` would drop.
    */
  def oversizedBuckets(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, minTokens: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    oversizedOf(df.filter(size(split(col(textCol), " ")) >= minTokens),
      idCol, shingleHashes(col(textCol)), k, bands, maxBucket)

  /** Char-shingle audit twin of the [[charMinHashCandidates]] cap. */
  def charOversizedBuckets(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 5,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    oversizedOf(df.filter(length(col(textCol)) >= n), idCol,
      charShingleHashes(col(textCol), n), k, bands, maxBucket)

  private def oversizedOf(df: DataFrame, idCol: String, hashes: Column,
      k: Int, bands: Int, maxBucket: Int): DataFrame = {
    val rows = k / bands
    val sig = graft.functions.NativeHash.minHashSig(hashes, k)
    df.select(col(idCol), posexplode(bandHashes(sig, bands, rows))
        .as(Seq("band", "bucket")))
      .groupBy("band", "bucket").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)
  }

  /** Shared LSH banding core over any shingle-hash column.
    *
    * Why the cap's dropped-row count is NOT observed inline (the audit
    * twins + `Curation`'s opt-in log carry that signal instead): an
    * `observe`/CollectMetrics node would have to sit under BOTH sides
    * of the self-join, and observed-metric names must be unique within
    * a query — while making the names differ per side would break the
    * canonical-subtree equality that gives this plan its single
    * Exchange + ReusedExchange (signatures computed once). One shuffle
    * beats an inline counter; the audit pass prices the same window
    * aggregate only when someone asks the question.
    */
  private def lshCandidates(df: DataFrame, idCol: String, hashes: Column,
      k: Int, bands: Int, maxBucket: Int): DataFrame = {
    val rows = k / bands
    val sig = graft.functions.NativeHash.minHashSig(hashes, k)
    // Repartition on the join keys BEFORE the self-join: both sides then
    // share one canonical Exchange subtree, so Spark's exchange reuse
    // computes the signatures exactly once and the join itself needs no
    // further shuffle. (More robust than caching: no memory-manager
    // eviction races, and the shuffled payload is only (band,bucket,id).)
    // The bucket-size window on top runs per (band,bucket) group — its
    // required distribution is satisfied by the same Exchange, so the cap
    // costs a partition-local sort, never a second shuffle.
    val buckets = df
      .select(col(idCol), posexplode(bandHashes(sig, bands, rows))
        .as(Seq("band", "bucket")))
      .repartition(col("band"), col("bucket"))
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    // Self-join via dataset aliases (NOT per-side renames): renames would
    // sit below the Exchange and defeat canonical plan matching; with
    // identical subtrees the planner emits one Exchange + ReusedExchange,
    // so signatures are computed exactly once.
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  // -------------------------------------------------------------- SimHash

  /** 32-bit SimHash over word-shingle hashes: bit b is set when the
    * majority of shingle hashes have bit b set (sum of ±1 > 0). Built as
    * 32 generated bit terms — all integer arithmetic, codegen'd.
    * (Single-pass array-accumulator formulation is the known further
    * optimization; at 32×|tokens| integer ops per row this is already
    * scan-bound, not compute-bound.)
    */
  def simHash(text: Column, n: Int = 3): Column =
    graft.functions.NativeHash.simHash32(shingleHashes(text, n))

  /** HOF reference formulation of [[simHash]] (same values). */
  def simHashHof(text: Column, n: Int = 3): Column = {
    val hs = shingleHashesHof(text, n)
    (0 until 32).map { b =>
      val contrib = aggregate(hs, lit(0L), (acc, x) =>
        acc + when(shiftright(x, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(contrib > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs within a bounded id window, bucket-decomposed
    * into an equi-join (same topology as
    * [[graft.ops.RangeJoin.pointInInterval]]): ids map to fixed-width
    * buckets of `idWindow`; a pair with `id_a < id_b <= id_a + idWindow`
    * always has `bucket(id_b) ∈ {bucket(id_a), bucket(id_a)+1}`, so the
    * a-side explodes to those two bucket keys, the join is a plain
    * shuffle-hash/sort-merge equi-join on `__bucket`, and the exact
    * inequalities run as a post-filter. Each pair matches exactly one
    * exploded key — no distinct needed. Work is linear in rows × window
    * density, never all-pairs (the naive inequality-only join plans as a
    * BroadcastNestedLoopJoin — O(n²), a 100 TB scale-killer).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      idWindow: Long, maxHamming: Int): DataFrame = {
    // sketches are 16 bytes/doc; recomputing the native simhash per side
    // is cheaper (and more predictable) than cache-eviction races
    val sh = df.select(col(idCol), simHash(col(textCol)).as("simhash"))
    // exact long floor-division: (id - pmod(id, W)) is a multiple of W, so
    // `div` is exact for any 64-bit id and any sign — floor(id/W) as a
    // DOUBLE quotient would misbucket ids above 2^53 and silently drop
    // pairs (hash-derived 64-bit ids are routine at corpus scale)
    val bucketOf: Column =
      expr(s"(`$idCol` - pmod(`$idCol`, ${idWindow}L)) div ${idWindow}L")
    val a = sh.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
        bucketOf.as("__b0"))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + 1L)))
      .drop("__b0")
    val b = sh.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      bucketOf.as("__bucket"))
    a.join(b, Seq("__bucket"))
      // id_b - id_a <= W, not id_b <= id_a + W: the sum can overflow Long
      // near MaxValue; the difference of two co-bucketed ids cannot
      .filter(col("id_a") < col("id_b") &&
        col("id_b") - col("id_a") <= idWindow)
      .withColumn("hamming", hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  def simHashSql(e: String, n: Int = 3): String = {
    val hsE = shingleHashesSql(e, n)
    (0 until 32).map { b =>
      val reduce = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($hsE, x -> CASE WHEN (x >> $b) & 1 = 1 " +
        s"THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)), (a,v) -> a+v)"
      s"(CASE WHEN $reduce > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")
  }

  /** Hamming distance between two SimHashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------ n-gram Jaccard

  /** Jaccard similarity of the distinct word-shingle sets of two texts.
    * Integer set sizes → one double division: bit-identical across
    * engines.
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    jaccardOf(wordShingles(a, n), wordShingles(b, n))

  /** Jaccard over char n-gram shingle sets — native one-pass expression
    * with exact string-set semantics ([[charNgramJaccardHof]] is the
    * built-in-composed reference form; equality asserted in tests).
    */
  def charNgramJaccard(a: Column, b: Column, n: Int = 5): Column =
    graft.functions.NativeString.charJaccard(a, b, n)

  def charNgramJaccardHof(a: Column, b: Column, n: Int = 5): Column =
    jaccardOf(charShingles(a, n), charShingles(b, n))

  private def jaccardOf(rawA: Column, rawB: Column): Column = {
    val sa = array_distinct(rawA)
    val sb = array_distinct(rawB)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(sa) + size(sb) - size(array_intersect(sa, sb))
    // two empty shingle sets → NULL (avoids ANSI div-by-zero; NULLIF twin)
    inter / nullif(union.cast("double"), lit(0.0))
  }

  def ngramJaccardSql(aE: String, bE: String, n: Int = 3): String = {
    val sa = s"list_distinct(${wordShinglesSql(aE, n)})"
    val sb = s"list_distinct(${wordShinglesSql(bE, n)})"
    val inter = s"len(list_filter($sa, x -> list_contains($sb, x)))"
    s"CAST($inter AS DOUBLE) / NULLIF(CAST(len($sa) + len($sb) - $inter AS DOUBLE), 0.0)"
  }

  // --------------------------------------- edit-distance fuzzy matching

  /** Blocked fuzzy key matching — entity-resolution-style near-identical
    * KEY pairs (titles, product names, author strings): rows sharing a
    * cheap blocking key meet in an equi-join, and survivors are the
    * pairs with Levenshtein distance ≤ `maxDist`. The MinHash family
    * here targets long documents; edit distance is the right metric for
    * SHORT strings where a one-character typo is the whole difference.
    *
    * Exactness: Levenshtein with unit costs is pure integer DP —
    * Spark's `levenshtein` and DuckDB's `levenshtein` agree exactly, so
    * the whole operator is integer-deterministic (no float anywhere).
    *
    * Recall caveat (standard blocking trade-off): a pair whose blocking
    * keys differ is invisible — pick a block the expected edits cannot
    * touch (e.g. last token for leading-adjective product names, a
    * phonetic key for person names). `maxBlock` drops degenerate blocks
    * before the self-join goes quadratic (same hazard and audit pattern
    * as the LSH `maxBucket`; [[oversizedFuzzyBlocks]] reports drops).
    *
    * Scale shape (100 TB): block sizes are a small aggregate broadcast
    * back (no window — a mega-block would funnel through one reducer
    * before the cap dropped it); the candidate join is an equi-join on
    * the block key; each candidate pair costs one O(|a|·|b|) DP on two
    * SHORT strings — cost is bounded by `maxBlock`² per block, never
    * corpus².
    */
  def fuzzyKeyPairs(df: DataFrame, idCol: String, keyCol: String,
      block: Column, maxDist: Int, maxBlock: Int = DefaultMaxBucket)
      : DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    val e = df.select(col(idCol).as("__id"), col(keyCol).as("__key"),
      block.as("__block"))
    val sizes = e.groupBy("__block").agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") <= maxBlock)
      .select("__block")
    val kept = e.join(broadcast(sizes), Seq("__block"))
    kept.as("a")
      .join(kept.as("b"), col("a.__block") === col("b.__block") &&
        col("a.__id") < col("b.__id"))
      .withColumn("dist", levenshtein(col("a.__key"), col("b.__key")))
      .filter(col("dist") <= maxDist)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__key").as("key_a"), col("b.__key").as("key_b"),
        col("dist").cast("long").as("dist"))
  }

  /** Audit twin of the [[fuzzyKeyPairs]] cap: the (block, size) rows a
    * given `maxBlock` would drop.
    */
  def oversizedFuzzyBlocks(df: DataFrame, block: Column,
      maxBlock: Int = DefaultMaxBucket): DataFrame =
    df.select(block.as("block"))
      .groupBy("block").agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlock)

  /** DuckDB twin of [[fuzzyKeyPairs]] (same blocks, same integer DP). */
  def fuzzyKeyPairsSql(table: String, idE: String, keyE: String,
      blockE: String, maxDist: Int,
      maxBlock: Int = DefaultMaxBucket): String =
    s"""WITH __e AS MATERIALIZED (
       |  SELECT $idE AS id, $keyE AS key, $blockE AS block FROM $table),
       |__sz AS (SELECT block FROM __e GROUP BY block
       |  HAVING count(*) <= $maxBlock),
       |__k AS (SELECT __e.* FROM __e JOIN __sz USING (block))
       |SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a, b.key AS key_b,
       |  CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
       |FROM __k a JOIN __k b ON a.block = b.block AND a.id < b.id
       |WHERE levenshtein(a.key, b.key) <= $maxDist""".stripMargin

  /** Candidate verification: Jaccard-score MinHash candidate pairs and
    * keep those ≥ threshold — the standard two-phase near-dup pipeline
    * (cheap LSH recall, exact verify on the tiny candidate set).
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 16, bands: Int = 4): DataFrame =
    verifyCandidates(df, minHashCandidates(df, idCol, textCol, k, bands),
      idCol, textCol, ngramJaccard(_, _), threshold)

  /** Char-level two-phase near-dup (char MinHash recall, char Jaccard
    * verify).
    */
  def charNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 16, bands: Int = 4, n: Int = 5): DataFrame =
    verifyCandidates(df,
      charMinHashCandidates(df, idCol, textCol, k, bands, n),
      idCol, textCol, charNgramJaccard(_, _, n), threshold)

  /** Incremental near-dup: match a NEW batch against an already-ACCEPTED
    * corpus — the shape a continuously-ingesting pipeline actually runs
    * (re-deduping the full corpus per batch is O(corpus) per day;
    * matching batch-vs-seen is O(batch)). Same two-phase semantics as
    * [[nearDuplicates]] — MinHash-LSH recall, exact word-shingle Jaccard
    * verify — but the band join is new×seen only: no seen×seen pairs
    * (they were already adjudicated when those docs were admitted) and
    * no new×new pairs (callers run [[nearDuplicates]] within the batch
    * separately if they want intra-batch dedup).
    *
    * Output: (id_new, id_seen, jaccard) pairs ≥ threshold; admit the
    * batch with an anti-join on `id_new` and append the survivors'
    * band rows to the seen-side bucket table — which at 100 TB is
    * PRECOMPUTED once and stored bucketed on (band, bucket), so each
    * day's join shuffles only the batch's (band, bucket, id) rows, never
    * the corpus. The mega-bucket cap guards the seen side: a boilerplate
    * bucket accumulated over months would otherwise cross-join against
    * every matching new row (same recall trade as [[minHashCandidates]],
    * audit via [[oversizedBuckets]]).
    */
  def incrementalNearDuplicates(newDf: DataFrame, seenDf: DataFrame,
      idCol: String, textCol: String, threshold: Double, k: Int = 16,
      bands: Int = 4, minTokens: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val rows = k / bands
    def bucketsOf(df: DataFrame, as: String): DataFrame = {
      val sig = graft.functions.NativeHash.minHashSig(
        shingleHashes(col(textCol)), k)
      df.filter(size(split(col(textCol), " ")) >= minTokens)
        .select(col(idCol).as(as),
          posexplode(bandHashes(sig, bands, rows)).as(Seq("band", "bucket")))
    }
    val seenB = bucketsOf(seenDf, "id_seen")
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val cands = bucketsOf(newDf, "id_new")
      .join(seenB, Seq("band", "bucket"))
      .select("id_new", "id_seen").distinct()
    // text-attach joins are LOOKUPS — hash-join, never sort-merge (see
    // verifyCandidates for the measured 30×-corpus cliff this avoids)
    cands
      .join(newDf.select(col(idCol).as("id_new"),
        col(textCol).as("__text_new")).hint("shuffle_hash"), "id_new")
      .join(seenDf.select(col(idCol).as("id_seen"),
        col(textCol).as("__text_seen")).hint("shuffle_hash"), "id_seen")
      .withColumn("jaccard", ngramJaccard(col("__text_new"), col("__text_seen")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_seen"), col("jaccard"))
  }

  private def verifyCandidates(df: DataFrame, cands: DataFrame,
      idCol: String, textCol: String, jaccard: (Column, Column) => Column,
      threshold: Double): DataFrame = {
    val docs = df.select(col(idCol), col(textCol))
    // The text-attach joins are LOOKUPS and must plan as hash joins:
    // once the corpus outgrows the auto-broadcast threshold the default
    // falls back to sort-merge, which SORTS the candidate stream with
    // its text payloads attached — the exact cliff measured on
    // similarityJoinExact's verify stage at a 30× corpus (121 → 24 s).
    // shuffle_hash builds the map on the doc side at any corpus size.
    cands
      .join(docs.select(col(idCol).as("id_a"), col(textCol).as("text_a"))
        .hint("shuffle_hash"), "id_a")
      .join(docs.select(col(idCol).as("id_b"), col(textCol).as("text_b"))
        .hint("shuffle_hash"), "id_b")
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // --------------------------------------------- transitive dup clusters

  /** Eager local checkpoint that also FLATTENS plan statistics.
    *
    * `Dataset.localCheckpoint` truncates lineage but propagates the
    * origin plan's size ESTIMATE into the new leaf (SPARK-39748). In an
    * iterative loop whose round joins the previous round's checkpoint
    * with itself, that estimate compounds multiplicatively —
    * `size_N ≈ size_{N-1}³` for the three-way pointer-jumping round — so
    * by round ~13 Catalyst's stats arithmetic is multiplying BigIntegers
    * of 10⁸ bits and each round's PLANNING (JoinSelection /
    * InjectRuntimeFilter calling `plan.stats`) takes minutes of driver
    * CPU while executors sit idle (observed on q97 at sf0.1: >20 min
    * driver-bound in `SizeInBytesOnlyStatsPlanVisitor`). Rebuilding the
    * frame from the checkpointed RDD yields a fresh leaf with flat
    * default stats: per-round planning cost stays constant for any
    * number of rounds. The row round-trip is per-(id,long)-pair and only
    * on label-sized data.
    */
  private def flatCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Connected components over verified near-dup pairs — the transitive
    * clustering that greedy per-pair dropping approximates (a~b, b~c ⇒
    * {a,b,c} are one cluster even when a~c was never a candidate).
    * Output: one row per id appearing in `pairs`, with `component` = the
    * minimum id reachable from it (the canonical cluster keeper).
    * Isolated docs never enter `pairs`, so absence from the output means
    * "its own cluster".
    *
    * Two execution paths by edge count (the size probe is one cheap
    * count over the already-materialized edge list): at or below
    * [[SmallGraphEdgeLimit]] with integral ids, a driver union-find
    * ([[smallGraphComponents]]) — the edge set is one task's worth of
    * data and the distributed rounds would be pure scheduling overhead
    * (measured 7 s → 0.3 s on q97's 870-edge sf0.1 graph). Above it,
    * the distributed algorithm below; both yield identical
    * (id, min-reachable-id) labels, property-tested against each other.
    *
    * Algorithm: min-label propagation WITH pointer jumping (path
    * halving). Each round every vertex takes the min of (a) its own
    * label, (b) its neighbors' labels, and (c) its label's label — the
    * shortcut that contracts a chain's length roughly in half per
    * round, so convergence is O(log diameter), not O(diameter): a
    * 2^20-hop chain (far beyond any real near-dup graph) closes inside
    * the default 20 rounds, where plain propagation needs a round per
    * hop (observed: the sf0.1 kNN semantic-dedup graph exceeded 20
    * hops and hit the fixpoint guard before the shortcut landed). Each
    * round is one neighbor shuffle join + partial-agg'd groupBy plus
    * one label-keyed self-join, all over `(id, long)` pairs only
    * (text/sketches never enter). Every round is `localCheckpoint`ed
    * (eager): lineage stays one round deep — no exponentially nested
    * plan — and the superseded round's blocks are RDD-scoped, so the
    * ContextCleaner frees them on GC. The driver sees only an emptiness
    * probe per round (limit-1 under the hood), never data.
    */
  /** Edge-count bound for the driver union-find fast path: 2²⁰ edges is
    * 16 MB of raw payload (two longs/edge), ~50 MB as the collected
    * `Array[(Long, Long)]` with tuple-object headers — ONE task's worth
    * of data, comfortably inside the driver heap, while the
    * distributed alternative pays ~5 scheduled jobs × O(log d) rounds of
    * pure overhead to process it (measured: q97's 870-edge graph spent
    * ~7 s in round scheduling at sf0.1). Above the bound the edge set is
    * real data and the O(log d) label-propagation rounds are the right
    * plan. The same small-graph/large-graph split every production
    * connected-components implementation makes.
    */
  val SmallGraphEdgeLimit: Long = 1L << 20

  def dupComponents(pairs: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b", maxIter: Int = 32,
      smallEdgeLimit: Long = SmallGraphEdgeLimit): DataFrame = {
    // materialize the edge list ONCE: the size probe below and every
    // propagation round read it, and without this the whole upstream
    // pair pipeline (LSH + verify, for near-dup input) would re-run per
    // use — measured 4.95 s → 1.2 s at sf0.1 for q49
    val undirected = flatCheckpoint(
      pairs.select(col(idACol).as("src"), col(idBCol).as("dst")))
    val idType = undirected.schema("src").dataType
    val integralIds = Seq(org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.ByteType).contains(idType)
    if (integralIds && undirected.count() <= smallEdgeLimit)
      return smallGraphComponents(undirected, idType)
    val edges = flatCheckpoint(undirected.unionByName(
      undirected.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = flatCheckpoint(edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("component").as("__nb_min"))
      // pointer jumping: each vertex also adopts its LABEL's label
      // (labels are node ids, so the lookup is a self-join on the
      // label key) — this halves chain lengths every round
      val viaLabel = labels
        .select(col("id").as("component"), col("component").as("__via"))
      val step1 = labels
        .join(neighborMin, Seq("id"), "left")
        .join(viaLabel, Seq("component"), "left")
        .select(col("id"), col("component").as("__old"),
          least(col("component"),
            coalesce(col("__nb_min"), col("component")),
            coalesce(col("__via"), col("component"))).as("component"))
      // second compression pass against the round's own fresher labels:
      // measured on the sf0.1 kNN semantic-dedup graph this cuts
      // convergence 25+ → 13 rounds (the single-jump tail crawls
      // through sparse high-id chains one relink at a time)
      val via2 = step1
        .select(col("id").as("component"), col("component").as("__via2"))
      // carry the old label through the checkpoint: convergence is then
      // a scan of materialized blocks, not another shuffle join
      val next = flatCheckpoint(step1
        .join(via2, Seq("component"), "left")
        .select(col("id"), col("__old"),
          least(col("component"),
            coalesce(col("__via2"), col("component"))).as("component")))
      converged = next.filter(col("component") =!= col("__old")).isEmpty
      labels = next.select("id", "component")
      iter += 1
    }
    require(converged, s"dupComponents: no fixpoint after $maxIter rounds " +
      "— component diameter exceeds maxIter; raise it or switch to the " +
      "large-star/small-star formulation")
    labels
  }

  /** Driver union-find over a BOUNDED edge list (see
    * [[SmallGraphEdgeLimit]] — the caller has already counted). Union by
    * min-root keeps the invariant root = min(set), so `find` yields
    * exactly the distributed algorithm's min-reachable-id label; path
    * halving keeps finds near-O(1). Output schema and dtypes match the
    * distributed path (one row per id in the edge list).
    */
  private def smallGraphComponents(undirected: DataFrame,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = undirected.sparkSession
    import spark.implicits._
    // null ids never link anything in the distributed path (the label
    // join drops them); filter pre-collect so both paths agree instead
    // of this one NPE'ing on row.getLong
    val es = undirected
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("_1"),
        col("dst").cast("long").as("_2"))
      .as[(Long, Long)] // typed collect: primitive tuples, no Row wrappers
      .collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "component")
      .select(col("id").cast(idType).as("id"),
        col("component").cast(idType).as("component"))
  }

  /** Canonical-document election per duplicate cluster: given
    * [[dupComponents]] labels, pick the one copy of each cluster worth
    * keeping — the longest document, ties to the smallest id — and
    * report cluster size. This is the decision step after transitive
    * clustering: q49 says WHICH docs are mutual near-dups; this says
    * which single doc survives (every pipeline that clusters dups needs
    * exactly this reduce before the drop list exists).
    *
    * Scale shape: one equi-join of the (id, component) labels with an
    * (id, n_tokens) projection of the corpus — text itself never moves —
    * then a map-side-combined argmax per component
    * (`min(struct(-n_tokens, id))`, one aggregate, no window funnel).
    */
  def canonicalPerCluster(components: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sized = docs.select(col(idCol),
      Text.tokenCount(col(textCol)).cast("long").as("__ntok"))
    components.select(col("id").as(idCol), col("component"))
      .join(sized, Seq(idCol))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("__ntok")).as("__neg"), col(idCol).as("__id")))
          .as("__best"))
      .select(col("component"), col("n_members"),
        col("__best").getField("__id").as("canonical_id"),
        (-col("__best").getField("__neg")).as("canonical_tokens"))
  }

  /** Cluster cohesion audit — the quality check on [[dupComponents]]'s
    * transitive closure. Transitivity is the known overreach risk of
    * LSH clustering: a~b and b~c chain {a,b,c} into one cluster even
    * when a and c share nothing (the "bridge document" failure — a
    * boilerplate page linking two unrelated families). A true dup
    * group is a near-CLIQUE (every pair verified similar); a chain is
    * sparse. Per component this emits member count, verified-edge
    * count, exact integer density ppm (`2e·10⁶ / (n(n−1))`) and a
    * suspect flag (`density < minDensityPpm`, only meaningful for
    * n ≥ 3 — two-member clusters are trivially 100% dense). Suspect
    * clusters get re-adjudicated (verify the missing pairs, or split)
    * before [[canonicalPerCluster]] drops all non-canonical members.
    *
    * Scale shape: labels and pairs are delta-sized (dup members only);
    * both collapse to per-component counts via map-side-combined
    * aggregates before the (tiny) count-table join. BIGINT overflow on
    * the density cross products raises instead of wrapping (a >3·10⁹-
    * member component would overflow `n(n−1)` — and is itself a bug).
    */
  def clusterCohesion(pairs: DataFrame, labels: DataFrame,
      minDensityPpm: Long = 800000L, idACol: String = "id_a"): DataFrame = {
    val members = labels.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
    // an edge's endpoints share a component by construction — labeling
    // by id_a alone is enough
    val edges = pairs
      .join(labels.select(col("id").as(idACol), col("component")),
        Seq(idACol))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_edges"))
    val fits = col("n_members") <= lit(3037000499L) && // floor(sqrt(Long.Max))
      col("n_edges") <= lit(Long.MaxValue / 2000000L)
    members.join(edges, Seq("component"), "left")
      .withColumn("n_edges", coalesce(col("n_edges"), lit(0L)))
      .withColumn("density_ppm",
        when(col("n_members") < 2, lit(1000000L))
          .when(fits, expr(
            "n_edges * 2000000 DIV (n_members * (n_members - 1))"))
          .otherwise(raise_error(
            lit("clusterCohesion: BIGINT overflow — component too large"))))
      .withColumn("is_suspect",
        col("n_members") >= 3 && col("density_ppm") < lit(minDensityPpm))
  }

  /** DuckDB twin of [[clusterCohesion]] given CTEs `comp` (doc_id,
    * component) and `ver` (id_a, id_b) — see the q49 oracle chain.
    */
  def clusterCohesionSql(minDensityPpm: Long = 800000L): String =
    s"""SELECT m.component, m.n_members,
       |  COALESCE(e.n_edges, 0) AS n_edges,
       |  CASE WHEN m.n_members < 2 THEN 1000000
       |       ELSE COALESCE(e.n_edges, 0) * 2000000
       |         // (m.n_members * (m.n_members - 1)) END AS density_ppm,
       |  m.n_members >= 3 AND (CASE WHEN m.n_members < 2 THEN 1000000
       |       ELSE COALESCE(e.n_edges, 0) * 2000000
       |         // (m.n_members * (m.n_members - 1)) END) < $minDensityPpm
       |    AS is_suspect
       |FROM (SELECT component, CAST(count(*) AS BIGINT) AS n_members
       |      FROM comp GROUP BY component) m
       |LEFT JOIN (SELECT c.component, CAST(count(*) AS BIGINT) AS n_edges
       |      FROM ver v JOIN comp c ON v.id_a = c.doc_id
       |      GROUP BY c.component) e USING (component)""".stripMargin

  // -------------------------------------------------- decontamination

  /** Benchmark decontamination: drop every corpus document sharing at
    * least one word n-gram with the benchmark set — the standard
    * test-set-leakage gate a training corpus passes before a run (an
    * eval question that appears verbatim in training data invalidates
    * the eval).
    *
    * Scale shape (corpus = 100 TB, benchmark = the eval suites, MBs):
    * the benchmark's distinct n-grams are tiny and BROADCAST; corpus
    * n-grams are a per-row flatMap that feeds a broadcast semi-join, so
    * no corpus byte ever shuffles — the only exchange is the distinct
    * over matched doc ids (bounded by the contamination rate, not the
    * corpus). The final anti-join broadcasts those ids back over a
    * second corpus scan. For a single-scan variant at extreme scale,
    * gate the n-gram check behind [[graft.ops.BloomJoin]]'s bloom of
    * benchmark grams (misses skip gram generation entirely); the exact
    * semantics here are what that fast path must preserve.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 4): DataFrame =
    corpus.join(
      broadcast(contaminatedIds(corpus, benchmark, idCol, textCol, n)),
      Seq(idCol), "left_anti")

  /** The id set [[decontaminate]] drops — for pipelines that track
    * survivors as id-frames: `corpus anti contaminatedIds` needs ONE
    * gram scan of the corpus, where `decontaminate(...).select(id)`
    * would re-derive its input for both the gram explode and the final
    * anti join (the input's lineage runs twice).
    */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 4): DataFrame = {
    val benchGrams = benchmark
      .select(explode(wordShingles(col(textCol), n)).as("__gram"))
      .distinct()
    corpus
      .select(col(idCol), explode(wordShingles(col(textCol), n)).as("__gram"))
      .join(broadcast(benchGrams), "__gram")
      .select(idCol).distinct()
  }

  /** Audit twin of [[decontaminate]]: instead of silently dropping
    * contaminated docs, report WHICH benchmark items leak into WHICH
    * corpus docs and how strongly — `(idCol, benchIdCol,
    * n_shared_grams)` for every pair sharing ≥ 1 distinct word n-gram.
    * An eval owner triages this (a 1-gram graze vs a verbatim question)
    * before the drop list is final; the drop set of [[decontaminate]]
    * is exactly the distinct `idCol` of this report.
    *
    * Scale shape: same as [[decontaminate]] — the benchmark's
    * (gram, bench id) pairs are tiny and BROADCAST; corpus grams are a
    * per-row flatMap feeding the broadcast join, so no corpus byte
    * shuffles; the only exchange is the (doc, bench) pair aggregate,
    * bounded by the contamination rate. Grams are DISTINCT per side so
    * the count means "shared vocabulary of n-grams", not an
    * occurrence product.
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, benchIdCol: String, n: Int = 4)
      : DataFrame = {
    require(idCol != benchIdCol,
      s"corpus and benchmark id columns must differ, both were `$idCol`")
    val benchGrams = benchmark
      .select(col(benchIdCol),
        explode(array_distinct(wordShingles(col(textCol), n))).as("__gram"))
    corpus
      .select(col(idCol),
        explode(array_distinct(wordShingles(col(textCol), n))).as("__gram"))
      .join(broadcast(benchGrams), "__gram")
      .groupBy(col(idCol), col(benchIdCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  // ---------------------------------------- cross-doc shared n-grams

  /** ExactSubstr-lite corpus-duplication stats (the cross-document twin
    * of `Text.topNgramStats`, which is within-doc): per document, how
    * many of its word n-gram OCCURRENCES also occur in at least one
    * OTHER document, and the shared fraction. Exact-substring overlap
    * is the strongest duplication signal a training corpus has —
    * MinHash answers "is this whole doc a near-copy?", this answers
    * "how much of this doc is copied from anywhere?" (templated
    * boilerplate, quoted chains, mirrored paragraphs), which MinHash
    * misses when the copied span is a minority of the doc.
    *
    * A gram is shared-for-this-doc iff the corpus-wide occurrence total
    * exceeds the doc's own count (`tot > cnt` ⟺ ≥ 2 distinct docs
    * contain it) — one integer comparison, no distinct-doc count.
    *
    * Scale shape: only `(id, gramHash64, count)` triples ever shuffle —
    * grams are hashed per-row inside codegen ([[shingleHashes]]), text
    * never leaves the scan. Three hash aggregates, all map-side
    * combined: (id, gram) — key includes the doc, no corpus hot key;
    * (gram) — corpus totals, Zipf-bounded; (id) — the final per-doc
    * rollup. The one join (per-doc counts × corpus totals) is equi on
    * the gram hash with exactly ONE row per key on the totals side, so
    * an AQE skew split (or a salted replicate of that single row) flat
    * spreads a boilerplate gram's millions of probe rows — no quadratic
    * blowup is possible (a whole-partition window over the gram would
    * funnel that hot gram through one reducer with no AQE remedy —
    * rejected). Docs with < n tokens surface as (0, 0, 0.0), kept
    * visible like [[Text.topNgramStats]] fragments.
    *
    * The per-doc count table feeds BOTH join sides, so it is
    * materialized eagerly (`localCheckpoint`, the [[dupComponents]]
    * edge-list pattern): without the boundary Spark re-runs the gram
    * explode + first aggregate once per side — at corpus scale that is
    * the single most expensive pass, paid twice. Blocks are RDD-scoped
    * (ContextCleaner frees them on GC); the lost-executor recompute
    * caveat is the same one dupComponents documents.
    */
  def sharedNgramStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    val perDoc = df
      .select(col(idCol), explode(shingleHashes(col(textCol), n)).as("__gh"))
      .groupBy(col(idCol), col("__gh"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(true)
    val totals = perDoc.groupBy(col("__gh"))
      .agg(sum("__cnt").as("__tot"))
    val scored = perDoc.join(totals, "__gh")
      .groupBy(col(idCol))
      .agg(sum("__cnt").as("n_ngrams"),
        sum(when(col("__tot") > col("__cnt"), col("__cnt"))
          .otherwise(lit(0L))).as("n_shared"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("n_shared").cast("double") /
          col("n_ngrams").cast("double"), lit(0.0)).as("shared_frac"))
  }

  // ------------------------------------------------- segment-level dedup

  /** Segment-level dedup with document reassembly (the CCNet paragraph
    * dedup shape, arXiv:1911.00359 — the corpus has no paragraph breaks,
    * so the unit is a fixed window of `segSize` consecutive tokens):
    * split every document into non-overlapping segments, keep exactly one
    * copy of each distinct segment corpus-wide (the first by
    * `(id, segment index)` order), and rebuild each document from its
    * surviving segments in order. Unlike [[sharedNgramStats]] (which
    * *measures* cross-document duplication) this *removes* it — the
    * boilerplate-stripping stage a web-scale corpus runs before training.
    *
    * Scale shape (100 TB): segment text NEVER shuffles. Segmentation +
    * hashing is per-row arithmetic on the existing [[Text.chunkTokens]]
    * slicing (one scan, zero shuffle), after which the text is DROPPED:
    * the keeper election and the kept-flag join move only
    * `(hash, id, idx)` tuples — bytes per segment no matter how long
    * segments are — and the per-document rollup moves `(id, idx)` ints.
    * Cleaned text is rebuilt at the END, per-row, by re-slicing the
    * document's own token array at its kept segment indices — so the one
    * exchange that touches documents is the final equi-join of the
    * corpus with its per-doc kept-index arrays on the document id (the
    * natural output partitioning; exchange-free on the big side if the
    * corpus is bucketed by id). The keeper join is equi on the hash with
    * exactly one keeper row per key (skew-safe: AQE can split a hot
    * boilerplate hash; the one-row side never amplifies).
    * Hash collisions (p ≈ n²/2P per pair) conflate two distinct segments
    * — the standard hash-dedup trade-off; at production scale swap in a
    * 128-bit `xxhash64` pair the same way the MinHash operators do.
    */
  def segmentDedup(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", segSize: Int = 20): DataFrame = {
    require(segSize > 0, s"segSize must be positive: $segSize")
    // (id, idx, hash) — the native segment hasher range-hashes the
    // original char spans directly (single-space split ∘ join is the
    // identity), so no segment string is ever built and nothing but
    // 8-byte keys enters any exchange. Bit-equal to polyHash of
    // chunkTokens(overlap=0).chunk_text — asserted in PrepSpec.
    val segKeys = df.select(col(idCol),
      posexplode(graft.functions.NativeHash
          .segmentHashes(col(textCol), segSize))
        .as(Seq("chunk_id", "__h")))
    val keepers = segKeys.groupBy("__h")
      .agg(min(struct(col(idCol), col("chunk_id"))).as("__keep"))
    val perDoc = segKeys.join(keepers, "__h")
      .withColumn("__kept",
        struct(col(idCol), col("chunk_id")) === col("__keep"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__kept"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        // collect_list drops the nulls `when` emits for dropped
        // segments; sorting restores document order.
        array_sort(collect_list(when(col("__kept"), col("chunk_id"))))
          .as("__kept_ids"))
    // tokenize ONCE per row before the lambda — an expression inside the
    // transform body would re-split the document per kept segment
    df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .join(perDoc, Seq(idCol))
      .select(col(idCol), col("n_segments"), col("n_kept"),
        array_join(transform(col("__kept_ids"),
            i => array_join(slice(col("__toks"),
              i.cast("int") * segSize + 1, lit(segSize)), " ")),
          " ").as("dedup_text"))
  }

  /** DuckDB twin of [[segmentDedup]]: same slicing, same hash, keeper by
    * `row_number` over `(id, idx)` — the window formulation of the same
    * min-struct election.
    */
  def segmentDedupSql(table: String, idE: String, textE: String,
      segSize: Int): String = {
    val chunk = Text.chunkTokensSql(table, idE, textE, segSize, 0)
    s"""WITH seg AS MATERIALIZED ($chunk),
       |__sh AS (SELECT doc_id, chunk_id, chunk_text,
       |  ${polyHashSql("chunk_text")} AS h FROM seg),
       |__sk AS (SELECT *, row_number() OVER (PARTITION BY h
       |  ORDER BY doc_id, chunk_id) AS rn FROM __sh)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_segments,
       |  CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
       |  coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id)
       |    FILTER (rn = 1), '') AS dedup_text
       |FROM __sk GROUP BY doc_id""".stripMargin
  }

  // --------------------------------------- exact set-similarity join

  /** Rare-first shingle ordering for the prefix filter: per doc, the
    * distinct shingle hashes sorted by global document frequency asc
    * (`__hs`) plus the set size (`__n`).
    */
  private def orderedShingles(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n > 0, s"shingle width must be positive: $n")
    val sh = df.select(col(idCol).cast("long").as("__id"),
      explode(array_distinct(shingleHashes(col(textCol), n))).as("__h"))
    val dfreq = sh.groupBy("__h").agg(count(lit(1)).as("__df"))
    sh.join(dfreq, "__h")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__h"))))
        .as("__arr"))
      .select(col("__id"),
        transform(col("__arr"), _.getField("__h")).as("__hs"),
        size(col("__arr")).cast("long").as("__n"))
  }

  /** Candidate-pair stage (prefix equi-join + PPJoin length filter +
    * distinct), separated from the verify join so scale probes can
    * measure the candidate count — the one quantity whose growth rate
    * decides whether the whole join survives a corpus scale-up.
    */
  private def candidatesFromOrdered(ordered: DataFrame, thresholdNum: Int,
      thresholdDen: Int): DataFrame = {
    require(thresholdNum > 0 && thresholdDen >= thresholdNum,
      s"threshold must be a rational in (0, 1]: $thresholdNum/$thresholdDen")
    // prefix length n − ⌈t·n⌉ + 1 in exact integers:
    // ⌈n·num/den⌉ = (n·num + den − 1) div den
    val pfxLen = expr(
      s"__n - ((__n * $thresholdNum + ${thresholdDen - 1}) " +
        s"div $thresholdDen) + 1")
    val prefix = ordered.select(col("__id"), col("__n"),
      explode(slice(col("__hs"), lit(1), pfxLen.cast("int"))).as("__h"))
    // PPJoin length filter, exact integers: J(a,b) ≤ min(|a|,|b|) /
    // max(|a|,|b|), so any pair with min·den < num·max can't reach the
    // threshold — pruned BEFORE the distinct and the wide array joins
    // (the sizes ride the prefix rows; 8 bytes against a pruned
    // candidate's whole shingle array downstream). PPJoin's POSITIONAL
    // filter was probed and rejected: on the sf0.1 corpus it pruned
    // 0.4% of candidates (short shingle sets leave the positional
    // bound slack) for posexplode + two extra join columns — the
    // length filter alone removed 24%.
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id") &&
          least(col("a.__n"), col("b.__n")) * thresholdDen >=
            lit(thresholdNum.toLong) * greatest(col("a.__n"), col("b.__n")))
      .select(col("a.__id").as("__ia"), col("b.__id").as("__ib"))
      .distinct()
  }

  /** The candidate pairs [[similarityJoinExact]] would verify — exposed
    * for stress probes (candidate count vs corpus scale, the pressure
    * point named by the round-9 review). Columns: `id_a`, `id_b`.
    */
  def similarityJoinCandidates(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, thresholdNum: Int = 1,
      thresholdDen: Int = 2): DataFrame =
    candidatesFromOrdered(orderedShingles(df, idCol, textCol, n),
        thresholdNum, thresholdDen)
      .select(col("__ia").as("id_a"), col("__ib").as("id_b"))

  /** EXACT all-pairs Jaccard similarity join via prefix filtering
    * (Chaudhuri/Ganti/Kaushik ICDE'06, Xiao et al. PPJoin) — the
    * deterministic complement to MinHash-LSH: every pair with
    * `J(shingles_a, shingles_b) ≥ num/den` is returned, no
    * probabilistic misses, no banding tuning. The threshold is a
    * RATIONAL (`num/den`): prefix lengths and the final acceptance
    * test are exact integer arithmetic (`c·den ≥ num·(n_a+n_b−c)`) —
    * no float ever decides membership, so both engines agree exactly.
    *
    * Why it still scales: J ≥ t forces an overlap of ⌈t·n⌉ with BOTH
    * sets, so a pair must share an element inside each side's
    * `n − ⌈t·n⌉ + 1`-element prefix under ANY fixed global element
    * order. Ordering rare-first (global document frequency asc) makes
    * prefix elements the RAREST shingles, so the candidate equi-join
    * on prefix elements explodes on low-df keys only — the classic
    * prefix-filter guarantee. Verification then runs on the
    * candidate-sized set with exact intersections.
    *
    * Scale shape: one shuffle for the df count, one fact-side join to
    * attach dfs, a per-doc bounded sort (doc-length arrays, never a
    * corpus sort), the prefix equi-join (rare keys), and a
    * delta-sized verify join. Docs with fewer than `n` tokens have
    * empty shingle sets and never pair (J undefined) — consistent in
    * both engines.
    */
  def similarityJoinExact(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, thresholdNum: Int = 1,
      thresholdDen: Int = 2): DataFrame = {
    val ordered = orderedShingles(df, idCol, textCol, n)
    val cands = candidatesFromOrdered(ordered, thresholdNum, thresholdDen)
    // The verify joins attach each side's shingle array to the candidate
    // pairs — a LOOKUP, so they must plan as hash joins, never sort-
    // merge: the shuffle_hash hint builds the per-partition map on the
    // doc-array side and streams the candidate side unsorted. Without
    // it, the moment the doc side outgrows the auto-broadcast threshold
    // the planner falls back to SMJ and SORTS the candidate stream
    // (candidate-count rows × shingle-array payload) twice — measured at
    // a 30× corpus: 121 s vs 24 s, a 5× cliff for zero semantic
    // difference. At bench scale the hint trades a ~2 MB broadcast for
    // one tiny shuffle (sub-noise); at 100 TB it is the only shape that
    // works — the corpus side can't broadcast and the candidate side
    // must not sort.
    cands
      .join(ordered.select(col("__id").as("__ia"), col("__hs").as("__ha"),
        col("__n").as("__na")).hint("shuffle_hash"), Seq("__ia"))
      .join(ordered.select(col("__id").as("__ib"), col("__hs").as("__hb"),
        col("__n").as("__nb")).hint("shuffle_hash"), Seq("__ib"))
      .withColumn("__c",
        size(array_intersect(col("__ha"), col("__hb"))).cast("long"))
      .filter(col("__c") * thresholdDen >=
        lit(thresholdNum.toLong) * (col("__na") + col("__nb") - col("__c")))
      .select(col("__ia").as("id_a"), col("__ib").as("id_b"),
        col("__c").as("n_inter"),
        (col("__na") + col("__nb") - col("__c")).as("n_union"),
        (col("__c").cast("double") /
          (col("__na") + col("__nb") - col("__c")).cast("double"))
          .as("jaccard"))
  }

  /** DuckDB twin of [[similarityJoinExact]] — deliberately the BRUTE
    * FORCE formulation (all shared-shingle pairs, exact counts): the
    * oracle proves the prefix filter loses nothing.
    */
  def similarityJoinExactSql(table: String, idE: String, textE: String,
      n: Int, thresholdNum: Int, thresholdDen: Int): String =
    s"""WITH __sh AS MATERIALIZED (
       |  SELECT $idE AS id, unnest(list_distinct(
       |    ${shingleHashesSql(textE, n)})) AS h
       |  FROM $table),
       |__sz AS (SELECT id, count(*) AS nn FROM __sh GROUP BY id),
       |__pair AS (
       |  SELECT a.id AS ia, b.id AS ib, count(*) AS c
       |  FROM __sh a JOIN __sh b ON a.h = b.h AND a.id < b.id
       |  GROUP BY 1, 2)
       |SELECT ia AS id_a, ib AS id_b, CAST(c AS BIGINT) AS n_inter,
       |  CAST(sa.nn + sb.nn - c AS BIGINT) AS n_union,
       |  CAST(c AS DOUBLE) / CAST(sa.nn + sb.nn - c AS DOUBLE) AS jaccard
       |FROM __pair JOIN __sz sa ON ia = sa.id JOIN __sz sb ON ib = sb.id
       |WHERE c * $thresholdDen >= $thresholdNum * (sa.nn + sb.nn - c)""".stripMargin

  // ---------------------------------------------- boilerplate removal

  /** Frequency-threshold boilerplate removal (the CCNet/RefinedWeb
    * header-footer filter, arXiv:1911.00359 §4.1 / arXiv:2306.01116
    * §3.2): drop EVERY copy of any segment that occurs in ≥ `minDocs`
    * DISTINCT documents, and rebuild each document from what survives.
    * Complementary to [[segmentDedup]], which keeps the first copy of
    * each duplicated segment — a navigation bar or cookie banner that
    * appears in ten thousand crawled pages should not survive even
    * once, while a passage quoted twice should. The two operators
    * differ exactly on that axis: election-by-first vs
    * document-frequency threshold.
    *
    * Scale shape (100 TB): identical to [[segmentDedup]] — segment text
    * NEVER shuffles. The native segment hasher range-hashes each char
    * span in place (one scan, zero shuffle, no segment string built);
    * the document-frequency count moves only distinct `(hash, id)`
    * pairs (collapsed map-side by the partial-distinct phase), and the
    * boilerplate set that joins back is threshold-filtered — at most
    * one row per *frequent* segment, the natural broadcast side since
    * true boilerplate vocabularies are tiny relative to the corpus.
    * The per-doc rollup and the final rebuild join move `(id, idx)`
    * ints and ride the corpus's id partitioning.
    * Hash collisions conflate two distinct segments (p ≈ n²/2P per
    * pair) — as with [[segmentDedup]], swap in a 128-bit `xxhash64`
    * pair at production scale.
    */
  def boilerplate(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", segSize: Int = 10,
      minDocs: Int = 3): DataFrame = {
    require(segSize > 0, s"segSize must be positive: $segSize")
    require(minDocs > 1, s"minDocs must be > 1: $minDocs")
    val segKeys = df.select(col(idCol),
      posexplode(graft.functions.NativeHash
          .segmentHashes(col(textCol), segSize))
        .as(Seq("chunk_id", "__h")))
    // document frequency per segment hash: explicit two-phase — the
    // distinct collapses a doc's repeated segments map-side, then the
    // count shuffles one row per (hash, doc). Only hashes at or above
    // the threshold survive into the join side.
    val boiler = segKeys.select(col("__h"), col(idCol)).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__h"), lit(true).as("__boiler"))
    val perDoc = segKeys.join(boiler, Seq("__h"), "left")
      .withColumn("__kept", col("__boiler").isNull)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__kept"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        array_sort(collect_list(when(col("__kept"), col("chunk_id"))))
          .as("__kept_ids"))
    df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .join(perDoc, Seq(idCol))
      .select(col(idCol), col("n_segments"), col("n_kept"),
        array_join(transform(col("__kept_ids"),
            i => array_join(slice(col("__toks"),
              i.cast("int") * segSize + 1, lit(segSize)), " ")),
          " ").as("clean_text"))
  }

  /** DuckDB twin of [[boilerplate]]: same slicing, same hash, document
    * frequency by `count(DISTINCT doc_id)` per hash.
    */
  def boilerplateSql(table: String, idE: String, textE: String,
      segSize: Int, minDocs: Int): String = {
    val chunk = Text.chunkTokensSql(table, idE, textE, segSize, 0)
    s"""WITH seg AS MATERIALIZED ($chunk),
       |__sh AS (SELECT doc_id, chunk_id, chunk_text,
       |  ${polyHashSql("chunk_text")} AS h FROM seg),
       |__df AS (SELECT h, count(DISTINCT doc_id) AS nd
       |  FROM __sh GROUP BY h),
       |__fl AS (SELECT s.doc_id, s.chunk_id, s.chunk_text,
       |  (d.nd < $minDocs) AS kept FROM __sh s JOIN __df d USING (h))
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_segments,
       |  CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
       |  coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id)
       |    FILTER (kept), '') AS clean_text
       |FROM __fl GROUP BY doc_id""".stripMargin
  }
}
