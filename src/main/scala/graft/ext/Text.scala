package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Text analysis for large-scale training-data pipelines (north-star
  * extension surface, SURVEY.md §2.11): language-ID heuristic, quality
  * scoring, token counting, document fingerprinting. Everything is
  * built-in Catalyst expressions (codegen'd, shuffle-free, embarrassingly
  * parallel per row) — the correct shape for a 100 TB corpus: one scan,
  * no shuffle, columns pruned to `text` + id.
  */
object Text {

  /** Whitespace tokens (single-space split, reference-style simplicity).
    * Empties kept — consistent with DuckDB `string_split`.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count: words + digit runs + punctuation marks each
    * count as tokens, long words count extra per 4 chars (crude BPE
    * length prior). Deterministic integer arithmetic only.
    */
  def subwordCount(text: Column): Column = {
    val words = tokens(text)
    aggregate(words, lit(0L),
      (acc, w) => acc + lit(1L) + floor(length(w) / lit(4)).cast("long"))
  }

  /** Stopword hits among tokens. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text),
      t => t.isin(stopwords.map(s => s: Any): _*)))

  /** Punctuation characters in the text. */
  val punctClass = "[.,!?;:]"
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, punctClass, ""))

  /** Quality score ∈ ℝ: favors mid-length docs with sane stopword and
    * punctuation ratios (the standard corpus-filtering heuristics:
    * length / punct / stopword ratios). Pure double arithmetic from
    * integers — bit-identical across engines.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nStop = stopwordCount(text).cast("double")
    val nPunct = punctCount(text).cast("double")
    val len = length(text).cast("double")
    // empty text: length 0 would divide by zero (ANSI error, found by
    // the fuzz-corpus gate). Defined semantics: an empty doc has punct
    // fraction 0 — the SQL twin carries the same CASE. (nTok is never 0:
    // split("") yields [""], so size ≥ 1 in both engines.)
    (nStop / nTok) * lit(2.0) +
      (lit(1.0) - when(len > 0, nPunct / len).otherwise(lit(0.0))) +
      least(nTok / lit(100.0), lit(1.0))
  }

  /** Language-ID by bigram profile: occurrence counts of a few
    * discriminative letter bigrams, argmax with deterministic tie-break
    * (first in list order). A real system would use a trained profile;
    * the operator shape — per-row O(len) scoring, no shuffle — is what
    * matters at 100 TB.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "in"),
    "es" -> Seq("es", "os", "la"),
    "de" -> Seq("de", "er", "ch"),
    "fr" -> Seq("le", "ou", "ai"))

  private def bigramCount(text: Column, bg: String): Column =
    graft.functions.NativeString.countSubstr(text, bg)

  /** HOF reference form of [[bigramCount]] (same values: a single-pass
    * replace removes exactly the non-overlapping occurrences).
    */
  private[graft] def bigramCountHof(text: Column, bg: String): Column =
    floor((length(text) - length(regexp_replace(text, bg, ""))) / bg.length)
      .cast("long")

  def langScore(text: Column, lang: String): Column =
    langProfiles.toMap.apply(lang)
      .map(bigramCount(text, _)).reduce(_ + _)

  def langId(text: Column): Column = {
    val scores = langProfiles.map { case (l, _) => l -> langScore(text, l) }
    // argmax, ties broken by profile order (strict > against the running max)
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (l, s)) =>
        (when(s > bestScore, lit(l)).otherwise(bestLang),
          greatest(s, bestScore))
    }._1
  }

  /** Document fingerprint: normalize (lowercase, collapse runs of
    * whitespace, strip punctuation, sort tokens) then rolling-hash
    * (PortableHash.polyHash) — near-identical docs that differ only in
    * case/punctuation/token order collapse to one fingerprint.
    */
  def normalizedText(text: Column): Column =
    array_join(
      array_sort(filter(
        split(regexp_replace(lower(text), punctClass, ""), " +"),
        t => t =!= lit(""))),
      " ")

  def fingerprint(text: Column): Column =
    graft.functions.NativeHash.normFingerprintCol(text)

  /** HOF reference form of [[fingerprint]] (same values). */
  def fingerprintHof(text: Column): Column =
    graft.functions.PortableHash.polyHash(normalizedText(text))

  /** Corpus token statistics: one explode + hash aggregate — the
    * canonical "shuffle the tokens, not the docs" shape. At 100 TB the
    * map-side partial aggregation collapses each partition's token counts
    * before the exchange, so shuffle volume is bounded by vocabulary ×
    * partitions, not token count.
    */
  def tokenFrequencies(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))

  /** TF-IDF (linear idf = N/df — avoids ln(), whose last-ulp behavior is
    * libm-specific and would break cross-engine bit-equality) with top-k
    * tokens per document. Two aggregates + one broadcastable join + one
    * window — the whole pipeline shuffles tokens once. The corpus size N
    * is a 1-row aggregate broadcast-cross-joined INTO the plan (no
    * driver-side `count()` action, which would re-scan the corpus once
    * before the real job — one extra full pass at 100 TB).
    */
  def tfidfTopK(df: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDf = df.agg(count(lit(1)).cast("double").as("__corpus_n"))
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // document frequency derived FROM tf (already one row per (doc,token))
    // — avoids a second explode + distinct over the token stream
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDf))
      .withColumn("score",
        col("tf").cast("double") * (col("__corpus_n") / col("df").cast("double")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"),
        col("score"))
  }

  /** Context-window chunking: split each document into overlapping
    * token windows of `size` tokens advancing by `size - overlap` — the
    * sequence-preparation stage before training/embedding (a document
    * longer than the model context must become several windows; the
    * overlap preserves cross-boundary context).
    *
    * Chunk i covers tokens `[i·stride, i·stride + size)`;
    * `1 + ceil(max(n - size, 0) / stride)` chunks per doc, so a short
    * doc yields exactly one chunk and the last chunk is never empty.
    * All integer arithmetic + array slicing — per-row, zero shuffle,
    * codegen'd, linear in corpus size; output order is (id, chunk_id)
    * with no window function needed (posexplode carries the index).
    */
  def chunkTokens(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", size: Int = 512,
      overlap: Int = 64): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size: size=$size overlap=$overlap")
    val stride = size - overlap
    val winLen = lit(size) // `size` the Int param, not functions.size
    val toks = tokens(col(textCol))
    val n = tokenCount(col(textCol))
    // ceil((n-size)/stride) via exact integer arithmetic (x - x mod s)/s
    // — no double division anywhere, mirroring AsOfJoin's bucket math
    val x = greatest(n - winLen, lit(0)) + lit(stride - 1)
    val lastChunk = ((x - pmod(x, lit(stride))) / lit(stride)).cast("int")
    df.select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0), lastChunk)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1, winLen), " ")
          .as("chunk_text"),
        least(org.apache.spark.sql.functions.size(col("__toks"))
            - col("chunk_id") * stride, winLen)
          .cast("long").as("n_tokens"))
  }

  /** DuckDB twin of [[chunkTokens]] (same slicing arithmetic). */
  def chunkTokensSql(table: String, idE: String, textE: String,
      size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""WITH __d AS MATERIALIZED (
       |  SELECT $idE AS doc_id, string_split($textE, ' ') AS toks
       |  FROM $table),
       |__e AS (SELECT doc_id, toks,
       |  unnest(generate_series(0,
       |    CAST((greatest(len(toks) - $size, 0) + ${stride - 1}) // $stride AS INT)))
       |    AS chunk_id FROM __d)
       |SELECT doc_id, chunk_id,
       |  array_to_string(toks[chunk_id*$stride+1 : chunk_id*$stride+$size], ' ')
       |    AS chunk_text,
       |  CAST(least(len(toks) - chunk_id*$stride, $size) AS BIGINT) AS n_tokens
       |FROM __e""".stripMargin
  }

  /** Repetition-aware quality rules (the Gopher/C4-style corpus gate):
    * per-document structural metrics plus a boolean per rule and an
    * overall keep decision. All metrics are exact integer counts with at
    * most one double division each — bit-identical across engines.
    *
    *   - `n_tokens` within [minTokens, maxTokens] (fragment / runaway cut)
    *   - `mean_token_len` within [2, 10] (gibberish / binary-blob cut)
    *   - `unique_ratio` = distinct tokens / tokens ≥ minUniqueRatio
    *     (degenerate repetition cut)
    *   - `dup_3gram_ratio` = 1 − distinct 3-grams / 3-grams ≤
    *     maxDup3gramRatio (looped-paragraph cut)
    *
    * Per-row array ops only — zero shuffle, codegen'd, linear scan; the
    * decision column lets the caller audit WHY a doc was dropped (filter
    * on `passes` for the keep-side, on individual rules for triage).
    */
  /** The four structural metrics of [[qualityRules]], as columns over a
    * text column — single source of truth for both the audit projection
    * and the composable [[passesQuality]] predicate.
    */
  private def qualityMetrics(text: Column)
      : (Column, Column, Column, Column) = {
    val toks = tokens(text)
    val grams3 = Dedup.wordShingles(text, 3)
    val n = size(toks).cast("long")
    val meanLen = (length(text).cast("double") -
      (n.cast("double") - lit(1.0))) / n.cast("double")
    val uniqueRatio =
      size(array_distinct(toks)).cast("double") / n.cast("double")
    val dup3 = coalesce(
      lit(1.0) - size(array_distinct(grams3)).cast("double") /
        nullif(size(grams3).cast("double"), lit(0.0)), lit(0.0))
    (n, meanLen, uniqueRatio, dup3)
  }

  /** The [[qualityRules]] keep decision as ONE composable boolean column,
    * for pipelines that gate inside a wider projection (one text scan
    * instead of a rules frame + semi join).
    */
  def passesQuality(text: Column, minTokens: Int = 30,
      maxTokens: Int = 10000, minUniqueRatio: Double = 0.3,
      maxDup3gramRatio: Double = 0.2): Column = {
    val (n, meanLen, uniqueRatio, dup3) = qualityMetrics(text)
    n >= minTokens && n <= maxTokens &&
      meanLen >= 2.0 && meanLen <= 10.0 &&
      uniqueRatio >= minUniqueRatio && dup3 <= maxDup3gramRatio
  }

  def qualityRules(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minTokens: Int = 30, maxTokens: Int = 10000,
      minUniqueRatio: Double = 0.3, maxDup3gramRatio: Double = 0.2)
      : DataFrame = {
    val (n, meanLen, uniqueRatio, dup3) = qualityMetrics(col(textCol))
    df.select(col(idCol), n.as("n_tokens"),
        meanLen.as("mean_token_len"), uniqueRatio.as("unique_ratio"),
        dup3.as("dup_3gram_ratio"))
      .withColumn("len_ok",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("mean_len_ok",
        col("mean_token_len") >= 2.0 && col("mean_token_len") <= 10.0)
      .withColumn("unique_ok", col("unique_ratio") >= minUniqueRatio)
      .withColumn("rep_ok", col("dup_3gram_ratio") <= maxDup3gramRatio)
      .withColumn("passes",
        col("len_ok") && col("mean_len_ok") && col("unique_ok") &&
          col("rep_ok"))
  }

  /** `mean_token_len` above exploits the single-space tokenization the
    * whole Text module assumes: total token chars = len(text) − (n−1)
    * separators — one length() instead of a per-token fold.
    */

  // -------------------------------------------------------- PII redaction

  /** Redaction patterns: common-subset regex (no lookaround, no \b) that
    * Java's engine and DuckDB's RE2 compile identically. Order matters —
    * emails are masked before digit runs so the digits inside an already
    * masked email can't double-fire.
    */
  val redactionPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "https?://[^ ]+" -> "<URL>",
    "[0-9][0-9 ()+.-]{6,}[0-9]" -> "<PHONE>",
    "[0-9][0-9][0-9][0-9]+" -> "<NUM>")

  /** PII scrub — the privacy pass a web corpus takes before training:
    * masks emails, URLs, phone-shaped digit runs and long numbers with
    * typed placeholder tokens (typed masks preserve more signal than
    * deletion and make redaction rates auditable by counting them).
    * Chained `regexp_replace` — per-row, codegen'd, zero shuffle; at
    * 100 TB this rides the same single scan as the rest of the cleanup
    * projection.
    */
  def redact(text: Column): Column =
    redactionPatterns.foldLeft(text) { case (c, (pat, mask)) =>
      regexp_replace(c, pat, mask)
    }

  /** DuckDB twin of [[redact]] (global flag — Spark replaces all
    * occurrences by default, DuckDB only the first without 'g'; DuckDB
    * single-quoted literals pass backslashes through verbatim, so the
    * Scala pattern string is already the right literal body).
    */
  def redactSql(e: String): String =
    redactionPatterns.foldLeft(e) { case (s, (pat, mask)) =>
      s"regexp_replace($s, '${pat.replace("'", "''")}', '$mask', 'g')"
    }

  /** Vocabulary-coverage quality stats (CCNet-style corpus-frequency
    * scoring, integer-exact): build the corpus's top-`topK` vocabulary
    * (by token count, ties by token), then report per doc how many of its
    * token OCCURRENCES are in-vocabulary and the out-of-vocabulary ratio.
    * A high OOV ratio marks boilerplate/garbage/wrong-language docs the
    * way LM-perplexity filters do, without a float model.
    *
    * Scale shape: the vocab aggregate is map-side combined (bytes ∝
    * distinct tokens, Zipf-bounded) and the result is `topK`-bounded by
    * construction before the one driver collect (same driver-small
    * pattern as IVF centroids). Scoring is then a zero-shuffle per-row
    * filter against the vocabulary literal inside whole-stage codegen —
    * corpus text never shuffles. The literal linear scan is right for
    * topK ≲ 10⁴; past that, swap the membership test for a bloom-filter
    * expression or a broadcast join + per-doc re-aggregate.
    */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val vocab: Seq[String] = df
      .select(explode(tokens(col(textCol))).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tk").asc)
      .limit(topK)
      .collect().map(_.getString(0)).toSeq
    val vlit = typedLit(vocab)
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    val inv = size(filter(toks, t => array_contains(vlit, t))).cast("long")
    df.select(col(idCol), n.as("n_tokens"), inv.as("n_invocab"),
      (lit(1.0) - inv.cast("double") / n.cast("double")).as("oov_ratio"))
  }

  /** Gopher-style top-n-gram concentration: per document, the single
    * most frequent word n-gram and the fraction of all n-gram
    * occurrences it accounts for. A high fraction marks the "same
    * phrase looped forever" failure mode that per-row distinct ratios
    * ([[qualityRules]]' `dup_3gram_ratio`) under-report when the loop
    * body is long (many distinct grams, all from one phrase).
    *
    * Scale shape: this is NOT computable per-row in o(len²), so it takes
    * the token-shuffle shape — explode n-grams, two-level aggregate. Both
    * aggregates are hash aggregates with map-side partial combine, keyed
    * by (doc, gram) then doc: shuffle volume is bounded by distinct
    * grams per doc, and no reducer ever sees more than one document's
    * gram counts (no corpus-hot-key hazard — the key includes the doc).
    * The argmax is `min(struct(-cnt, gram))` — count desc, gram asc —
    * one aggregate, no per-doc window sort.
    *
    * Docs with fewer than `n` tokens have no n-grams: they surface with
    * `n_ngrams = 0`, `top_gram = ''`, `top_frac = 0.0` (kept visible —
    * a repetition gate must not silently pass fragments).
    */
  def topNgramStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 2): DataFrame = {
    val grams = df.select(col(idCol),
      explode(Dedup.wordShingles(col(textCol), n)).as("__gram"))
    val top = grams
      .groupBy(col(idCol), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__cnt")).as("nc"), col("__gram").as("g")))
          .as("__top"),
        sum("__cnt").as("__n"))
    df.select(col(idCol)).join(top, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_ngrams"),
        coalesce(col("__top.g"), lit("")).as("top_gram"),
        coalesce(-col("__top.nc"), lit(0L)).as("top_count"),
        coalesce((-col("__top.nc")).cast("double") /
          col("__n").cast("double"), lit(0.0)).as("top_frac"))
  }

  /** CCNet-style familiarity score — the integer-exact stand-in for an
    * LM-perplexity filter: build the corpus's top-`topK` unigram table,
    * then score each document by the mean corpus frequency of its
    * tokens (out-of-vocabulary tokens score 0). Documents land in the
    * `head` / `middle` / `tail` quality buckets by fixed thresholds on
    * that mean, mirroring CCNet's perplexity terciles: `head` = built
    * from the language's most common material, `tail` = rare/garbled.
    *
    * Everything is integer until the single final division, so scores
    * hash-match across engines (no log(): libm last-ulp drift).
    *
    * Scale shape: the vocabulary aggregate is map-side combined and
    * `topK`-bounded before the one driver collect (same driver-small
    * pattern as IVF centroids / [[vocabCoverage]]); scoring is then a
    * zero-shuffle per-row fold against a literal map inside codegen —
    * corpus text never shuffles. `try_element_at`, not `element_at`:
    * OOV lookups must yield null, not an ANSI-mode error.
    */
  def familiarity(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", topK: Int = 16,
      headMin: Double = 550.0, tailMax: Double = 466.0): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(tailMax <= headMin,
      s"need tailMax <= headMin: $tailMax > $headMin")
    val vocab: Seq[(String, Long)] = df
      .select(explode(tokens(col(textCol))).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tk").asc)
      .limit(topK)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val vmap = typedLit(vocab.toMap)
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    val mass = aggregate(toks, lit(0L),
      (acc, t) => acc + coalesce(try_element_at(vmap, t), lit(0L)))
    val nOov = size(filter(toks,
      t => try_element_at(vmap, t).isNull)).cast("long")
    val mean = mass.cast("double") / n.cast("double")
    df.select(col(idCol), n.as("n_tokens"), mass.as("familiarity_mass"),
      nOov.as("n_oov"), mean.as("mean_familiarity"),
      when(mean >= headMin, lit("head"))
        .when(mean < tailMax, lit("tail"))
        .otherwise(lit("middle")).as("bucket"))
  }

  /** Capped inverted index — token → posting list, the support
    * structure for corpus search, targeted decontamination ("which docs
    * contain this eval question's tokens?") and cheap candidate lookup.
    * Per token: document frequency, total occurrences, and the first
    * `maxPostings` doc ids ascending.
    *
    * Scale shape: tokens explode per-row; the (token, doc) aggregate is
    * map-side combined; the per-token rollup runs document frequency and
    * occurrence mass as plain sums and the posting list through the
    * k-bounded [[graft.functions.TopK.topKByScore]] heap (score =
    * −doc_id ⇒ smallest ids win) — so a stopword's hundred million
    * postings NEVER cross the shuffle as a list: map-side heaps of
    * ≤ `maxPostings` entries do. The deliberate cap is the honest
    * contract — a full posting list per stopword is exactly the
    * unbounded `collect_list` hazard this library bans; a real search
    * index shards postings by (token, docRange) instead, which is the
    * same bounded-per-group shape.
    */
  def invertedIndex(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxPostings: Int = 8): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive: $maxPostings")
    require(idCol != "token",
      "invertedIndex derives a `token` column; idCol must not be `token`")
    val perDoc = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("__tf"))
    perDoc.groupBy("token")
      .agg(count(lit(1)).as("n_docs"),
        sum("__tf").as("n_occurrences"),
        graft.functions.TopK.topKByScore(
          -col(idCol).cast("double"), col(idCol), maxPostings).as("__top"))
      .select(col("token"), col("n_docs"), col("n_occurrences"),
        col("__top.item").as("postings"))
  }

  /** DuckDB twin of [[fingerprint]] (normalize + rolling hash), for
    * oracles that replay fingerprint-keyed admission (q22/q70).
    */
  def fingerprintSql(e: String): String = {
    val norm = "array_to_string(list_sort(list_filter(" +
      s"string_split_regex(regexp_replace(lower($e), '$punctClass', '', 'g'), ' +'), " +
      "x -> x <> '')), ' ')"
    graft.functions.PortableHash.polyHashSql(norm)
  }

  // ---------------------------------------------- BPE pair statistics

  /** The inner loop of BPE tokenizer training (Sennrich et al. 2016,
    * arXiv:1508.07909): count every adjacent character pair across the
    * corpus vocabulary, weighted by word frequency — the top pair is the
    * next merge a tokenizer trainer would apply. One step is emitted
    * (the iterated re-tokenize is driver-orchestrated at training time);
    * this is the pass that dominates cost at corpus scale because it is
    * the one that scans all text.
    *
    * Scale shape (100 TB): tokens collapse to the vocabulary FIRST
    * (Zipf-bounded key space, map-side combined), so pair extraction
    * runs over distinct words × their counts — orders of magnitude
    * smaller than the corpus. Pair aggregation has at most |alphabet|²
    * keys; the global top-K is a `TakeOrdered` (no full sort), and the
    * `row_number` ranking window runs on ≤ K rows.
    */
  def bpePairStats(df: DataFrame, textCol: String = "text",
      topK: Int = 32): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val vocab = df.select(explode(tokens(col(textCol))).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__wcnt"))
    val ranked = vocab
      .select(explode(Dedup.charShingles(col("__w"), 2)).as("pair"),
        col("__wcnt"))
      .groupBy("pair").agg(sum("__wcnt").as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(topK)
    ranked.select(
      row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair")))
        .cast("long").as("rank"),
      col("pair"), col("cnt"))
  }

  /** DuckDB twin of [[bpePairStats]] (same vocabulary weighting, same
    * `(count DESC, pair)` tie-break).
    */
  def bpePairStatsSql(table: String, textE: String, topK: Int): String =
    s"""WITH __tok AS MATERIALIZED (
       |  SELECT unnest(string_split($textE, ' ')) AS w FROM $table),
       |__vocab AS MATERIALIZED (
       |  SELECT w, count(*) AS wcnt FROM __tok WHERE w <> '' GROUP BY w),
       |__idx AS (SELECT w, wcnt,
       |  unnest(generate_series(1, len(w) - 1)) AS i FROM __vocab),
       |__pairs AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, wcnt
       |  FROM __idx),
       |__agg AS (SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt
       |  FROM __pairs GROUP BY pair)
       |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT)
       |    AS rank,
       |  pair, cnt
       |FROM __agg ORDER BY cnt DESC, pair LIMIT $topK""".stripMargin

  // ---------------------------------------------------- vocabulary drift

  /** Distribution-shift monitor between two corpus snapshots: the
    * tokens whose relative frequency moved most from A to B — the check
    * a continuously-ingesting pipeline runs per batch window to catch a
    * source going off the rails (spam burst, language flip, template
    * leak) before the data trains anything.
    *
    * Ranking is EXACT integer arithmetic: the rate difference
    * `cnt_a/total_a − cnt_b/total_b` has the same sign and order as the
    * cross product `cnt_a·total_b − cnt_b·total_a` — so the top-K is
    * bit-stable across engines with no float rate anywhere near the
    * sort. The cross product runs in DECIMAL(38,0) (DuckDB: HUGEINT):
    * the worst case `total_a·total_b` for two full-BIGINT totals is
    * ~8.5·10³⁷, inside both domains — so the ranking is exact for ANY
    * corpus size a BIGINT token count can describe. Only the final
    * `drift_x` narrows back to BIGINT for the output column, and both
    * engines fail loudly (not wrap) in the astronomically-unlikely case
    * that the winning difference itself exceeds BIGINT.
    *
    * Scale shape: each snapshot collapses to its Zipf-bounded
    * vocabulary (map-side combined) before anything joins; the joined
    * vocab is materialized once (`localCheckpoint`, the dupComponents
    * boundary pattern) so the totals derive from it rather than
    * re-scanning the corpus; the full outer join is vocab×vocab on the
    * token; totals broadcast in-plan (no driver collect); top-K is a
    * TakeOrdered, no global sort.
    */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String = "text",
      topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    def counts(df: DataFrame) =
      df.select(explode(tokens(col(textCol))).as("token"))
        .where(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
    // materialize the joined vocab ONCE: totals and ranking both read
    // it, and without the boundary each corpus would be scanned twice
    val joined = counts(a).withColumnRenamed("cnt", "cnt_a")
      .join(counts(b).withColumnRenamed("cnt", "cnt_b"),
        Seq("token"), "full")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .localCheckpoint(true)
    val totals = joined.agg(sum("cnt_a").as("total_a"),
      sum("cnt_b").as("total_b"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    joined.crossJoin(broadcast(totals))
      .withColumn("__drift",
        dec(col("cnt_a")) * dec(col("total_b"))
          - dec(col("cnt_b")) * dec(col("total_a")))
      .orderBy(abs(col("__drift")).desc, col("token"))
      .limit(topK)
      .select(col("token"), col("cnt_a"), col("cnt_b"),
        col("__drift").cast("long").as("drift_x"))
  }

  /** DuckDB twin of [[vocabDrift]] over two table expressions. */
  def vocabDriftSql(tableA: String, tableB: String, textE: String,
      topK: Int): String =
    s"""WITH __ca AS MATERIALIZED (
       |  SELECT tk AS token, count(*) AS cnt FROM (
       |    SELECT unnest(string_split($textE, ' ')) AS tk FROM $tableA)
       |  WHERE tk <> '' GROUP BY tk),
       |__cb AS MATERIALIZED (
       |  SELECT tk AS token, count(*) AS cnt FROM (
       |    SELECT unnest(string_split($textE, ' ')) AS tk FROM $tableB)
       |  WHERE tk <> '' GROUP BY tk),
       |__j AS (SELECT coalesce(a.token, b.token) AS token,
       |    CAST(coalesce(a.cnt, 0) AS BIGINT) AS cnt_a,
       |    CAST(coalesce(b.cnt, 0) AS BIGINT) AS cnt_b
       |  FROM __ca a FULL OUTER JOIN __cb b ON a.token = b.token)
       |SELECT token, cnt_a, cnt_b,
       |  CAST(CAST(cnt_a AS HUGEINT)
       |      * coalesce((SELECT sum(cnt) FROM __cb), 0)
       |    - CAST(cnt_b AS HUGEINT)
       |      * coalesce((SELECT sum(cnt) FROM __ca), 0)
       |    AS BIGINT) AS drift_x
       |FROM __j
       |ORDER BY abs(CAST(cnt_a AS HUGEINT)
       |    * coalesce((SELECT sum(cnt) FROM __cb), 0)
       |  - CAST(cnt_b AS HUGEINT)
       |    * coalesce((SELECT sum(cnt) FROM __ca), 0))
       |  DESC, token
       |LIMIT $topK""".stripMargin

  // --------------------------------------------------------- collocations

  /** PMI collocation mining: the top-K adjacent word pairs that co-occur
    * far more than their unigram frequencies predict — the classic
    * multiword-expression extractor ("new york", "machine learning") a
    * tokenizer-vocabulary or phrase-normalization stage runs over a
    * corpus. Pairs are ranked by LIFT `c_xy·N / (c_x·c_y)` (N = total
    * token occurrences) — the monotone inside of PMI = log₂(lift) — so
    * no engine-specific `log` implementation sits anywhere near the
    * ranking OR the output (Math.log and libm log may differ in the last
    * ulp; a reader wanting PMI takes log₂ of the emitted lift).
    *
    * Cross-engine exactness: every count is exact BIGINT; lift is the
    * FIXED op sequence `(c_xy / c_x) · (N / c_y)` — each step one
    * correctly-rounded IEEE double op on exactly-representable inputs
    * (counts < 2⁵³), so both engines produce bit-identical doubles and
    * an identical sort; ties break on the pair string. (A single-fraction
    * `c_xy·N/(c_x·c_y)` would need 128-bit products at corpus scale —
    * the two-step form never leaves the double domain.)
    *
    * `minCount` floors the pair count: a hapax pair's lift is huge and
    * meaningless (classic PMI pathology), and the floor also bounds the
    * candidate set long before the sort.
    *
    * Scale shape (100 TB): unigram and bigram counts are Zipf-bounded
    * map-side-combined aggregates; the two enrichment joins are
    * vocab×vocab equi-joins (never corpus-sized); N rides in-plan as a
    * broadcast 1-row cross join (no driver collect); top-K is a
    * TakeOrdered over the minCount-floored survivors, not a global sort.
    */
  def collocations(df: DataFrame, textCol: String = "text", topK: Int = 20,
      minCount: Long = 5L): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(minCount > 0, s"minCount must be positive: $minCount")
    val uni = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = uni.agg(sum("cnt").as("__n"))
    val pairs = df.select(
        explode(graft.ext.Dedup.wordShingles(col(textCol), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val lift = (col("pair_count").cast("double") /
        col("left_count").cast("double")) *
      (col("__n").cast("double") / col("right_count").cast("double"))
    pairs
      .withColumn("__x", substring_index(col("gram"), " ", 1))
      .withColumn("__y", substring_index(col("gram"), " ", -1))
      .join(uni.select(col("token").as("__x"),
        col("cnt").as("left_count")), Seq("__x"))
      .join(uni.select(col("token").as("__y"),
        col("cnt").as("right_count")), Seq("__y"))
      .crossJoin(broadcast(total))
      .select(col("gram"), col("pair_count"), col("left_count"),
        col("right_count"), lift.as("lift"))
      .orderBy(col("lift").desc, col("gram"))
      .limit(topK)
  }

  /** DuckDB twin of [[collocations]] (same counts, same two-step IEEE
    * lift sequence, same `lift DESC, gram` tie-break).
    */
  def collocationsSql(table: String, textE: String, topK: Int,
      minCount: Long): String = {
    val lift = "(CAST(pair_count AS DOUBLE) / CAST(left_count AS DOUBLE))" +
      " * (CAST(n AS DOUBLE) / CAST(right_count AS DOUBLE))"
    s"""WITH __uni AS MATERIALIZED (
       |  SELECT tk AS token, count(*) AS cnt FROM (
       |    SELECT unnest(string_split($textE, ' ')) AS tk FROM $table)
       |  GROUP BY tk),
       |__tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM __uni),
       |__p AS (
       |  SELECT gram, count(*) AS pair_count FROM (
       |    SELECT unnest(${graft.ext.Dedup.wordShinglesSql(textE, 2)})
       |      AS gram FROM $table)
       |  GROUP BY gram HAVING count(*) >= $minCount),
       |__j AS (
       |  SELECT p.gram, CAST(p.pair_count AS BIGINT) AS pair_count,
       |    CAST(lx.cnt AS BIGINT) AS left_count,
       |    CAST(ry.cnt AS BIGINT) AS right_count, t.n
       |  FROM __p p
       |  JOIN __uni lx ON lx.token = string_split(p.gram, ' ')[1]
       |  JOIN __uni ry ON ry.token = string_split(p.gram, ' ')[-1]
       |  CROSS JOIN __tot t)
       |SELECT gram, pair_count, left_count, right_count,
       |  $lift AS lift
       |FROM __j
       |ORDER BY $lift DESC, gram
       |LIMIT $topK""".stripMargin
  }

  // ------------------------------------------------------ source overlap

  /** Cross-source vocabulary overlap matrix — the mixture-design
    * diagnostic: for every pair of sources, the Jaccard overlap of
    * their token vocabularies. Near-identical vocabularies flag
    * mirrored/scraped-twice sources worth merging before weighting;
    * near-disjoint ones flag domains a temperature mix should protect.
    *
    * Exactness: set sizes are exact BIGINTs; Jaccard is one double
    * division of exact values — bit-identical across engines.
    *
    * Scale shape (100 TB): the corpus collapses to the DISTINCT
    * (source, token) vocabulary first — map-side combined, Zipf-bounded
    * per source; the pair intersection is an equi-join ON TOKEN between
    * vocab tables (never corpus-sized, never a cross join of sources);
    * per-source sizes broadcast back onto the |sources|² result. Output
    * is |sources|·(|sources|−1)/2 rows — tiny at any corpus scale.
    */
  def sourceOverlap(df: DataFrame, keyCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val vocab = df.select(col(keyCol).as("__src"),
        explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .distinct()
    val sizes = vocab.groupBy("__src").agg(count(lit(1)).as("__vsz"))
    val inter = vocab.as("a")
      .join(vocab.as("b"),
        col("a.token") === col("b.token") &&
          col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("src_a"), col("b.__src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("__src").as("src_a"),
        col("__vsz").as("vocab_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("__src").as("src_b"),
        col("__vsz").as("vocab_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("vocab_a"), col("vocab_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("vocab_a") + col("vocab_b") - col("n_common"))
            .cast("double")).as("jaccard"))
  }

  /** DuckDB twin of [[sourceOverlap]] (same vocab collapse, same
    * division).
    */
  def sourceOverlapSql(table: String, keyE: String,
      textE: String): String =
    s"""WITH __v AS MATERIALIZED (
       |  SELECT DISTINCT $keyE AS src, tk AS token FROM (
       |    SELECT $keyE, unnest(string_split($textE, ' ')) AS tk
       |    FROM $table)
       |  WHERE tk <> ''),
       |__sz AS (SELECT src, count(*) AS vsz FROM __v GROUP BY src),
       |__i AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
       |  FROM __v a JOIN __v b ON a.token = b.token AND a.src < b.src
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b,
       |  CAST(sa.vsz AS BIGINT) AS vocab_a,
       |  CAST(sb.vsz AS BIGINT) AS vocab_b,
       |  CAST(n_common AS BIGINT) AS n_common,
       |  CAST(n_common AS DOUBLE)
       |    / CAST(sa.vsz + sb.vsz - n_common AS DOUBLE) AS jaccard
       |FROM __i
       |JOIN __sz sa ON sa.src = src_a
       |JOIN __sz sb ON sb.src = src_b""".stripMargin

  // ---------------------------------------------------------- repetition

  /** Within-document repetition signal — the Gopher/MassiveText "repetition
    * filter" family (Rae et al. 2021 §A1.1): the fraction of a document's
    * token n-grams that are repeats of an earlier n-gram in the SAME
    * document. Boilerplate, keyword-stuffed spam and generation loops
    * score high; natural prose scores near zero. Emitted per doc for
    * bigrams and trigrams plus a keep/drop verdict against the caller's
    * thresholds.
    *
    * Repeats are counted on the portable n-gram hashes
    * ([[graft.ext.Dedup.shingleHashes]], one codegen'd pass per row, no
    * shingle string materialized). A hash collision can only merge two
    * distinct n-grams — identically in both engines, so the oracle still
    * hash-matches; at P ≈ 2³⁰ the within-doc collision odds are
    * negligible. The fractions are a single double division from two
    * exact BIGINTs — bit-identical across engines.
    *
    * Scale shape: zero shuffle — per-row expressions only, columns
    * pruned to (id, text). The 100 TB plan is scan → project, nothing
    * else; this filter composes in front of any dedup stage for free.
    */
  def repetition(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dupBigramMax: Double = 0.30,
      dupTrigramMax: Double = 0.20): DataFrame = {
    def stats(n: Int): (Column, Column, Column) = {
      val h = graft.ext.Dedup.shingleHashes(col(textCol), n)
      val total = size(h).cast("long")
      val dup = (size(h) - size(array_distinct(h))).cast("long")
      val frac = when(total === 0L, lit(0.0))
        .otherwise(dup.cast("double") / total.cast("double"))
      (total, dup, frac)
    }
    val (b, bDup, bFrac) = stats(2)
    val (t, tDup, tFrac) = stats(3)
    df.select(col(idCol),
      b.as("n_bigrams"), bDup.as("n_dup_bigrams"),
      bFrac.as("dup_bigram_frac"),
      t.as("n_trigrams"), tDup.as("n_dup_trigrams"),
      tFrac.as("dup_trigram_frac"),
      (bFrac <= dupBigramMax && tFrac <= dupTrigramMax).as("keep"))
  }

  /** DuckDB twin of [[repetition]] over a table. */
  def repetitionSql(table: String, idE: String, textE: String,
      dupBigramMax: Double, dupTrigramMax: Double): String = {
    def frac(h: String) =
      s"CASE WHEN len($h) = 0 THEN 0.0 ELSE " +
        s"CAST(len($h) - len(list_distinct($h)) AS DOUBLE) / " +
        s"CAST(len($h) AS DOUBLE) END"
    s"""WITH __h AS (
       |  SELECT $idE,
       |    ${graft.ext.Dedup.shingleHashesSql(textE, 2)} AS h2,
       |    ${graft.ext.Dedup.shingleHashesSql(textE, 3)} AS h3
       |  FROM $table)
       |SELECT $idE,
       |  CAST(len(h2) AS BIGINT) AS n_bigrams,
       |  CAST(len(h2) - len(list_distinct(h2)) AS BIGINT) AS n_dup_bigrams,
       |  ${frac("h2")} AS dup_bigram_frac,
       |  CAST(len(h3) AS BIGINT) AS n_trigrams,
       |  CAST(len(h3) - len(list_distinct(h3)) AS BIGINT) AS n_dup_trigrams,
       |  ${frac("h3")} AS dup_trigram_frac,
       |  ${frac("h2")} <= $dupBigramMax AND ${frac("h3")} <= $dupTrigramMax
       |    AS keep
       |FROM __h""".stripMargin
  }

  // ------------------------------------- hashed linear classifier

  /** Hashing-trick linear-classifier inference (Weinberger et al. 2009,
    * "Feature Hashing for Large Scale Multitask Learning"; the
    * fastText-style quality/safety classifier scoring pass every modern
    * corpus pipeline runs, arXiv:1607.01759): each token maps to one of
    * `dim` feature buckets by portable hash, and the document's score
    * is the sum of its tokens' bucket weights — a sparse dot product
    * with the weight vector, computed without ever materializing the
    * feature vector.
    *
    * The weights here are a deterministic affine fixture over the
    * bucket index, `w(j) = ((j·40503 + 17) mod P) mod 1001 − 500`
    * ∈ [−500, 500] — standing in for trained parameters so the score is
    * exact BIGINT arithmetic both engines reproduce bit-for-bit. In
    * production the weight array is a broadcast float vector indexed by
    * the same bucket id; the plan shape — zero shuffle, one codegen'd
    * fold per row, columns pruned to (id, text) — is identical, which
    * is the point: classifier inference at 100 TB is a scan, not a
    * join.
    */
  def classifierScore(text: Column, dim: Int = 1024): Column = {
    require(dim > 0, s"dim must be positive: $dim")
    // polyHash ∈ [0, P): plain % stays non-negative, no pmod needed
    aggregate(tokens(text), lit(0L), (acc, tk) =>
      acc + ((PortableHash.polyHash(tk) % dim * 40503L + 17L)
        % PortableHash.P % 1001L - 500L))
  }

  /** DuckDB twin of [[classifierScore]]. */
  def classifierScoreSql(textE: String, dim: Int = 1024): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($textE, ' '), tk -> " +
      s"((${PortableHash.polyHashSql("tk")}) % $dim * 40503 + 17) " +
      s"% ${PortableHash.P} % 1001 - 500)), (acc, w) -> acc + w)"

  // ------------------------------------------------ BPE tokenizer apply

  /** BPE tokenizer inference — the apply half of [[bpePairStats]]'s
    * training loop (Sennrich et al. 2016): encode each document with a
    * trained merge list, per-word, one greedy left-to-right pass per
    * rule. Returns the U+001F-joined-symbols / space-joined-words encoding
    * (see [[graft.functions.NativeString.bpeEncodeRaw]]). Token-budget
    * planning, fertility monitoring and length-aware packing all need
    * REAL tokenizer counts, not whitespace counts — this runs them
    * in-engine.
    *
    * Scale shape: one native codegen'd expression per row — zero
    * shuffle, columns pruned to (id, text); the merge table ships once
    * per task as a plan constant, never per row. Cost is
    * O(len · |merges|) per row; a production vocabulary (~30k merges)
    * would switch the inner loop to the heap-based pair-priority encoder
    * behind the same expression contract — the plan shape is already
    * right.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.NativeString.bpeEncode(text, merges)

  /** DuckDB twin of [[bpeEncode]]: the same greedy pass per rule,
    * expressed as a left fold over the U+001F-joined symbol string (the
    * accumulator-tail re-check is the same function as the pair scan —
    * within one rule, a merged symbol can never re-merge with the same
    * rule, since `a+b ≠ a` for non-empty `b`).
    */
  def bpeEncodeSql(textE: String, merges: Seq[(String, String)]): String = {
    // chr(31) = U+001F, the same unit-separator char the native
    // expression joins symbols with (see NativeString.bpeEncodeRaw)
    var e = "array_to_string(string_split_regex(w, ''), chr(31))"
    merges.zipWithIndex.foreach { case ((a, b), lvl) =>
      require(!(a + b).exists(c => c == '\u001F' || c == ' ' || c == '\''),
        s"bpeEncodeSql: merge symbols must be plain tokens: ($a, $b)")
      // DuckDB right/left/len count CODE POINTS — so must the inlined
      // symbol length, or a non-BMP merge symbol (one code point, two
      // JVM chars) would make the tail test unmatchable in SQL while
      // the JVM encoder applies the rule
      val aLen = a.codePointCount(0, a.length)
      // level-unique lambda names: the per-rule folds nest lexically
      val (ac, sy) = (s"a$lvl", s"s$lvl")
      e = s"substr(list_reduce(list_prepend('', string_split($e, chr(31))), " +
        s"($ac, $sy) -> CASE WHEN right($ac, ${aLen + 1}) = chr(31) || '$a' " +
        s"AND $sy = '$b' THEN left($ac, len($ac) - ${aLen + 1}) " +
        s"|| chr(31) || '$a$b' ELSE $ac || chr(31) || $sy END), 2)"
    }
    // coalesce: DuckDB's array_to_string of an empty list is NULL; the
    // JVM encoder returns '' for an all-empty-words doc
    s"coalesce(array_to_string(list_transform(list_filter(" +
      s"string_split($textE, ' '), w -> w <> ''), w -> $e), ' '), '')"
  }

  // ------------------------------------------------ BPE tokenizer TRAIN

  /** BPE tokenizer TRAINING — the learning loop itself (Sennrich et al.
    * 2016 alg. 1), completing the BPE story: [[bpePairStats]] counts
    * once, [[bpeEncode]] applies a given merge list; this LEARNS the
    * list. Iteration t: segment every vocabulary word with the t−1
    * merges learned so far, count adjacent symbol pairs weighted by
    * word frequency, and adopt the argmax (`count DESC, lhs, rhs`
    * tie-break — deterministic cross-engine on binary string order) as
    * merge t. Returns the learned merge table
    * `(rank, lhs, rhs, merged, cnt)`.
    *
    * Scale shape (100 TB): the corpus collapses ONCE to its
    * Zipf-bounded word vocabulary `(word, count)` — the only
    * corpus-sized pass — and is `localCheckpoint`ed flat (the
    * dupComponents boundary pattern) so each training iteration rescans
    * a small materialized table, not the corpus or a growing plan. Per
    * iteration the heavy step is a map-side-combined pair count over
    * the vocab (pair space ≪ vocab); the argmax is `orderBy.limit(1)` —
    * TakeOrdered, per-partition bounded heaps, ONE row to the driver.
    * Driver state is the merge list (the model being learned — the same
    * driver/executor split as the k-means IVF trainer, Similarity
    * q38). Re-segmentation recomputes from scratch with the full list
    * (O(t) greedy passes/word) rather than holding mutable executor
    * state: at production vocab sizes the incremental-pair-delta
    * trainer would slot behind the same loop, but the plan shape —
    * vocab-local work, one tiny collect per rule — is already the
    * industrial one.
    *
    * Vocabulary is restricted to `^[A-Za-z0-9]+$` words: `;` and space
    * are the encoding's reserved separators and `'` would need SQL
    * escaping; the filter is applied identically in [[bpeTrainSql]] so
    * the restriction is part of the contract, not a divergence.
    */
  def bpeTrain(df: DataFrame, nMerges: Int,
      textCol: String = "text"): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val spark = df.sparkSession
    import org.apache.spark.sql.types._
    val v0 = df.select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "" && col("w").rlike("^[A-Za-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .localCheckpoint(true)
    // flat-stats rebuild (SPARK-39748, the dupComponents pattern): the
    // loop below scans this table nMerges times
    val vocab = spark.createDataFrame(v0.rdd, v0.schema)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val learned = scala.collection.mutable.ArrayBuffer.empty[
      (Long, String, String, String, Long)]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val seg = graft.functions.NativeString.bpeEncode(
        col("w"), merges.toSeq)
      val top = vocab
        .select(col("wcnt"), split(seg, "\u001F").as("s"))
        .select(col("wcnt"),
          explode(arrays_zip(
            slice(col("s"), lit(1), size(col("s")) - 1).as("l"),
            slice(col("s"), lit(2), size(col("s")) - 1).as("r"))).as("p"))
        .select(col("p.l").as("lhs"), col("p.r").as("rhs"), col("wcnt"))
        .groupBy("lhs", "rhs").agg(sum("wcnt").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (a, b) = (r.getString(0), r.getString(1))
        merges += ((a, b))
        learned += ((merges.length.toLong, a, b, a + b, r.getLong(2)))
      }
    }
    val rows = learned.map { case (rk, a, b, m, c) =>
      org.apache.spark.sql.Row(rk, a, b, m, c) }
    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** DuckDB twin of [[bpeTrain]]: the training loop unrolled as CTE
    * triples — `__pN` (pair counts on the previous segmentation),
    * `__mN` (argmax, same `cnt DESC, lhs, rhs` tie-break), `__sN`
    * (re-segment by applying merge N once, the [[bpeEncodeSql]]
    * accumulator-tail fold with the rule's symbols cross-joined in from
    * `__mN` instead of inlined as literals — lengths via `len(m.a)`
    * since the symbols aren't known until the query runs). Incremental
    * re-segmentation (apply rule N to segmentation N−1) equals the
    * Spark side's from-scratch recompute because [[bpeEncodeRaw]] is
    * itself sequential per-rule passes.
    */
  def bpeTrainSql(table: String, textE: String, nMerges: Int): String = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val sb = new StringBuilder
    sb ++= s"""WITH __v0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(string_split($textE, ' ')) AS w FROM $table)
       |  WHERE w <> '' AND regexp_matches(w, '^[A-Za-z0-9]+$$')
       |  GROUP BY w),
       |__s0 AS (SELECT w, wcnt,
       |  array_to_string(string_split_regex(w, ''), chr(31)) AS seg
       |  FROM __v0)""".stripMargin
    for (i <- 1 to nMerges) {
      val (ac, sy) = (s"a$i", s"s$i")
      sb ++= s""",
       |__p$i AS (SELECT l[i] AS lhs, l[i+1] AS rhs,
       |    CAST(sum(wcnt) AS BIGINT) AS cnt
       |  FROM (SELECT string_split(seg, chr(31)) AS l, wcnt,
       |      unnest(generate_series(1, len(string_split(seg, chr(31))) - 1))
       |        AS i
       |    FROM __s${i - 1}) GROUP BY 1, 2),
       |__m$i AS MATERIALIZED (SELECT lhs, rhs, cnt FROM __p$i
       |  ORDER BY cnt DESC, lhs, rhs LIMIT 1)""".stripMargin
      if (i < nMerges) sb ++= s""",
       |__s$i AS MATERIALIZED (SELECT w, wcnt,
       |  substr(list_reduce(list_prepend('', string_split(seg, chr(31))),
       |    ($ac, $sy) -> CASE
       |      WHEN right($ac, 1 + len(m.lhs)) = chr(31) || m.lhs
       |        AND $sy = m.rhs
       |      THEN left($ac, len($ac) - 1 - len(m.lhs))
       |        || chr(31) || m.lhs || m.rhs
       |      ELSE $ac || chr(31) || $sy END), 2) AS seg
       |  FROM __s${i - 1}, __m$i m)""".stripMargin
    }
    val union = (1 to nMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, lhs, rhs," +
        s" lhs || rhs AS merged, cnt FROM __m$i")
      .mkString("\n", "\nUNION ALL\n", "")
    sb ++= s"\nSELECT * FROM ($union)\nORDER BY rank"
    sb.toString
  }

  // --------------------------------------------- BM25 ranked retrieval

  /** BM25 top-k ranked retrieval (Robertson & Spärck Jones probabilistic
    * relevance framework; the decontamination / curation lookup that
    * asks "which training docs look most like this benchmark prompt").
    * Log-free variant: the classic `ln((N − df + 0.5)/(df + 0.5))` IDF
    * is replaced by its argument — a strictly monotone transform, so
    * per-term ranking is preserved while every arithmetic op stays an
    * individually-rounded IEEE double that DuckDB reproduces bit-exactly
    * (`ln` is correctly-rounded in neither engine, so the classic form
    * could not be oracle-gated).
    *
    * Per term t: `score_t = idf_t · (tf·(k1+1)) / (tf + k1·(1−b+b·dl/avgdl))`
    * summed over `terms` in the given (literal) order — a fixed IEEE op
    * sequence, like [[collocations]].
    *
    * Scale shape (100 TB): the query terms are literals, so per-doc term
    * frequencies are zero-shuffle array folds on the existing token
    * split — the corpus is scanned ONCE, no inverted index, no explode,
    * no join on tokens. Corpus stats (N, Σdl, per-term df) are one tiny
    * always-broadcastable aggregate row. Top-k is `orderBy.limit` —
    * Spark plans TakeOrderedAndProject: per-partition bounded heaps, k
    * rows to the driver, never a global sort.
    */
  def bm25TopK(df: DataFrame, terms: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k must be positive: $k")
    val toks = tokens(col(textCol))
    val base = df.select(
      col(idCol) +: tokenCount(col(textCol)).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (tm, i) =>
          size(filter(toks, t => t === lit(tm))).cast("long").as(s"__tf$i")
        }: _*)
    val statsCols =
      sum(col("dl")).as("__sumdl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, lit(1L)).otherwise(lit(0L)))
            .as(s"__df$i"))
    val stats = base.agg(count(lit(1)).as("__n"), statsCols: _*)
    val scored = base.crossJoin(broadcast(stats))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val norm = lit(k1) * (lit(1.0) - lit(b) +
      lit(b) * col("dl").cast("double") / avgdl)
    val termScores = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val dfd = col(s"__df$i").cast("double")
      val idf = (col("__n").cast("double") - dfd + lit(0.5)) /
        (dfd + lit(0.5))
      idf * (tf * (lit(k1) + lit(1.0))) / (tf + norm)
    }
    scored
      .filter(terms.indices.map(i => col(s"__tf$i")).reduceLeft(_ + _) > 0)
      .select(col(idCol), col("dl"),
        termScores.reduceLeft(_ + _).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB twin of [[bm25TopK]] — the same op sequence, parenthesized
    * to force the identical IEEE evaluation order.
    */
  def bm25TopKSql(table: String, idE: String, textE: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val tfDefs = terms.zipWithIndex.map { case (tm, i) =>
      s"CAST(len(list_filter(string_split($textE, ' '), t -> t = '$tm')) " +
        s"AS BIGINT) AS tf$i"
    }.mkString(",\n    ")
    val dfDefs = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val norm = s"($k1 * ((1.0 - $b) + (($b * CAST(dl AS DOUBLE)) / " +
      "(CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))"
    val termScores = terms.indices.map { i =>
      val idf = s"((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / " +
        s"(CAST(df$i AS DOUBLE) + 0.5))"
      s"(($idf * (CAST(tf$i AS DOUBLE) * ($k1 + 1.0))) / " +
        s"(CAST(tf$i AS DOUBLE) + $norm))"
    }
    val score = termScores.reduceLeft((a, c) => s"($a + $c)")
    val anyTf = terms.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT $idE AS doc_id,
       |    CAST(len(string_split($textE, ' ')) AS BIGINT) AS dl,
       |    $tfDefs
       |  FROM $table),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(dl) AS BIGINT) AS sumdl, $dfDefs FROM base)
       |SELECT doc_id, dl, $score AS score
       |FROM base, st
       |WHERE $anyTf > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Whole-table convenience: the standard text-analysis projection. */
  def analyze(textCol: String = "text")(df: DataFrame): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("n_stopwords", stopwordCount(t))
      .withColumn("n_punct", punctCount(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
