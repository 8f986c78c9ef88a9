package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, cross-engine-stable hashing, shingling, language-ID
  * heuristics, quality scoring, fingerprinting. All built from codegen'd
  * built-ins (no UDFs) so they stay inside whole-stage codegen and scale to
  * a 100 TB documents table as pure map-side work.
  *
  * Hashes are derived from md5 (identical in Spark and DuckDB), not
  * xxhash64/murmur (engine-specific), so every operator here is
  * oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens of a (lowercased, trimmed) text column. */
  def tokens(text: Column): Column = {
    // Two deliberate edge rules, matched exactly by the oracle's toksSql:
    // (1) REGEX trim, not trim() — trim strips only spaces, so tab/newline
    // edges would leak an empty leading token out of split; (2) empty /
    // whitespace-only text tokenizes to [] — NOT the [""] split returns
    // for a zero-length input, which would make token_count report 1 on
    // an empty doc, deaden every size(toks)===0 guard downstream, and
    // hand chunking/minhash a phantom token. Null text stays null (the
    // when predicate is null -> otherwise -> split(null) -> null).
    val cleaned = regexp_replace(lower(text), "^\\s+|\\s+$", "")
    when(length(cleaned) === 0, array().cast("array<string>"))
      .otherwise(split(cleaned, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Stable 32-bit hash of any string column: first 8 hex chars of md5.
    * DuckDB equivalent: ('0x' || substr(md5(x), 1, 8))::UBIGINT. */
  def stableHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Token n-gram shingles: ["a b c", "b c d", ...]; empty when the doc has
    * fewer than n tokens. The token array is let-bound
    * ([[ColumnOps.bindOnce]]) so the regex split runs once per ROW —
    * inlining `tokens(text)` at every reference site would re-split the
    * text per shingle (and again per projection after CollapseProject). */
  def shingles(text: Column, n: Int): Column =
    ColumnOps.bindOnce(tokens(text)) { toks =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
    }

  /** Distinct shingle set (for Jaccard). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** MinHash signature: for each (a,b) pair, min over shingles of
    * (a*h(s)+b) mod p — the classic universal-hash family over the stable
    * 32-bit base hash. Returns ARRAY<LONG> of length numHashes. */
  val MinhashPrime = 4294967311L // smallest prime > 2^32
  def minhashParams(numHashes: Int): Seq[(Long, Long)] =
    (1 to numHashes).map(i => (2L * i + 1L, 7919L * i)) // odd a, deterministic b

  /** Stable hash of every shingle — compute ONCE and materialize as a
    * column before deriving signatures: md5 per shingle is the expensive
    * part and must not be re-evaluated per hash function. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingles(text, n), s => stableHash32(s))

  /** MinHash signature from a (materialized) shingle-hash array column.
    * The hash-family params live in a literal array, so the per-row work is
    * numHashes passes over an already-computed long array. */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column = {
    val params = typedLit(minhashParams(numHashes).map { case (a, b) => Array(a, b) }.toArray)
    transform(params, p =>
      array_min(transform(hashes, h => (h * p.getItem(0) + p.getItem(1)) % MinhashPrime)))
  }

  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    minhashFromHashes(shingleHashes(text, n), numHashes)

  /** LSH band keys from a (materialized) signature column: the band's slice
    * of the signature IS the bucket key. One definition shared by the batch
    * and streaming dedup paths — the key format must never diverge between
    * the index writer and the lookup side. */
  def sigBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))

  /** Jaccard similarity of two precomputed distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** SimHash over token hashes, `bits` wide: bit j of the fingerprint is 1
    * iff the sum over tokens of (2*bit_j(h(token))-1) is positive. */
  def simhash(text: Column, bits: Int): Column = {
    val toks = tokens(text)
    val th = transform(toks, t => stableHash32(t))
    val bitCols = (0 until bits).map { j =>
      val votes = aggregate(th, lit(0L),
        (acc, h) => acc + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L) * (1L << j)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** English-marker stopwords present in any corpus; the heuristic is the
    * ratio of marker tokens (n-gram profile stand-in, deterministic). */
  val EnMarkers = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordRatio(text: Column, markers: Seq[String] = EnMarkers): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isInCollection(markers))).cast("double")
        / size(toks).cast("double"))
  }

  /** Heuristic language ID: 'en' when the marker ratio clears the
    * threshold, else 'unk'. (Real n-gram profiles plug in the same shape.) */
  def langId(text: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(text) >= threshold, "en").otherwise("unk")

  /** Quality score in [0,1]: blend of length saturation, alpha ratio and
    * mean word length fitness — the shape of reference-style quality
    * filters for pretraining data. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val alphaChars = length(regexp_replace(lower(text), "[^a-z]", "")).cast("double")
    val lengthScore = least(nTok / 100.0, lit(1.0))
    val alphaRatio = when(nChar === 0.0, 0.0).otherwise(alphaChars / nChar)
    val meanWordLen = when(nTok === 0.0, 0.0).otherwise((nChar - (nTok - 1.0)) / nTok)
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    lengthScore * 0.4 + alphaRatio * 0.4 + wordLenScore * 0.2
  }

  // ---- Gopher-style quality rules (Rae et al. 2021 §A1.1, public) ------
  // The canonical repetition-free document filters: word-count bounds,
  // mean-word-length bounds, symbol-to-word ratio, alphabetic-word
  // fraction, bullet-line fraction, stopword floor. One tokenization per
  // row (let-bound) + one line split — map-only, stays inside
  // whole-stage codegen, every formula replayed verbatim by the DuckDB
  // oracle (integer counts divided as doubles: bit-identical both sides).

  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMinMeanWordLen = 3.0
  val GopherMaxMeanWordLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinAlphaWordFrac = 0.8
  val GopherMaxBulletLineFrac = 0.9
  val GopherMinStopwords = 2

  /** Tokens that are pure symbol runs (hash marks or ellipses) — the
    * Gopher symbol-to-word numerator. Anchored full-token match, RE2-safe. */
  val SymbolTokenPattern = "#+|\\.{3,}"

  /** All Gopher rule signals + the combined keep verdict as one struct:
    * (n_words, mean_word_len, alpha_word_frac, symbol_ratio,
    * bullet_line_frac, n_stopwords, keep). Ratios are reported rounded to
    * 6 places; `keep` is decided on the UNROUNDED values (both engines
    * compute the identical integer-count divisions, so the boundary cases
    * agree exactly). */
  def gopherStats(text: Column): Column =
    ColumnOps.bindOnce(tokens(text)) { toks =>
      val n = size(toks)
      val nD = n.cast("double")
      val meanLen = when(n === 0, 0.0).otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
          .cast("double") / nD)
      val alphaFrac = when(n === 0, 0.0).otherwise(
        size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nD)
      val symRatio = when(n === 0, 0.0).otherwise(
        size(filter(toks, t => t.rlike(s"^($SymbolTokenPattern)$$")))
          .cast("double") / nD)
      val nStop = size(filter(toks, t => t.isInCollection(EnMarkers)))
      val lines = split(text, "\n")
      val bulletFrac = when(size(lines) === 0, 0.0).otherwise(
        size(filter(lines, l =>
          startswith(ltrim(l), lit("- ")) || startswith(ltrim(l), lit("• "))))
          .cast("double") / size(lines).cast("double"))
      val keep = n.between(GopherMinWords, GopherMaxWords) &&
        meanLen.between(GopherMinMeanWordLen, GopherMaxMeanWordLen) &&
        symRatio <= GopherMaxSymbolRatio &&
        alphaFrac >= GopherMinAlphaWordFrac &&
        bulletFrac <= GopherMaxBulletLineFrac &&
        nStop >= GopherMinStopwords
      struct(
        n.cast("long").as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(alphaFrac, 6).as("alpha_word_frac"),
        round(symRatio, 6).as("symbol_ratio"),
        round(bulletFrac, 6).as("bullet_line_frac"),
        nStop.cast("long").as("n_stopwords"),
        keep.as("keep"))
    }

  /** Explicit whitespace class for the BPE pattern: Java's \s includes
    * vertical tab (\x0B) while RE2's does not, so a bare \s in the pattern
    * would make the two engines tokenize VT differently — spelled out, both
    * agree. */
  private val BpeWs = "\\t\\n\\x0B\\f\\r "

  /** A char the BPE whitespace class excludes — the "counts as a token"
    * test, shared verbatim with the DuckDB oracle. */
  val BpeNonWs: String = s"[^$BpeWs]"

  /** BPE-style pre-tokenization pattern (the GPT-2 shape, lookaheads
    * dropped so the same pattern runs on Java regex and RE2): common
    * contraction suffixes, space-glued letter runs, digit runs, and
    * punctuation runs, with residual whitespace as its own match. */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+" +
      s"| ?[^$BpeWs\\p{L}\\p{N}]+|[$BpeWs]+"

  /** BPE-ish pre-tokens of the raw text (case/space-preserving — unlike
    * [[tokens]] this is the LLM tokenizer's view, where ' world' and
    * 'world' differ). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Token count under BPE-ish pre-tokenization: matches containing any
    * non-whitespace (pure-whitespace runs separate tokens but are not
    * counted). The budget estimator for packing/pricing when the real
    * vocab merge table isn't in the loop. */
  def bpeTokenCount(text: Column): Column =
    size(filter(bpeTokens(text), t => t.rlike(BpeNonWs)))

  /** Exact-dup fingerprint: md5 of whitespace-normalized lowercase text. */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Winnowing-style fingerprint: min stable hash over 3-token shingles. */
  def minShingleFingerprint(text: Column, n: Int = 3): Column = {
    val hs = transform(shingles(text, n), s => stableHash32(s))
    when(size(hs) === 0, stableHash32(text)).otherwise(array_min(hs))
  }

  /** Register the text-analysis surface as SQL functions (quality_score,
    * lang_id, token_count, bpe_token_count, content_fingerprint, simhash,
    * gopher_stats, strip_html, html_tag_count, canonicalize_url, url_host)
    * so `spark.sql` users get the same operators as the Column API —
    * the per-session analog of [[graft.GraftExtensions]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    val reg = spark.sessionState.functionRegistry
    def wrap(f: Column => Column): Seq[Expression] => Expression =
      es => ColumnBridge.eagerExpression(f(ColumnBridge.column(es.head)))
    reg.createOrReplaceTempFunction("quality_score", wrap(qualityScore), "built-in")
    reg.createOrReplaceTempFunction("lang_id", wrap(langId(_)), "built-in")
    reg.createOrReplaceTempFunction("token_count", wrap(tokenCount), "built-in")
    reg.createOrReplaceTempFunction("bpe_token_count", wrap(bpeTokenCount), "built-in")
    reg.createOrReplaceTempFunction("content_fingerprint",
      wrap(contentFingerprint), "built-in")
    // any foldable integral expression works (8+8, CAST(16 AS INT), ...),
    // not just a bare literal — the value just has to be plan-time. ONE
    // definition for every registered function with a constant-int arg,
    // so an edge fix (e.g. rejecting fractional truncation) lands once.
    def foldableInt(e: Expression, fn: String, arg: String): Int = e match {
      case f if f.foldable => f.eval() match {
        case n: java.lang.Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be integral, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a constant integer")
    }
    reg.createOrReplaceTempFunction("simhash", es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"simhash(text, bits) takes 2 arguments, got ${es.length}")
      val bits = foldableInt(es(1), "simhash(text, bits)", "bits")
      ColumnBridge.eagerExpression(simhash(ColumnBridge.column(es.head), bits))
    }, "built-in")
    reg.createOrReplaceTempFunction("gopher_stats", wrap(gopherStats), "built-in")
    reg.createOrReplaceTempFunction("strip_html",
      wrap(TextPrep.stripHtml), "built-in")
    reg.createOrReplaceTempFunction("html_tag_count",
      wrap(TextPrep.htmlTagCount), "built-in")
    reg.createOrReplaceTempFunction("canonicalize_url",
      wrap(UrlFunctions.canonicalizeUrl), "built-in")
    reg.createOrReplaceTempFunction("url_host",
      wrap(UrlFunctions.urlHost), "built-in")
    // misra_gries(item, k): the heavy-hitters candidate AGGREGATE —
    // ARRAY<STRUCT<item, cnt>> of ≤ k counters, usable under GROUP BY
    // (one summary per group). Same foldable-k rule as simhash's bits.
    reg.createOrReplaceTempFunction("misra_gries", es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"misra_gries(item, k) takes 2 arguments, got ${es.length}")
      val k = foldableInt(es(1), "misra_gries(item, k)", "k")
      graft.operators.HeavyHitters.MisraGriesAgg(es.head, k)
        .toAggregateExpression()
    }, "built-in")
  }
}
