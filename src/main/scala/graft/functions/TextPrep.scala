package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Text normalization + PII scrubbing + repetition signals — the
  * pre-tokenization cleanup stages of a training-data pipeline, sitting in
  * front of the dedup/quality funnel in [[graft.operators.Dedup]]. The
  * reference has no text pipeline at all (it stores embeddings, not
  * documents); these are the operations its users run BEFORE embedding, so
  * they belong to the engine's curation surface.
  *
  * Everything is map-only: a Catalyst codegen expression for Unicode
  * normalization (the JDK normalizer called once per row inside
  * whole-stage codegen — no UDF dispatch) and built-in regex/array
  * expressions for the rest. All regexes are RE2-compatible (no
  * lookaround, no backreferences) so the DuckDB oracle runs the identical
  * patterns.
  */
object TextPrep {

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd unary
    * expression — Spark has no built-in for this; a Scala UDF would break
    * whole-stage codegen on the hottest map stage of a 100 TB text scan. */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression with ExpectsInputTypes {
    require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
      s"unicode_normalize: unknown form '$form'")
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"
    private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

    override def nullSafeEval(s: Any): Any =
      UTF8String.fromString(java.text.Normalizer.normalize(
        s.asInstanceOf[UTF8String].toString, normForm))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  java.text.Normalizer.normalize($c.toString(),
           |    java.text.Normalizer.Form.$form));""".stripMargin)

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  /** Accent stripping: NFD-decompose, then drop combining marks — 'é' →
    * 'e'. Matches DuckDB's `strip_accents` on Latin text, which is the
    * oracle for it. */
  def stripAccents(c: Column): Column =
    regexp_replace(unicodeNormalize(c, "NFD"), "\\p{M}", "")

  /** Canonical text for fingerprinting across encoding variants: NFC,
    * lowercased, whitespace collapsed and trimmed. */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(lower(unicodeNormalize(c, "NFC")), "\\s+", " "))

  // ---- PII scrubbing ---------------------------------------------------
  // RE2-safe patterns (shared verbatim with the DuckDB oracle). Word
  // boundaries \b work in both Java regex and RE2.

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** International-ish phone shape: +CC and two separator-delimited digit
    * groups — mandatory single separators keep the match backtracking-free
    * (Java) and identical under RE2's leftmost-longest scan, and the
    * trailing \b stops partial eats of longer digit runs. */
  val PhonePattern = "\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}\\b"

  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Redact emails, IPv4s and phone numbers with typed placeholder tokens
    * (the Dolma/CCNet convention — keeps token positions stable for
    * downstream length/quality features). Order matters: emails first so
    * their digit runs can't be half-eaten by the phone pass; IPs before
    * phones so dotted quads never parse as phone digits. */
  def scrubPii(c: Column): Column = {
    val noEmail = regexp_replace(c, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  // ---- HTML text extraction --------------------------------------------
  // The boilerplate-strip step of a web-crawl ingest (the jusText/
  // trafilatura slot, regex-grade): drop script/style subtrees wholesale
  // (their CONTENT is code, not text), drop comments, drop remaining tags,
  // unescape the named entities that survive into running text, collapse
  // whitespace. Pure regexp_replace/replace chains — map-only, codegen'd,
  // and every pattern is RE2-safe (inline (?is) flags, non-greedy
  // quantifiers, no lookaround/backrefs) so the DuckDB oracle replays the
  // identical patterns.

  /** Whole-subtree drops: the close tag is matched literally per element
    * name because RE2 has no backreferences. */
  val ScriptPattern = "(?is)<script[^>]*>.*?</script>"
  val StylePattern = "(?is)<style[^>]*>.*?</style>"
  val CommentPattern = "(?s)<!--.*?-->"

  /** Any remaining tag, open or close. `[^>]` (not `.*?`) so an unclosed
    * `<` can't swallow the rest of the document. */
  val TagPattern = "<[^>]*>"

  /** Explicit whitespace class (Java's \s includes VT, RE2's does not —
    * same divergence [[TextFunctions.BpePattern]] documents). */
  private val HtmlWs = "[\\t\\n\\x0B\\f\\r ]+"

  /** Named entities unescaped after tag removal, in fixed order with
    * `&amp;` LAST — single-pass semantics: `&amp;lt;` becomes the literal
    * text `&lt;`, not `<`. The oracle nests its `replace` calls in the
    * same order. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Count of tags in the raw markup (script/style/comment bodies
    * included — it measures markup density, a quality signal on crawls). */
  def htmlTagCount(c: Column): Column =
    size(regexp_extract_all(c, lit(TagPattern), lit(0)))

  /** Extracted running text of an HTML document. */
  def stripHtml(c: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(regexp_replace(c, ScriptPattern, " "),
        StylePattern, " "),
      CommentPattern, " ")
    val noTags = regexp_replace(noBlocks, TagPattern, " ")
    val unescaped = HtmlEntities.foldLeft(noTags) {
      case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch))
    }
    trim(regexp_replace(unescaped, HtmlWs, " "))
  }

  // ---- Multi-language ID ------------------------------------------------

  /** Marker-token profiles per language (n-gram-profile stand-ins like
    * [[TextFunctions.EnMarkers]], one set per language). Insertion order
    * is alphabetical — the tie-break order shared with the oracle. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por"),
    "fr" -> Seq("le", "les", "des", "une", "est", "dans", "pour", "sur"))

  /** Multi-language ID: per-language marker-token ratio, argmax with
    * alphabetical tie-break, 'unk' below `threshold`. One tokenization per
    * row (let-bound), then |languages| filtered counts — map-only. */
  def langIdMulti(text: Column, threshold: Double = 0.03): Column =
    ColumnOps.bindOnce(TextFunctions.tokens(text)) { toks =>
      val n = size(toks).cast("double")
      val ratios = LangMarkers.map { case (lang, ms) =>
        lang -> when(n === 0.0, 0.0)
          .otherwise(size(filter(toks, t => t.isInCollection(ms))).cast("double") / n)
      }
      val best = greatest(ratios.map(_._2): _*)
      // alphabetical CASE chain = deterministic tie-break, replicated
      // verbatim by the DuckDB oracle
      val chain = ratios.foldLeft(when(best < threshold, "unk")) {
        case (acc, (lang, r)) => acc.when(r === best, lang)
      }
      chain
    }

  // ---- Repetition signals (Gopher-style quality filters) ---------------

  /** Fraction of word n-gram occurrences that are repeats of an n-gram
    * already seen in the document: 1 - distinct/total. 0 for docs shorter
    * than n words. The Gopher "duplicate n-gram fraction" filter shape. */
  def dupNgramFraction(text: Column, n: Int): Column =
    ColumnOps.bindOnce(TextFunctions.shingles(text, n)) { sh =>
      when(size(sh) === 0, 0.0).otherwise(
        lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
    }

  /** Per-document repetition stats, relationally: explode n-grams once,
    * count (doc, gram) pairs, fold to duplicate-fraction and
    * top-gram-share per doc — one shuffle on (doc, gram), partial
    * aggregation map-side, never a per-row nested loop (a column-level
    * "most frequent n-gram" would be O(len·distinct) per document, which a
    * long doc turns quadratic). Short docs (< n words) report 0.0 for both.
    *
    * Output: (idCol, n_ngrams LONG, dup_ngram_fraction, top_ngram_share).
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.DataFrame = {
    val grams = docs.select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol)).agg(
        sum("cnt").as("total"), count(lit(1)).as("n_distinct"),
        max("cnt").as("top_cnt"))
    docs.select(col(idCol)).join(grams, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total"), lit(0L)).as("n_ngrams"),
        coalesce(lit(1.0) - col("n_distinct").cast("double")
          / col("total").cast("double"), lit(0.0)).as("dup_ngram_fraction"),
        coalesce(col("top_cnt").cast("double")
          / col("total").cast("double"), lit(0.0)).as("top_ngram_share"))
  }

  /** Corpus-self bigram language-model score — the "perplexity filter"
    * slot of a CCNet-style pipeline (Wenzek et al. 2020 score documents
    * under a reference LM; here the reference is the corpus itself, which
    * needs no external model and still separates fluent text from
    * gibberish/boilerplate): per document, the mean natural-log
    * probability of its token bigrams under an add-one-smoothed bigram
    * model of the WHOLE corpus,
    * `p(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V)`.
    *
    * Returns (id, n_bigrams, avg_logprob); documents with fewer than two
    * tokens score 0 over 0 bigrams. Higher (less negative) = more typical
    * of the corpus.
    *
    * Scale shape: words are hashed in the scan-side project
    * ([[TextFunctions.stableHash32]] of the bigram / its context word), so
    * every exchange — the two count aggregates, the count-lookup joins,
    * the per-doc rollup — carries longs, never text. The model "tables"
    * ARE DataFrames (c12 keyed by bigram hash, c1 by context hash), so the
    * lookup is a shuffle join that scales with corpus token count; V rides
    * in as a broadcast scalar. Nothing collects; training and scoring are
    * one plan. */
  def lmScore(docs: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import TextFunctions._
    val toksDf = graft.operators.Dedup.spread(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    val bi = toksDf.select(col("id"), explode(
        when(size(col("toks")) < 2,
          array().cast("array<struct<h1:bigint,h12:bigint>>"))
        .otherwise(transform(sequence(lit(1), size(col("toks")) - 1), i =>
          struct(
            stableHash32(element_at(col("toks"), i)).as("h1"),
            stableHash32(concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1))).as("h12"))))).as("b"))
      .select(col("id"), col("b.h1").as("h1"), col("b.h12").as("h12"))
    val biCnt = bi.groupBy("h12").agg(count(lit(1)).as("c12"))
    val ctxCnt = bi.groupBy("h1").agg(count(lit(1)).as("c1"))
    val vocab = toksDf.select(explode(col("toks")).as("w"))
      .agg(countDistinct(stableHash32(col("w"))).as("v"))
    val scored = bi.join(biCnt, Seq("h12")).join(ctxCnt, Seq("h1"))
      .crossJoin(broadcast(vocab))
      .groupBy("id").agg(
        count(lit(1)).as("n_bigrams"),
        avg(log((col("c12") + 1).cast("double") / (col("c1") + col("v"))))
          .as("avg_logprob"))
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Overlapping token-window chunking — the document→window primitive an
    * embedding/RAG ingest runs before vectorizing (every chunk keeps
    * `overlap` tokens of left context so boundary-spanning passages stay
    * retrievable). Chunk i covers tokens [i·stride, i·stride+chunkTokens)
    * with stride = chunkTokens − overlap; the last chunk may be short;
    * ceil((n−overlap)/stride) chunks cover every token. Returns
    * (id, chunk_idx, n_tokens, chunk_text).
    *
    * Scale shape: pure map — tokenize once, window via slice() inside the
    * same projection, posexplode multiplies rows by the chunk count. No
    * shuffle, no state; at 100 TB this fuses into the ingest scan and its
    * output feeds the embedding batch directly. */
  def chunkDocuments(docs: org.apache.spark.sql.DataFrame, chunkTokens: Int,
      overlap: Int, textCol: String = "text",
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunk=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val n = size(toks)
    val nChunks = ceil(greatest(n - overlap, lit(1)).cast("double") / stride)
      .cast("int")
    docs
      .select(col(idCol).as("id"), toks.as("_toks"), n.as("_n"),
        nChunks.as("_nc"))
      .filter(col("_n") > 0)
      .select(col("id"), col("_n"),
        posexplode(transform(sequence(lit(0), col("_nc") - 1),
          i => array_join(
            slice(col("_toks"), i * stride + 1, lit(chunkTokens)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkTokens), col("_n") - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"),
        col("chunk_text"))
  }
}
