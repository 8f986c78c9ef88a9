package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the text-prep surface: the UnicodeNormalize codegen
  * expression, accent stripping, canonical fingerprints, PII scrubbing,
  * and the relational repetition stats. Unicode is spelled in escapes so
  * the intended codepoints survive any source-encoding round trip. */
class TextPrepSpec extends SparkSpec {
  import TextPrep._

  private val Decomposed = "Cafe\u0301" // e + combining acute
  private val Composed = "Caf\u00e9" // precomposed e-acute

  test("unicode normalize: NFC composes, NFD decomposes, null passes through") {
    import spark.implicits._
    val df = Seq((1L, Decomposed), (2L, Composed), (3L, null))
      .toDF("id", "s")
      .select(col("id"),
        unicodeNormalize(col("s"), "NFC").as("nfc"),
        unicodeNormalize(col("s"), "NFD").as("nfd"))
      .orderBy("id").collect()
    assert(df(0).getString(1) == Composed && df(0).getString(2) == Decomposed)
    assert(df(1).getString(1) == Composed && df(1).getString(2) == Decomposed)
    assert(df(2).isNullAt(1) && df(2).isNullAt(2))
  }

  test("unicode normalize rejects unknown forms at construction") {
    intercept[IllegalArgumentException] {
      unicodeNormalize(lit("x"), "NFX")
    }
  }

  test("strip accents and canonicalize") {
    import spark.implicits._
    // mixed forms: precomposed E-acute, decomposed u/e + combining marks
    val raw = "  CR\u00c9ME  bru\u0302le\u0301e\t\tx  "
    val r = Seq(Tuple1(raw)).toDF("s")
      .select(stripAccents(col("s")).as("a"), canonicalize(col("s")).as("c"))
      .head()
    assert(r.getString(0) == "  CREME  brulee\t\tx  ", r.getString(0))
    // canonical: NFC (composes the marks), lowercased, ws collapsed+trimmed
    assert(r.getString(1) == "cr\u00e9me br\u00fbl\u00e9e x", r.getString(1))
  }

  test("pii scrub: all three kinds; non-matching lookalikes survive") {
    import spark.implicits._
    val s = "mail a.b+c@x-corp.io, ip 192.168.0.1, call +44 123 4567, " +
      "not-a-phone 44 123 4567"
    val r = Seq(Tuple1(s)).toDF("t")
      .select(scrubPii(col("t")).as("x"),
        countMatches(col("t"), EmailPattern).as("e"),
        countMatches(col("t"), Ipv4Pattern).as("i"),
        countMatches(col("t"), PhonePattern).as("p"))
      .head()
    assert(r.getString(0) ==
      "mail <EMAIL>, ip <IP>, call <PHONE>, not-a-phone 44 123 4567",
      r.getString(0))
    assert(r.getLong(1) == 1 && r.getLong(2) == 1 && r.getLong(3) == 1)
  }

  test("multi-language ID: per-language wins, unk floor, alphabetical ties") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the cat sat of the mat and it is"), // en markers dominate
      (2L, "el perro de la casa que los gatos"), // es
      (3L, "le chat est dans une maison pour les amis"), // fr
      (4L, "der hund und die katze ist nicht ein vogel mit"), // de
      (5L, "zzz qqq www rrr ttt"), // nothing -> unk
      (6L, "the el") // en 1/2 vs es 1/2 tie -> 'en' beats 'es' alphabetically
    ).toDF("id", "text")
      .select(col("id"), TextPrep.langIdMulti(col("text")).as("lang"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(rows == Seq("en", "es", "fr", "de", "unk", "en"), rows)
  }

  test("repetition stats: dup fraction and top share, short docs report 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"), // bigrams: 5 total, 2 distinct, top "a b" x3
      (2L, "u v w x"), // 3 bigrams, all distinct
      (3L, "solo") // < 2 tokens -> no bigrams
    ).toDF("doc_id", "text")
    val r = TextPrep.repetitionStats(docs, 2).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 5 &&
      math.abs(r(0).getDouble(2) - (1.0 - 2.0 / 5.0)) < 1e-9 &&
      math.abs(r(0).getDouble(3) - 3.0 / 5.0) < 1e-9)
    assert(r(1).getLong(1) == 3 && r(1).getDouble(2) == 0.0 &&
      math.abs(r(1).getDouble(3) - 1.0 / 3.0) < 1e-9)
    assert(r(2).getLong(1) == 0 && r(2).getDouble(2) == 0.0 && r(2).getDouble(3) == 0.0)
  }

  test("lmScore: add-one bigram model, hand-computed probabilities") {
    import spark.implicits._
    // corpus: bigram (a b) x2, (a c) x1; context a x3; vocab {a,b,c,z} V=4
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z")
    ).toDF("doc_id", "text")
    val r = TextPrep.lmScore(docs).orderBy("id").collect()
    assert(r(0).getLong(1) == 1 &&
      math.abs(r(0).getDouble(2) - math.log(3.0 / 7)) < 1e-9) // (2+1)/(3+4)
    assert(math.abs(r(1).getDouble(2) - math.log(3.0 / 7)) < 1e-9)
    assert(math.abs(r(2).getDouble(2) - math.log(2.0 / 7)) < 1e-9) // (1+1)/(3+4)
    assert(r(3).getLong(1) == 0 && r(3).getDouble(2) == 0.0) // <2 tokens
    // the common phrase outscores the rarer one
    assert(r(0).getDouble(2) > r(2).getDouble(2))
  }

  test("stripHtml: blocks dropped whole, tags dropped, entities single-pass") {
    import spark.implicits._
    val html = "<html><head><style>p { color: red }</style>" +
      "<script>if (1 < 2 && 3 > 2) { x(); }</script></head>" +
      "<body><!-- hidden note --><h1>A &amp; B</h1>" +
      "<p class=\"x\">one\t two\n three</p>&lt;tag&gt; &amp;lt;literal&amp;gt;</body></html>"
    val r = Seq(Tuple1(html)).toDF("s")
      .select(stripHtml(col("s")).as("t"), htmlTagCount(col("s")).as("n"))
      .head()
    // script/style CONTENT gone (not just the tags), comment gone,
    // whitespace collapsed, entities unescaped exactly once:
    // "&amp;lt;" -> literal "&lt;", never "<"
    assert(r.getString(0) == "A & B one two three <tag> &lt;literal&gt;")
    assert(!r.getString(0).contains("color") && !r.getString(0).contains("x()"))
    assert(r.getInt(1) > 0)
  }

  test("chunkDocuments: coverage, overlap, short tail, arg validation") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                     // shorter than a chunk
      (3L, (1 to 4).map(i => s"u$i").mkString(" "))    // exactly one chunk
    ).toDF("doc_id", "text")
    val chunks = TextPrep.chunkDocuments(docs, chunkTokens = 4, overlap = 1)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1: stride 3 -> [t1..t4], [t4..t7], [t7..t10]
    assert(chunks(1L).map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(chunks(1L).map(_._3).toSeq == Seq(4L, 4L, 4L))
    // every token position is covered; consecutive chunks share 1 token
    assert(chunks(2L).map(_._4).toSeq == Seq("a b"))
    assert(chunks(2L).head._3 == 2L)
    assert(chunks(3L).map(_._4).toSeq == Seq("u1 u2 u3 u4"))
    intercept[IllegalArgumentException](
      TextPrep.chunkDocuments(docs, chunkTokens = 4, overlap = 4))
    intercept[IllegalArgumentException](
      TextPrep.chunkDocuments(docs, chunkTokens = 0, overlap = 0))
  }

  test("stripHtml: unclosed tag cannot swallow the document; null passes") {
    import spark.implicits._
    val r = Seq((1L, "before <unclosed after"), (2L, null))
      .toDF("id", "s").select(col("id"), stripHtml(col("s")).as("t"))
      .orderBy("id").collect()
    // TagPattern is <[^>]*>, not <.*?>: the bare '<' survives as text
    assert(r(0).getString(1) == "before <unclosed after")
    assert(r(1).isNullAt(1))
  }
}
