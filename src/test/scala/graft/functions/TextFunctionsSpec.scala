package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Row = df.head()

  test("tokenizer and counts") {
    val df = Seq("The  Quick   brown FOX").toDF("text")
    assert(one(df.select(tokens(col("text")))).getSeq[String](0) ==
      Seq("the", "quick", "brown", "fox"))
    assert(one(df.select(tokenCount(col("text")))).getInt(0) == 4)
    // empty / whitespace-only text tokenizes to [] (count 0), not [""]
    // (count 1) — split's zero-length-input quirk must not leak into
    // token accounting or hand downstream operators a phantom token
    val edge = Seq("", "   \t  ").toDF("text")
    assert(edge.select(tokenCount(col("text"))).collect().forall(_.getInt(0) == 0))
    assert(edge.select(tokens(col("text"))).collect()
      .forall(_.getSeq[String](0).isEmpty))
  }

  test("shingles: n-grams, short-text edge cases") {
    val df = Seq("a b c d").toDF("text")
    assert(one(df.select(shingles(col("text"), 2))).getSeq[String](0) ==
      Seq("a b", "b c", "c d"))
    assert(one(df.select(shingles(col("text"), 3))).getSeq[String](0) ==
      Seq("a b c", "b c d"))
    val short = Seq("solo").toDF("text")
    assert(one(short.select(shingles(col("text"), 2))).getSeq[String](0).isEmpty)
  }

  test("minhash signatures are deterministic and length numHashes") {
    val df = Seq("a b c d e f", "a b c d e f", "totally different words here").toDF("text")
    val sigs = df.select(minhashSignature(col("text"), 2, 8)).collect()
      .map(_.getSeq[Long](0))
    assert(sigs(0).length == 8)
    assert(sigs(0) == sigs(1)) // identical text => identical signature
    assert(sigs(0) != sigs(2))
  }

  test("jaccard on shingle sets: identity 1, disjoint 0") {
    val df = Seq(("a b c", "a b c"), ("a b c", "x y z")).toDF("t1", "t2")
    val r = df.select(jaccard(shingleSet(col("t1"), 2), shingleSet(col("t2"), 2))).collect()
    assert(r(0).getDouble(0) == 1.0)
    assert(r(1).getDouble(0) == 0.0)
  }

  test("simhash: near-identical texts have small hamming distance") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "the quick brown fox jumps over the lazy dog near the river shore",
      "spark catalyst optimizer rules rewrite logical plans into physical ones"
    ).toDF("text")
    val hs = df.select(simhash(col("text"), 16)).collect().map(_.getLong(0))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(0), hs(1)) <= 4, s"near-dup hamming ${hamming(hs(0), hs(1))}")
    assert(hamming(hs(0), hs(2)) > hamming(hs(0), hs(1)))
  }

  test("quality score bounded in [0,1]") {
    val df = Seq("good clean readable text with several words",
      "!!!! ???? ....", "x").toDF("text")
    df.select(qualityScore(col("text"))).collect().foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
    }
  }

  test("content fingerprint is whitespace/case-insensitive") {
    val df = Seq(("Hello   World", "hello world"), ("a b", "a c")).toDF("t1", "t2")
    val r = df.select(
      (contentFingerprint(col("t1")) === contentFingerprint(col("t2"))).as("eq")).collect()
    assert(r(0).getBoolean(0))
    assert(!r(1).getBoolean(0))
  }

  test("langId marks stopword-bearing text as en") {
    val df = Seq("the cat sat on the mat", "lorem ipsum dolor sit amet").toDF("text")
    val r = df.select(langId(col("text"))).collect().map(_.getString(0))
    assert(r(0) == "en" && r(1) == "unk")
  }

  test("SQL registration serves the text surface to spark.sql users") {
    TextFunctions.register(spark)
    Seq((1L, "the cat sat on the mat"), (2L, "lorem ipsum"))
      .toDF("id", "text").createOrReplaceTempView("tf_sql_t")
    val r = spark.sql(
      """SELECT id, quality_score(text) q, lang_id(text) l, token_count(text) n,
        |  bpe_token_count(text) b, content_fingerprint(text) fp,
        |  simhash(text, 16) s
        |FROM tf_sql_t ORDER BY id""".stripMargin).collect()
    assert(r(0).getString(2) == "en" && r(1).getString(2) == "unk")
    assert(r(0).getInt(3) == 6 && r(0).getInt(4) == 6)
    assert(r(0).getDouble(1) > 0 && r(0).getDouble(1) <= 1)
    assert(r(0).getString(5).length == 32)
    val s = r(0).getLong(6)
    assert(s >= 0 && s < (1L << 16))
    // the curation additions are served through the same registry
    val r2 = spark.sql(
      """SELECT gopher_stats('the and of it words').keep k,
        |  strip_html('<p>a &amp; b</p>') h, html_tag_count('<p>x</p>') n,
        |  canonicalize_url('HTTP://Ex.COM:80/p/?utm_a=1&z=2#f') cu,
        |  url_host('https://A.io/x') uh""".stripMargin).head()
    assert(!r2.getBoolean(0) && r2.getString(1) == "a & b" && r2.getInt(2) == 2)
    assert(r2.getString(3) == "http://ex.com/p?z=2" && r2.getString(4) == "a.io")
    // non-literal simhash bits is a loud error, not a silent misparse
    intercept[Exception](spark.sql(
      "SELECT simhash(text, id) FROM tf_sql_t").collect())
    // wrong arity is a clean argument error, not an IndexOutOfBounds
    val arity = intercept[Exception](spark.sql(
      "SELECT simhash(text) FROM tf_sql_t").collect())
    assert(arity.getMessage.contains("2 arguments"))
    // foldable-but-not-literal bits (8+8) work like a literal 16
    val folded = spark.sql(
      "SELECT simhash(text, 8+8) s FROM tf_sql_t WHERE id = 1").collect()
    assert(folded(0).getLong(0) == s)
    // misra_gries is an AGGREGATE through the same registry: grouped
    // summaries, ≤ k entries, with the repeated item surfacing on top
    val mg = spark.sql(
      """SELECT misra_gries(t.tok, 4) c FROM (
        |  SELECT explode(split('a a a b c d e a b', ' ')) AS tok) t""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(mg.size <= 4 && mg.head.getString(0) == "a")
    val mgArity = intercept[Exception](spark.sql(
      "SELECT misra_gries(text) FROM tf_sql_t").collect())
    assert(mgArity.getMessage.contains("2 arguments"))
    // a non-string item column fails ANALYSIS (declared input type), not
    // as a mid-task executor ClassCastException
    intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      "SELECT misra_gries(id, 4) FROM tf_sql_t").collect())
  }

  test("BPE-ish pre-tokens split contractions, glue spaces, count non-ws") {
    val df = Seq("Hello, world! It's 42 degrees (hot).").toDF("text")
    val toks = df.select(bpeTokens(col("text"))).collect()(0)
      .getSeq[String](0)
    assert(toks == Seq("Hello", ",", " world", "!", " It", "'s", " 42",
      " degrees", " (", "hot", ")."))
    assert(df.select(bpeTokenCount(col("text"))).collect()(0).getInt(0) == 11)
    // whitespace runs separate but don't count; empty text counts zero
    val ws = Seq("a  \n  b", "").toDF("text")
      .select(bpeTokenCount(col("text"))).collect().map(_.getInt(0))
    assert(ws(0) == 2 && ws(1) == 0)
  }

  test("gopherStats: each rule trips independently; keep needs all") {
    def stats(t: String) = Seq(t).toDF("text")
      .select(gopherStats(col("text")).as("g")).select("g.*").head()
    val good = ("the and of it " + Seq.fill(50)("sturdy words flow here").mkString(" ")).trim
    val g = stats(good)
    assert(g.getAs[Boolean]("keep"))
    assert(g.getAs[Long]("n_words") == 204 && g.getAs[Long]("n_stopwords") == 4)
    // too short
    assert(!stats("the and of it few words").getAs[Boolean]("keep"))
    // symbol runs: '###' and '...' count, '#tag' and '..' don't
    val sym = stats("### ... #tag .. " + good)
    assert(sym.getAs[Double]("symbol_ratio") > 0 &&
      math.abs(sym.getAs[Double]("symbol_ratio") - 2.0 / 208) < 1e-6)
    // mean word length out of [3,10]
    assert(!stats(Seq.fill(60)("a b the of").mkString(" ")).getAs[Boolean]("keep"))
    // bullet-dominated doc fails on the bullet rule alone
    val bullets = (1 to 20).map(i => s"- item $i").mkString("\n")
    val b = stats(bullets + "\nthe and of it closing line " + good)
    assert(b.getAs[Double]("bullet_line_frac") > 0.9 && !b.getAs[Boolean]("keep"))
    // no stopwords fails
    assert(!stats(Seq.fill(60)("sturdy words flow here").mkString(" ")).getAs[Boolean]("keep"))
  }
}
