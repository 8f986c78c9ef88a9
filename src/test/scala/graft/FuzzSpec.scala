package graft

import graft.functions.TextFunctions._
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Deterministic fuzz coverage (seeded RNG, reproducible): the invariants
  * that must hold for ARBITRARY input, not just the fixtures — the BPE
  * pattern partitions its input exactly, scores stay in range, and the
  * binary probers never throw on junk bytes. */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)
  // mix ASCII, punctuation, digits, unicode letters, and every whitespace
  // flavor (incl. the \x0B vertical tab that Java and RE2 disagree on)
  private val alphabet =
    "abcXYZ 019,.!?'()\t\n\u000B\f\ré世界б "
  private def randText(maxLen: Int): String =
    (0 until rnd.nextInt(maxLen)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  private val corpus = (0 until 200).map(i => (i.toLong, randText(80)))

  test("BPE pre-tokens partition the input: concatenation reconstructs it") {
    val df = corpus.toDF("id", "text")
    val bad = df.select(col("id"),
        concat_ws("", bpeTokens(col("text"))).as("rebuilt"), col("text"))
      .filter(col("rebuilt") =!= col("text"))
    assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
  }

  test("quality / stopword-ratio / jaccard stay in range on arbitrary text") {
    val df = corpus.toDF("id", "text")
    val scored = df.select(
      qualityScore(col("text")).as("q"),
      stopwordRatio(col("text")).as("s"),
      jaccard(shingleSet(col("text"), 2), shingleSet(reverse(col("text")), 2)).as("j"))
    val out = scored.agg(
      min("q"), max("q"), min("s"), max("s"), min("j"), max("j")).head()
    for (i <- 0 until 6) {
      val v = out.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"column $i out of range: $v")
    }
  }

  test("simhash fits its bit width; minhash signature length is exact") {
    val df = corpus.toDF("id", "text")
    val sim = df.select(simhash(col("text"), 16).as("h"))
      .filter(col("h") < 0 || col("h") >= (1L << 16))
    assert(sim.count() == 0)
    val sigLens = df.select(size(minhashSignature(col("text"), 2, 8)).as("n"))
      .distinct().as[Int].collect().toSet
    assert(sigLens == Set(8))
  }

  test("binary probers never throw on random bytes") {
    for (_ <- 0 until 500) {
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      Multimodal.probeImage(bytes) // Option result; must not throw
      Multimodal.probeAudio(bytes)
      Multimodal.probeVideo(bytes)
    }
    // random bytes behind valid magic prefixes must not throw either
    for (magic <- Seq("RIFF", "fLaC", "ID3", "GIF8", "BM")) {
      for (_ <- 0 until 100) {
        val tail = new Array[Byte](rnd.nextInt(48))
        rnd.nextBytes(tail)
        val bytes = magic.getBytes ++ tail
        Multimodal.probeImage(bytes)
        Multimodal.probeAudio(bytes)
        Multimodal.probeVideo(bytes)
      }
    }
  }

  test("AVI frame decode survives fuzz blobs, including RIFF/AVI -prefixed junk") {
    import spark.implicits._
    // 200 adversarial blobs: pure noise, RIFF-prefixed noise, full
    // RIFF+'AVI ' magic with garbage box trees, and truncated real videos
    val real = Multimodal.syntheticAviMedia(spark, 3).toDF()
      .select("data").collect().map(_.getAs[Array[Byte]](0))
    val blobs = (0 until 200).map { i =>
      val body = new Array[Byte](rnd.nextInt(96))
      rnd.nextBytes(body)
      val bytes = (i % 4) match {
        case 0 => body
        case 1 => "RIFF".getBytes ++ body
        case 2 => "RIFF".getBytes ++ body.take(4) ++ "AVI ".getBytes ++ body
        case _ => real(i % 3).take(rnd.nextInt(real(i % 3).length + 1))
      }
      (i.toLong, bytes)
    }.toDF("media_id", "data")
    // every row must come back (unknown or decoded), never a task crash
    val out = Multimodal.decodeVideoFrameStats(blobs).collect()
    assert(out.length == 200)
    assert(out.forall(s => s.format == "unknown" || s.format == "avi/dib"))
  }

  test("deeply nested LIST towers do not overflow the stack (prober, sampler, decoder)") {
    import spark.implicits._
    // 100k LISTs each wrapping the next: the recursive walkers blew the
    // JVM stack here (StackOverflowError is not NonFatal — the 'never a
    // crash' catch could not see it); the shared iterative walker bounds
    // descent depth instead
    val k = 100000
    val bytes = new Array[Byte](12 + 12 * k)
    def put4(o: Int, s: String): Unit = s.indices.foreach(j => bytes(o + j) = s(j).toByte)
    def putLe32(o: Int, v: Int): Unit = (0 until 4).foreach(j => bytes(o + j) = ((v >> (8 * j)) & 0xff).toByte)
    put4(0, "RIFF"); putLe32(4, bytes.length - 8); put4(8, "AVI ")
    for (j <- 0 until k) {
      val o = 12 + 12 * j
      put4(o, "LIST"); putLe32(o + 4, bytes.length - o - 8); put4(o + 8, "movi")
    }
    assert(Multimodal.probeVideo(bytes).contains(("avi", 0, 0, 0L)))
    val stats = Multimodal.decodeVideoFrameStats(
      Seq((1L, bytes)).toDF("media_id", "data")).collect().head
    assert(stats.format == "unknown" && stats.n_frames == 0L)
    val frames = Multimodal.sampleFrames(
      Seq((1L, bytes)).toDF("media_id", "data"), fps = 25.0).collect()
    assert(frames.isEmpty)
  }

  test("span/segment/LM/cap operators are partition-invariant on fuzz text") {
    import graft.operators.{Curation, Dedup}
    val df = corpus.toDF("doc_id", "text")
    def canon(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.collect().map(_.toString).toSet
    // the same relation through 1 and 13 partitions must answer identically
    // — none of these operators may depend on row order or partitioning
    val variants = Seq(df.coalesce(1), df.repartition(13))
    val spans = variants.map(v => canon(Dedup.dupSpanStats(v, n = 3)))
    assert(spans(0) == spans(1))
    val segs = variants.map(v => canon(Dedup.dedupSegments(v, sep = ",")))
    assert(segs(0) == segs(1))
    val lm = variants.map(v => canon(graft.functions.TextPrep.lmScore(v)
      .select(col("id"), col("n_bigrams"), round(col("avg_logprob"), 6))))
    assert(lm(0) == lm(1))
    val caps = variants.map(v => canon(
      Curation.capPerGroup(v.withColumn("src", col("doc_id") % 5), "src", n = 3)
        .select("doc_id")))
    assert(caps(0) == caps(1))
  }

  test("chunkDocuments covers every token exactly once plus overlaps, on fuzz text") {
    val df = corpus.toDF("id", "text")
    val base = df.select(col("id"),
      size(tokens(col("text"))).cast("long").as("n"))
    val chunked = graft.functions.TextPrep
      .chunkDocuments(df, chunkTokens = 5, overlap = 2, idCol = "id")
      .groupBy("id").agg(sum("n_tokens").as("tok_sum"),
        count(lit(1)).as("n_chunks"))
    // token-count conservation: chunks hold every token once, plus one
    // `overlap` of shared context per chunk boundary
    val bad = base.join(chunked, Seq("id"))
      .filter(col("tok_sum") =!= col("n") + (col("n_chunks") - 1) * 2)
    assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
    // totality: every doc with tokens produced at least one chunk
    assert(chunked.count() == base.filter(col("n") > 0).count())
  }

  test("driver-side probe selection is bit-identical to the Spark-plan path") {
    // probeRows replicates the codegen kernels' arithmetic by hand; this
    // pins the equivalence on arbitrary vectors for every metric and for
    // the HALF_UP oracle-rounding mode (where near-ties are likeliest to
    // diverge if the arithmetic drifts by one ulp)
    def randVec(dim: Int): Array[Float] =
      Array.fill(dim)((rnd.nextFloat() - 0.5f) * (1 + rnd.nextInt(4)))
    val dim = 16
    val cents = (0 until 12).map(i => (i, randVec(dim))) :+
      (12, Array.fill(dim)(0f)) // zero-norm centroid: cosine edge case
    val qs = (0L until 30L).map(i => (i, randVec(dim)))
    val centsDf = cents.toDF("cluster_id", "centroid")
    val qsDf = qs.toDF("query_id", "q_embedding")
    for (metric <- Seq("l2", "cosine", "dot", "angular");
         rd <- Seq(-1, 6, 2)) {
      val viaPlan = graft.operators.Ivf.probes(centsDf, qsDf, nProbe = 3,
          metric, roundDecimals = rd)
        .select("query_id", "cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val viaDriver = graft.operators.Ivf.probeRows(centsDf, qsDf, nProbe = 3,
          metric, roundDecimals = rd)._1
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cluster_id")))
        .sorted.toSeq
      assert(viaDriver == viaPlan, s"probe sets diverge: $metric rd=$rd")
    }
  }

  test("html strip / gopher stats / url canon are total on arbitrary text") {
    // adversarial markup-ish content: unclosed tags, stray ampersands,
    // half-entities, angle brackets inside 'attributes', random unicode
    val markupAlphabet = alphabet + "<>&;=\"/#?:"
    def randMarkup(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen)).map(_ =>
        markupAlphabet(rnd.nextInt(markupAlphabet.length))).mkString
    val df = (0 until 300).map(i => (i.toLong, randMarkup(120))).toDF("id", "text")
    // stripHtml: never null on non-null input, never throws, output has no
    // collapsible whitespace runs left
    val stripped = df.select(col("id"),
      graft.functions.TextPrep.stripHtml(col("text")).as("t"))
    assert(stripped.filter(col("t").isNull).count() == 0)
    assert(stripped.filter(col("t").rlike("[\\t\\n\\x0B\\f\\r ]{2}")).count() == 0)
    // gopherStats: every ratio in [0,1], counts non-negative, keep defined
    val g = df.select(gopherStats(col("text")).as("g")).select("g.*")
    val r = g.agg(min("mean_word_len"), min("alpha_word_frac"),
      max("alpha_word_frac"), min("symbol_ratio"), max("symbol_ratio"),
      min("bullet_line_frac"), max("bullet_line_frac"), min("n_words"),
      min("n_stopwords")).head()
    assert(r.getDouble(0) >= 0.0)
    for (i <- 1 to 6) assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0,
      s"ratio col $i out of range: ${r.getDouble(i)}")
    assert(r.getLong(7) >= 0 && r.getLong(8) >= 0)
    assert(g.filter(col("keep").isNull).count() == 0)
    // canonicalizeUrl: total; '' (never null) for junk without a scheme;
    // idempotent where it does parse
    val canon = df.select(col("id"),
      graft.functions.UrlFunctions.canonicalizeUrl(col("text")).as("c"))
    assert(canon.filter(col("c").isNull).count() == 0)
    val twice = canon.select(col("c"),
      graft.functions.UrlFunctions.canonicalizeUrl(col("c")).as("c2"))
      .filter(col("c") =!= "" && col("c") =!= col("c2"))
    assert(twice.count() == 0, twice.collect().take(3).mkString("; "))
  }

  test("FilterJson rejects junk with IllegalArgumentException, never other throwables") {
    val junk = Seq("{", "[]", "7", "\"x\"", """{"a": {"$gt": {}}}""",
      """{"$nope": 1}""", """{"a": {"$gte": 1, "$in": [2]}}""", "")
    junk.foreach { j =>
      try {
        graft.functions.FilterJson.predicate(j, col("metadata"))
        ()
      } catch {
        case _: IllegalArgumentException => ()
        case other: Throwable => fail(s"filter '$j' threw ${other.getClass}")
      }
    }
  }
}
