package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation operators: hash-split determinism, mixture-sampling rates,
  * planted decontamination, and first-fit packing arithmetic. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("hashSplit is deterministic, salt-sensitive, and partition-invariant") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val a = Curation.hashSplit(docs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Curation.hashSplit(docs.repartition(7), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b) // partitioning cannot change the deal
    val c = Curation.hashSplit(docs, splits, salt = "other")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a != c) // the salt can
    // every doc gets exactly one label; the big split dominates
    assert(a.size == docs.count())
    val byLabel = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel("train") > byLabel.getOrElse("val", 0)
      && byLabel("train") > byLabel.getOrElse("test", 0))
    intercept[IllegalArgumentException](
      Curation.hashSplit(docs, Seq("a" -> 0.5, "b" -> 0.2)))
    // 0.7 * 10000 is 6999.999... in IEEE doubles: the boundary must round
    // to 7000 (truncation would shift one bucket below any SQL oracle)
    val counts = Curation.hashSplit(docs, Seq("big" -> 0.7, "small" -> 0.3))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val exact = docs.selectExpr(
        "conv(substring(md5(concat(cast(doc_id as string), ':split')), 1, 8), 16, 10) % 10000 as b")
      .filter(col("b") < 7000).count()
    assert(counts("big") == exact)
  }

  test("leakageSafeSplit: near-dup clusters never straddle a split") {
    val splits = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val ids = (0L until 400L).toDF("doc_id")
    // planted pair list with chains (0-1-2, 10-11, ...) — the transitive
    // component, not just the direct pair, must co-locate
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L), (300L, 301L))
      .toDF("id_a", "id_b")
    val out = Curation.leakageSafeSplit(ids, pairs, splits)
      .select("doc_id", "split", "split_key")
      .as[(Long, String, Long)].collect()
    val bySplit = out.map(r => r._1 -> r._2).toMap
    // chained near-dups land together, transitively
    assert(Set(bySplit(0L), bySplit(1L), bySplit(2L)).size == 1)
    assert(Set(bySplit(20L), bySplit(21L), bySplit(22L), bySplit(23L)).size == 1)
    assert(bySplit(10L) == bySplit(11L))
    assert(bySplit(300L) == bySplit(301L))
    // clustered docs share the component representative as their key
    val keyOf = out.map(r => r._1 -> r._3).toMap
    assert(keyOf(0L) == 0L && keyOf(2L) == 0L && keyOf(23L) == 20L)
    // singletons degrade to plain hashSplit with identical arithmetic
    val plain = Curation.hashSplit(ids, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.filter(r => r._1 == r._3).foreach { case (id, split, _) =>
      assert(split == plain(id), s"singleton $id diverged from hashSplit")
    }
    // general property over EVERY pair row: both ends on the same side
    val straddled = pairs.as[(Long, Long)].collect().count {
      case (a, b) => bySplit(a) != bySplit(b)
    }
    assert(straddled == 0, s"$straddled pairs straddle a split boundary")
  }

  test("mixtureSample keeps everything at 1.0, nothing at 0.0, rates by source") {
    val n = docs.count()
    assert(Curation.mixtureSample(docs, Map.empty, default = 1.0).count() == n)
    assert(Curation.mixtureSample(docs, Map.empty, default = 0.0).count() == 0)
    val mixed = Curation.mixtureSample(docs,
      Map("src0" -> 1.0, "src1" -> 0.0), default = 0.5)
    val bySrc = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == docs.filter(col("source") === "src0").count())
    assert(!bySrc.contains("src1"))
  }

  test("mixtureSample upsamples deterministically above rate 1.0") {
    val n = docs.count()
    // integer rate: exactly 2 copies of every doc, copy_id 0 and 1
    val doubled = Curation.mixtureSample(docs, Map.empty, default = 2.0)
    assert(doubled.count() == 2 * n)
    assert(doubled.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
    assert(doubled.select("copy_id").distinct().as[Long].collect().toSet == Set(0L, 1L))
    // fractional rate: every doc 1 or 2 copies, total strictly between
    val mixed = Curation.mixtureSample(docs, Map.empty, default = 1.5)
    val c = mixed.groupBy("doc_id").count()
    assert(c.filter(col("count") < 1 || col("count") > 2).count() == 0)
    assert(mixed.count() > n && mixed.count() < 2 * n)
    // and the choice is the same hash decision every run
    assert(mixed.count() ==
      Curation.mixtureSample(docs, Map.empty, default = 1.5).count())
  }

  test("decontaminate drops planted leaks (verbatim AND embedded) by eval fraction") {
    val evalText = "the quick brown fox jumps over the lazy dog today"
    val evalDocs = Seq((100L, evalText)).toDF("eval_id", "text")
    val train = Seq(
      (1L, evalText), // verbatim copy: overlap 1.0
      (2L, "completely unrelated words about spark and parquet files"),
      (3L, "the quick brown fox appears here but the rest differs a lot " +
        "with many extra unrelated trailing tokens beyond the overlap"),
      // the whole eval answer embedded inside a much longer doc — the
      // case train-side normalization would score ~0 and miss
      (4L, "some long introduction with many additional words " + evalText +
        " followed by plenty of trailing filler text that pads the length " +
        "of this training document far beyond the quoted answer")
    ).toDF("doc_id", "text")
    val pairs = Curation.contaminationPairs(train, evalDocs,
      shingleN = 2, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(pairs == Set(1L, 4L))
    val kept = Curation.decontaminate(train, evalDocs, shingleN = 2,
      threshold = 0.5).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("curate composes funnel, decontamination, and split end-to-end") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("eval_id", "text")
    val curated = Curation.curate(docs, evalDocs,
      minQuality = 0.3, lang = "en", shingleN = 2, bands = 4, rowsPerBand = 2,
      nearDupThreshold = 0.3, contaminationThreshold = 0.2,
      splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(curated.columns.toSet ==
      Set("doc_id", "quality", "n_tokens", "split"))
    // the composition equals running the stages by hand
    val kept = Dedup.prepPipeline(docs, 0.3, "en", 2, 4, 2, 0.3)
    val clean = Curation.decontaminate(
      docs.join(kept.select("doc_id"), Seq("doc_id"), "left_semi"),
      evalDocs, 2, 0.2)
    assert(curated.count() == clean.count())
    assert(curated.select("doc_id").as[Long].collect().toSet ==
      clean.select("doc_id").as[Long].collect().toSet)
    // every surviving doc carries a split and clears the quality floor
    assert(curated.filter(col("split").isNull || col("quality") < 0.3).count() == 0)
  }

  test("curate with maxPerGroup caps each source before the funnel") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("eval_id", "text")
    val capped = Curation.curate(docs, evalDocs,
      minQuality = 0.0, lang = "en", shingleN = 2, bands = 4, rowsPerBand = 2,
      nearDupThreshold = 0.99, contaminationThreshold = 0.99,
      splits = Seq("train" -> 1.0), maxPerGroup = Some(("source", 3)))
    // with every other stage effectively off, survivors = the capped sets
    // (minus any exact dups inside them); no source exceeds its ceiling
    val bySource = capped.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").count().as[(String, Long)].collect()
    assert(bySource.nonEmpty && bySource.forall(_._2 <= 3))
    // and the kept ids are exactly capPerGroup's choice, filtered by the funnel
    val capIds = Curation.capPerGroup(docs, "source", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(capped.select("doc_id").as[Long].collect().toSet.subsetOf(capIds))
  }

  test("packSequences assigns first-fit bins from the per-source prefix sum") {
    val df = Seq(
      ("s", 1L, "a b c"),         // 3 tokens, prefix 0  -> bin 0
      ("s", 2L, "d e f g h"),     // 5 tokens, prefix 3  -> bin 0
      ("s", 3L, "i j"),           // 2 tokens, prefix 8  -> bin 1
      ("t", 9L, "x y z")          // other shard restarts at prefix 0
    ).toDF("source", "doc_id", "text")
    val bins = Curation.packSequences(df, seqLen = 8)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 9L -> 0L))
    intercept[IllegalArgumentException](Curation.packSequences(df, 0))
  }

  test("temperature mix: alpha=1 is identity, alpha<1 downsamples the head only") {
    val skewed = ((1L to 800L).map(i => (i, "big")) ++
      (801L to 900L).map(i => (i, "small"))).toDF("doc_id", "source")
    // alpha = 1: natural proportions, every doc keeps rate 1.0
    assert(Curation.temperatureMix(skewed, alpha = 1.0).count() == 900)
    val mixed = Curation.temperatureMix(skewed, alpha = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // smallest source keeps rate 1.0; head rate = (p_small/p_big)^0.5 ≈ 0.354
    assert(mixed("small") == 100)
    assert(mixed("big") < 800 && math.abs(mixed("big") - 800 * 0.3536) < 40)
    // deterministic: the same hash decisions every run
    assert(Curation.temperatureMix(skewed, alpha = 0.5).count() ==
      mixed.values.sum)
    intercept[IllegalArgumentException](Curation.temperatureMix(skewed, 1.5))
  }

  test("DSIR weights rank target-like docs above off-target docs") {
    // two disjoint vocabularies: "english-ish" docs (target) and
    // "other" docs; a mixed doc lands in between
    val en = (0L until 20L).map(i => (i, "the quick brown fox jumps over the lazy dog", "en"))
    val de = (20L until 40L).map(i => (i, "der schnelle braune fuchs springt über den hund", "de"))
    val mixed = Seq((40L, "the quick braune fuchs", "xx"), (41L, "", "xx"))
    val docs = (en ++ de ++ mixed).toDF("doc_id", "text", "lang")
    val w = Curation.dsirWeights(docs, isTarget = col("lang") === "en")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // every target doc outscores every off-target doc; the mixed doc sits
    // strictly between the two blocks
    assert(w(0L)._3 > w(40L)._3 && w(40L)._3 > w(20L)._3)
    // target docs' weights are positive (their features are target-dense),
    // off-target negative
    assert(w(5L)._3 > 0 && w(25L)._3 < 0)
    // a doc with < 2 tokens has zero features and weight exactly 0
    assert(w(41L)._2 == 0L && w(41L)._3 == 0.0)
    // deterministic across runs
    val again = Curation.dsirWeights(docs, col("lang") === "en")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w.forall { case (id, (_, _, wt)) => again(id) == wt })
  }

  test("blocked embedding decontamination matches brute force; probes is the recall dial") {
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val docs = Seq(
      (1L, Array(1.0f, 0.05f)),  // cell 0, leaked (copy of eval 0)
      (2L, Array(0.9f, 0.4f)),   // cell 0, near the boundary
      (3L, Array(0.05f, 1.0f)),  // cell 1, leaked (copy of eval 1)
      (4L, Array(-1.0f, 0.0f))   // cell 0 by l2, far from everything
    ).toDF("doc_id", "embedding")
    val evalDocs = Seq(
      Tuple1(Array(1.0f, 0.05f)), Tuple1(Array(0.05f, 1.0f))
    ).toDF("embedding")
    val brute = Curation.embeddingContamination(docs, evalDocs, 0.95)
      .as[(Long, Double)].collect().toMap
    assert(brute.keySet == Set(1L, 3L))
    // full probes: identical verdicts to brute force
    val blocked = Curation.embeddingContaminationBlocked(
        docs, evalDocs, 0.95, cents, probes = 2)
      .as[(Long, Double)].collect().toMap
    assert(blocked == brute)
    // probes=1 can only shrink the flagged set (cell-local candidates),
    // and here still catches both leaks (each sits in its eval's own cell)
    val p1 = Curation.embeddingContaminationBlocked(
        docs, evalDocs, 0.95, cents, probes = 1)
      .as[(Long, Double)].collect().toMap
    assert(p1.keySet.subsetOf(brute.keySet) && p1.keySet == Set(1L, 3L))
    intercept[IllegalArgumentException](
      Curation.embeddingContaminationBlocked(docs, evalDocs, 0.95, cents, probes = 3))
  }

  test("embedding decontamination drops vector-space leaks n-grams miss") {
    // doc 1 is a scaled+shifted copy of the eval vector (a paraphrase
    // shares no shingles but lands ~1.0 cosine); docs 2/3 are far away
    val evalDocs = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("embedding")
    val train = Seq(
      (1L, Array(1.01f, 2.02f, 3.03f, 4.04f)),
      (2L, Array(-4.0f, 3.0f, -2.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("doc_id", "embedding")
    val flagged = Curation.embeddingContamination(train, evalDocs, 0.9)
    val r = flagged.as[(Long, Double)].collect().toMap
    assert(r.keySet == Set(1L) && r(1L) > 0.999)
    val kept = Curation.decontaminateByEmbedding(train, evalDocs, 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }
}
