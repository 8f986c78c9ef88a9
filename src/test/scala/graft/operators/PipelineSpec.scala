package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-data prep funnel ([[Dedup.prepPipeline]] /
  * [[Dedup.prepPipelineStats]]): each stage removes exactly the planted
  * victim, and the kept-docs and stats views of the same funnel agree.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val goodA = "the dog is in the house of a friend and it is a good day"
  private val goodD = "the cat sat on the mat and it is a good day in the sun"

  private def corpus = Seq(
    (1L, goodA),          // survives everything
    (2L, goodA),          // exact dup of 1 -> exact stage
    (3L, "1 2 3 4 5 6"),  // zero alpha ratio -> quality stage
    (4L, "zzz qqq www eee rrr ttt yyy uuu"), // no stopwords -> lang stage
    (5L, goodD),          // survives everything
    (6L, goodD + " again") // near-dup of 5 (superset bigrams) -> LSH stage
  ).toDF("doc_id", "text")

  test("each funnel stage removes exactly its planted victim") {
    val stats = Dedup.prepPipelineStats(corpus, minQuality = 0.3, lang = "en",
      shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3).collect().head
    assert(stats.getAs[Long]("n_total") == 6)
    assert(stats.getAs[Long]("n_after_exact") == 5)
    assert(stats.getAs[Long]("n_after_quality") == 4)
    assert(stats.getAs[Long]("n_after_lang") == 3)
    assert(stats.getAs[Long]("n_final") == 2)

    val kept = Dedup.prepPipeline(corpus, minQuality = 0.3, lang = "en",
      shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    assert(stats.getAs[Long]("tokens_final") ==
      kept.agg(sum("n_tokens")).as[Long].head())
  }

  test("LSH bucket cap bounds a degenerate corpus and surfaces the spill") {
    // adversarial shape: pairwise-DISTINCT texts (so exact dedup keeps
    // them all) whose bigram shingle set is IDENTICAL — alternating
    // two-token walks of varying length all shingle to {x y, y x}. Every
    // doc therefore lands the same minhash signature and the same bucket
    // in every band: uncapped candidate generation is N^2/2 pairs (at an
    // extreme duplicate rate the candidate list IS the output). With the
    // cap, every bucket spills, zero pairs emit in bounded time, and the
    // funnel row says so out loud.
    val n = 200
    def walk(len: Int): String =
      (0 until len).map(j => if (j % 2 == 0) "x" else "y").mkString(" ")
    val dup = (1L to n.toLong).map(i => (i, walk(10 + i.toInt))).toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(dup, shingleN = 2, bands = 4,
      rowsPerBand = 2, threshold = 0.3, maxBucket = 10)
    assert(capped.count() == 0)
    // uncapped control on a small slice: the pairs DO exist (jaccard 1.0)
    val open = Dedup.minhashLshPairs(dup.limit(20), shingleN = 2, bands = 4,
      rowsPerBand = 2, threshold = 0.3)
    assert(open.count() == 20L * 19 / 2)
    // the spill is explicit, not silent: the funnel row carries the
    // overflow columns — all 4 band buckets hold all n docs and spill
    val lang = dup.select(graft.functions.TextFunctions.langId(col("text")))
      .head.getString(0)
    val stats = Dedup.prepPipelineStats(dup, minQuality = 0.0, lang = lang,
      shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3,
      maxBucket = 10).collect().head
    assert(stats.getAs[Long]("n_spilled_buckets") == 4)
    assert(stats.getAs[Long]("max_bucket_size") == n.toLong)
    // a doc in a spilled bucket can still pair through its other bands:
    // a genuine near-dup pair among distinct docs survives a cap that
    // only the hot buckets exceed
    val mixed = ((1L to 30L).map(i => (i, s"unique document number $i about topic $i"))
      :+ (100L, goodD) :+ (101L, goodD + " again")).toDF("doc_id", "text")
    val mixedPairs = Dedup.minhashLshPairs(mixed, shingleN = 2, bands = 4,
      rowsPerBand = 2, threshold = 0.3, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mixedPairs.contains((100L, 101L)))
  }

  test("kept-docs and stats views agree on the documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kept = Dedup.prepPipeline(docs, minQuality = 0.7, lang = "en",
      shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3)
    val stats = Dedup.prepPipelineStats(docs, minQuality = 0.7, lang = "en",
      shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3).collect().head
    assert(kept.count() == stats.getAs[Long]("n_final"))
    assert(kept.agg(coalesce(sum("n_tokens"), lit(0L))).as[Long].head() ==
      stats.getAs[Long]("tokens_final"))
    // the funnel only ever shrinks
    val stages = Seq("n_total", "n_after_exact", "n_after_quality",
      "n_after_lang", "n_final").map(stats.getAs[Long])
    assert(stages == stages.sorted.reverse)
  }
}
