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
