package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Okapi BM25 ([[Bm25]]): scores match the closed-form formula on a
  * hand-checkable corpus, the persisted inverted index serves identical
  * results to the inline scan, and term lookups reach the postings scan as
  * pushed filters.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark join"),
    (2L, "spark vector"),
    (3L, "vector vector join table"),
    (4L, "table scan filter agg")
  ).toDF("doc_id", "text")

  test("scores match the closed-form BM25 formula") {
    val got = Bm25.score(corpus, "spark vector", k1 = 1.2, b = 0.75)
      .as[(Long, Double)].collect().toMap
    // N=4, avgdl=(4+2+4+4)/4=3.5; df(spark)=2, df(vector)=2
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    def w(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.5))
    val expected = Map(
      1L -> w(3, 4),            // spark x3
      2L -> (w(1, 2) + w(1, 2)), // spark + vector
      3L -> w(2, 4))            // vector x2
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) => assert(math.abs(got(id) - e) < 1e-9,
      s"doc $id: got ${got(id)} expected $e") }
  }

  test("docs with no query term are absent; top-k ordering is score desc") {
    val top = Bm25.search(corpus, "spark vector", k = 10)
      .as[(Long, Double)].collect()
    assert(!top.map(_._1).contains(4L))
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
  }

  test("persisted index serves the same ranking as the inline scan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Bm25.buildIndex(docs, dir)
    val inline = Bm25.search(docs, "spark vector query join", k = 20)
      .select(col("id"), round(col("score"), 9).as("score"))
      .as[(Long, Double)].collect().toSeq
    val served = Bm25.searchIndex(spark, dir, "spark vector query join", k = 20)
      .select(col("id"), round(col("score"), 9).as("score"))
      .as[(Long, Double)].collect().toSeq
    assert(served == inline)
  }

  test("index search pushes the term filter into the postings scan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx2").toString
    Bm25.buildIndex(docs, dir)
    val df = Bm25.searchIndex(spark, dir, "spark vector", k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(token, [spark,vector])")
      || plan.contains("PushedFilters: [In(token, [vector,spark])"), plan)
  }

  test("single-term query and absent-term query behave") {
    val one = Bm25.search(corpus, "join", k = 10).as[(Long, Double)].collect()
    assert(one.map(_._1).toSet == Set(1L, 3L))
    assert(Bm25.search(corpus, "nosuchterm", k = 10).count() == 0)
    intercept[IllegalArgumentException](Bm25.search(corpus, "   ", k = 10))
  }
}
