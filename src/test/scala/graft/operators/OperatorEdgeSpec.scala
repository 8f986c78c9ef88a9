package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct coverage for operator paths exercised only indirectly elsewhere:
  * Knn.batch's metadata pre-filter, blocked n-gram Jaccard pairs, exact-dup
  * removal.
  */
class OperatorEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("Knn.batch pre-filter restricts the corpus before scoring") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding"),
      to_json(struct(col("label"))).as("metadata"))
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val hits = Knn.batch(corpus, queries, k = 10,
      filterJson = Some("""{"label": {"$in": [1, 2]}}"""))
    val labels = emb.select(col("vec_id").as("id"), col("label"))
    val joined = hits.join(labels, "id")
    assert(joined.count() == 20)
    assert(joined.filter(!col("label").isin(1, 2)).count() == 0)
  }

  test("ngramJaccardPairs finds planted near-dups within blocks only") {
    val docs = Seq(
      (1L, "g1", "alpha beta gamma delta epsilon zeta"),
      (2L, "g1", "alpha beta gamma delta epsilon eta"),
      (3L, "g1", "totally different words in this one"),
      (4L, "g2", "alpha beta gamma delta epsilon zeta") // same text, other block
    ).toDF("doc_id", "blk", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, shingleN = 2, threshold = 0.4,
      blockCol = "blk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // 1-4 identical but cross-block
  }

  test("dropExactDuplicates keeps the smallest id per fingerprint") {
    val docs = Seq(
      (5L, "same text here"), (2L, "Same   TEXT here"), (9L, "unique one")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 9L)) // whitespace/case-normalized dup collapses to min id
  }
}
