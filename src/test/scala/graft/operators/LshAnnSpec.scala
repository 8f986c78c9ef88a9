package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshAnnSpec extends SparkSpec {

  test("LSH bucketed search finds near neighbors with decent recall") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val approx = LshAnn.searchBatch(corpus, queries, k = 10,
      maxDistance = 3.0, bucketLength = 2.0, numHashTables = 6)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    assert(recall >= 0.5, s"lsh recall $recall")
    // self-match always lands (distance 0 collides in every table)
    val selfHits = approx.filter(col("query_id") === col("id")).count()
    assert(selfHits == 5)
  }
}
