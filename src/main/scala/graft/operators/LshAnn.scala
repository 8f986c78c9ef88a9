package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSH-bucketed ANN — the third scale path for similarity search next to
  * exact (Knn) and IVF: random-projection bucketing via MLlib
  * BucketedRandomProjectionLSH, with candidate pairs restricted to
  * colliding buckets (`approxSimilarityJoin`) and a grouped top-k on the
  * verified distances. The reference has no LSH; SURVEY §7 flags it as the
  * cheap ANN alternative Spark gets for free.
  */
object LshAnn {

  /** k-NN via LSH similarity join: corpus x queries restricted to bucket
    * collisions, exact L2 verify, top-k per query. `maxDistance` bounds the
    * candidate join (tune to the data's neighbor radius). */
  def searchBatch(corpus: DataFrame, queries: DataFrame, k: Int,
      maxDistance: Double, bucketLength: Double = 1.0, numHashTables: Int = 4,
      idCol: String = "id", embCol: String = "embedding",
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding",
      seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), array_to_vector(col(embCol)).as("features"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      array_to_vector(col(queryEmbCol)).as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength)
      .setNumHashTables(numHashTables)
      .setInputCol("features").setOutputCol("hashes")
      .setSeed(seed)
      .fit(c)
    val joined = model.approxSimilarityJoin(c, q, maxDistance, "distance")
      .select(col("datasetB.query_id").as("query_id"),
        col("datasetA.id").as("id"), col("distance"))
    val topk = TopK.topK(k)
    joined.groupBy("query_id")
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).cast("long").as("rank"))
  }
}
