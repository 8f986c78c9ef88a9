package graft.operators

import graft.functions.VectorExpressions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watch-history recommender (SURVEY.md §2.4 A9 + §2.9 X19,
  * `recommend_from_history`, `/root/reference/bindings/wasm/src/video.rs:142-191`):
  * average the embeddings of the watched set (element-wise mean — one tiny
  * aggregation), then k-NN search the corpus with the centroid, excluding
  * already-watched items via an anti-join.
  */
object Recommend {

  /** Element-wise mean embedding of a (small) set of rows. */
  def historyCentroid(vectors: DataFrame, embCol: String = "embedding"): DataFrame =
    vectors.select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg("v").as("m"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x("m").cast("float")).as("centroid"))

  /** Recommend top-k unwatched items by cosine similarity to the
    * watch-history centroid. Returns (id, similarity). */
  def fromHistory(corpus: DataFrame, watchedIds: Seq[Long], k: Int,
      idCol: String = "id", embCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val watched = watchedIds.toDF(idCol)
    val centroid = historyCentroid(
      corpus.join(broadcast(watched), Seq(idCol), "left_semi"), embCol)
    val simRaw = vecCosine(col(embCol), col("centroid"))
    val sim = if (roundDecimals >= 0) round(simRaw, roundDecimals) else simRaw
    corpus
      .join(broadcast(watched), Seq(idCol), "left_anti")
      .crossJoin(broadcast(centroid))
      .select(col(idCol).as("id"), sim.as("similarity"))
      .orderBy(col("similarity").desc, col("id").asc)
      .limit(k)
  }
}
