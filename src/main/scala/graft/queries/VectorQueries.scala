package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions._

/** Exact k-NN search queries over the embeddings table — the Spark-native
  * form of the reference's brute-force kernels (SURVEY.md §2.9 X17:
  * `batch_search_parallel`, `src/core/vector_ops.rs:310-346`) expressed as a
  * broadcast theta-join (J1) + TakeOrderedAndProject top-k (T1).
  *
  * Distances are computed in double and rounded to 6 decimals on both sides;
  * ordering ties broken by vec_id so Spark and the DuckDB oracle select the
  * identical top-k set.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  private def knn(s: SparkSession, dir: String, metric: String, k: Int): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val dist = metric match {
      case "cosine" => round(cosineSimilarity(col("embedding"), col("q_emb")), 6).as("cos_sim")
      case "l2" => round(euclideanDistance(col("embedding"), col("q_emb")), 6).as("l2_dist")
      case "dot" => round(dotProduct(col("embedding"), col("q_emb")), 6).as("dot")
    }
    val scored = e.crossJoin(broadcast(q)).select(col("vec_id"), dist)
    metric match {
      case "cosine" => scored.orderBy(desc("cos_sim"), asc("vec_id")).limit(k)
      case "l2" => scored.orderBy(asc("l2_dist"), asc("vec_id")).limit(k)
      case "dot" => scored.orderBy(desc("dot"), asc("vec_id")).limit(k)
    }
  }

  val queries: Map[String, Q] = Map(
    "knn_cosine" -> ((s, dir) => knn(s, dir, "cosine", 10)),
    "knn_l2" -> ((s, dir) => knn(s, dir, "l2", 10)),
    "knn_dot" -> ((s, dir) => knn(s, dir, "dot", 10)))

  private val qSub =
    "(SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0) q"

  val oracles: Map[String, String] = Map(
    "knn_cosine" ->
      s"""SELECT e.vec_id,
         |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS cos_sim
         |FROM embeddings e, $qSub
         |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "knn_l2" ->
      s"""SELECT e.vec_id,
         |  round(list_distance(e.embedding::DOUBLE[], q.q_emb), 6) AS l2_dist
         |FROM embeddings e, $qSub
         |ORDER BY l2_dist ASC, e.vec_id LIMIT 10""".stripMargin,
    "knn_dot" ->
      s"""SELECT e.vec_id,
         |  round(list_inner_product(e.embedding::DOUBLE[], q.q_emb), 6) AS dot
         |FROM embeddings e, $qSub
         |ORDER BY dot DESC, e.vec_id LIMIT 10""".stripMargin)
}
