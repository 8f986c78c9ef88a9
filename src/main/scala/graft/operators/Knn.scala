package graft.operators

import graft.functions.{FilterJson, VectorExpressions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact k-NN search operators — the Spark-native replacement for the
  * reference's brute-force kernels and batch search (SURVEY.md §2.9 X17/X18,
  * `/root/reference/src/core/vector_ops.rs:269-346`,
  * `bindings/wasm/src/index.rs:46-252`).
  *
  * Shape: corpus ⨯ broadcast(queries) (J1) -> codegen distance kernel ->
  * grouped top-k aggregator (T3). Queries are the broadcast side (small);
  * the corpus streams through one scan, never collected — this is the plan
  * that survives 100 TB: scan-local distance + map-side top-k, shuffling
  * only k rows per (partition, query).
  */
object Knn {

  /** Distance column for a metric; similarities are negated so smaller is
    * always better (one convention, documented in SURVEY §7). */
  def distance(metric: String, a: Column, b: Column): Column = metric match {
    case "l2" => VectorExpressions.vecL2(a, b)
    case "cosine" => lit(1.0) - VectorExpressions.vecCosine(a, b) // cosine distance
    case "dot" => -VectorExpressions.vecDot(a, b) // larger dot = closer
    case "angular" =>
      acos(greatest(lit(-1.0), least(lit(1.0), VectorExpressions.vecCosine(a, b))))
    case m => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  /** Batch k-NN: for each row of `queries` find the top-k rows of `corpus`.
    *
    * @param corpus  (id LONG, embedding ARRAY<FLOAT>, ...) — may carry extra
    *                columns (metadata, ts) which are ignored here
    * @param queries (query_id LONG, q_embedding ARRAY<FLOAT>)
    * @param metric  l2 | cosine | dot | angular
    * @param filterJson optional Mongo-style metadata filter applied as a
    *                pre-filter on `metadataCol` (exact-k semantics — strictly
    *                better than the reference's k*3 post-filter oversampling,
    *                see SURVEY §2.2)
    * @return (query_id, id, distance, rank) with rank 1..k by (distance, id)
    */
  def batch(corpus: DataFrame, queries: DataFrame, k: Int, metric: String = "l2",
      idCol: String = "id", embCol: String = "embedding",
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding",
      filterJson: Option[String] = None, metadataCol: String = "metadata",
      roundDecimals: Int = -1): DataFrame = {
    val filtered = filterJson match {
      case Some(f) => corpus.filter(FilterJson.predicate(f, col(metadataCol)))
      case None => corpus
    }
    val dRaw = distance(metric, col(embCol), col(queryEmbCol))
    val d = if (roundDecimals >= 0) round(dRaw, roundDecimals) else dRaw
    val scored = filtered
      .crossJoin(broadcast(queries))
      .select(col(queryIdCol), col(idCol).as("id"), d.as("distance"))
    val topk = TopK.topK(k)
    scored
      .groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).as("rank"))
  }

  /** Single-query search (the reference's `session.search` shape,
    * `bindings/node/src/session.rs:203-336`): returns (id, distance, score)
    * with score = 1/(1+distance) and optional score threshold (F9). */
  def search(corpus: DataFrame, query: Array[Float], k: Int, metric: String = "cosine",
      idCol: String = "id", embCol: String = "embedding",
      filterJson: Option[String] = None, metadataCol: String = "metadata",
      scoreThreshold: Double = 0.0, roundDecimals: Int = -1): DataFrame = {
    val filtered = filterJson match {
      case Some(f) => corpus.filter(FilterJson.predicate(f, col(metadataCol)))
      case None => corpus
    }
    val q = typedLit(query)
    val dRaw = distance(metric, col(embCol), q)
    val d = if (roundDecimals >= 0) round(dRaw, roundDecimals) else dRaw
    filtered
      .select(col(idCol).as("id"), d.as("distance"))
      .withColumn("score", lit(1.0) / (lit(1.0) + col("distance")))
      .filter(col("score") >= scoreThreshold)
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }
}
