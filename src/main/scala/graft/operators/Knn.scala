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
    // string ids ride through the aggregate natively (no surrogate remap)
    val topk =
      if (corpus.schema(idCol).dataType == org.apache.spark.sql.types.StringType)
        TopK.topKStr(k)
      else TopK.topK(k)
    scored
      .groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).as("rank"))
  }

  /** Single-query search (the reference's `session.search` shape,
    * `bindings/node/src/session.rs:203-336`): returns (id, distance, score)
    * with optional score threshold (F9, applied only when given — the
    * reference thresholds non-negative Euclidean distances, so a default
    * threshold of 0 must not filter).
    *
    * score = 1/(1+distance) for non-negative-distance metrics (M7,
    * `vector_ops.rs`); for `dot` the distance is -dot (can be any real, and
    * 1/(1+d) blows up at d = -1), so score = sigmoid(dot) — same (0,1]
    * range, same monotonicity in similarity. */
  def search(corpus: DataFrame, query: Array[Float], k: Int, metric: String = "cosine",
      idCol: String = "id", embCol: String = "embedding",
      filterJson: Option[String] = None, metadataCol: String = "metadata",
      scoreThreshold: Option[Double] = None, roundDecimals: Int = -1,
      carryCols: Seq[String] = Nil): DataFrame = {
    val filtered = filterJson match {
      case Some(f) => corpus.filter(FilterJson.predicate(f, col(metadataCol)))
      case None => corpus
    }
    val q = typedLit(query)
    val dRaw = distance(metric, col(embCol), q)
    val d = if (roundDecimals >= 0) round(dRaw, roundDecimals) else dRaw
    // carryCols ride THROUGH the TakeOrdered top-k (k rows, so the wider
    // heap rows are free) — the caller that wants hit metadata/vectors
    // avoids a second full corpus scan + join to re-fetch them
    val scored = filtered
      .select((Seq(col(idCol).as("id"), d.as("distance")) ++
        carryCols.map(col)): _*)
      .withColumn("score",
        if (metric == "dot") lit(1.0) / (lit(1.0) + exp(col("distance")))
        else lit(1.0) / (lit(1.0) + col("distance")))
    scoreThreshold.fold(scored)(t => scored.filter(col("score") >= t))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }
}
