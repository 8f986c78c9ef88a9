package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-source result merging (SURVEY.md §2.4 A10, `ResultMerger::merge`,
  * `/root/reference/src/hybrid/search_integration.rs:226-295`): combine
  * per-source (id, score, distance) result sets under a strategy. One
  * aggregation, partial-aggregated map-side.
  */
object ResultMerger {

  sealed trait Strategy
  /** Keep the single best (max score) row per id. */
  case object TakeBest extends Strategy
  /** Average score and distance across sources. */
  case object Average extends Strategy
  /** Weighted mean by per-source weight. */
  case class Weighted(weights: Map[String, Double]) extends Strategy
  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09): fused score =
    * sum over sources of 1/(k + rank), rank from (distance asc, id asc)
    * within each source. Rank-based, so heterogeneous scores — BM25 vs a
    * vector distance — fuse with no calibration; the standard combiner for
    * hybrid keyword+vector search. Pass keyword results with
    * `distance = -score` so ascending distance means descending relevance. */
  case class Rrf(k: Int = 60) extends Strategy

  /** `results`: (id, source, score, distance). Returns (id, score,
    * distance) merged per strategy; with `k` set, sorted by score
    * descending and truncated to k rows — the reference merge's final
    * `sort_by(score desc); truncate(k)` (`search_integration.rs:291-294`),
    * with id-ascending tie-break where the reference's unstable float sort
    * leaves tied ranks arbitrary. Likewise TakeBest's score ties: the
    * reference's `max_by` keeps whichever tied occurrence its HashMap
    * iteration saw last (insertion-order-dependent, `:243-250`); a
    * distributed merge has no such order, so ties resolve deterministically
    * to the SMALLER distance — a refinement of an arbitrary choice, not a
    * semantic change. */
  def merge(results: DataFrame, strategy: Strategy,
      k: Option[Int] = None): DataFrame = {
    val merged = strategy match {
    case TakeBest =>
      results.groupBy("id").agg(
        max("score").as("score"),
        min_by(col("distance"), struct(-col("score"), col("distance"))).as("distance"))
    case Average =>
      results.groupBy("id").agg(
        avg("score").as("score"), avg("distance").as("distance"))
    case Weighted(ws) =>
      val wCol = coalesce(
        element_at(typedLit(ws), col("source")), lit(1.0))
      results
        .withColumn("w", wCol)
        .groupBy("id").agg(
          (sum(col("score") * col("w")) / sum("w")).as("score"),
          (sum(col("distance") * col("w")) / sum("w")).as("distance"))
    case Rrf(kc) =>
      // result sets are top-N slices (tiny vs the corpus), so the per-source
      // ranking window is one narrow shuffle on the source key; the fused
      // aggregate partial-aggregates map-side like the other strategies
      val ranked = results.withColumn("rrf_rank",
        row_number().over(Window.partitionBy("source")
          .orderBy(col("distance").asc, col("id").asc)))
      ranked.groupBy("id").agg(
        sum(lit(1.0) / (lit(kc.toDouble) + col("rrf_rank"))).as("score"),
        min("distance").as("distance"))
    }
    // global top-k = orderBy + limit -> TakeOrderedAndProject (heap, no
    // full sort materialization), same as the repo's other top-k tails
    k.fold(merged)(n =>
      merged.orderBy(col("score").desc, col("id").asc).limit(n))
  }
}
