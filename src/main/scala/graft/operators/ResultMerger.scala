package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** `results`: (id, source, score, distance). Returns (id, score,
    * distance) merged per strategy. */
  def merge(results: DataFrame, strategy: Strategy): DataFrame = strategy match {
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
  }
}
