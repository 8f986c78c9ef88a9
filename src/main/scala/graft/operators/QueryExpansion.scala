package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query expansion (SURVEY.md §2.8 M13, `QueryExpander::expand`,
  * `/root/reference/src/hybrid/search_integration.rs:452-489`): generate n
  * perturbed variants of each query (+-noise, renormalized to the original
  * magnitude), searched together and merged — a 1->N generator, which in
  * Spark is an `explode` over expression-built variants with seeded rand.
  */
object QueryExpansion {

  /** Expand each (query_id, q_embedding) row into `variants` rows
    * (variant 0 = the original). Noise is hash-derived from
    * (query_id, variant, element, seed) — NOT `rand(seed)`, whose stream
    * depends on partition index and row order, so a repartitioned or
    * re-read input would draw different variants (the partition-variance
    * failure Curation's header documents as the reason nothing there
    * calls rand()). Same draw on every run, any layout. */
  def expand(queries: DataFrame, variants: Int, noise: Double, seed: Long = 42L,
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding"): DataFrame = {
    val expanded = queries
      .select(col(queryIdCol), posexplode(
        transform(sequence(lit(0), lit(variants - 1)), v =>
          struct(v.as("variant"), col(queryEmbCol).as("emb"))))
        .as(Seq("pos", "ve")))
      .select(col(queryIdCol), col("ve.variant").as("variant"), col("ve.emb").as("emb"))
    // per-element noise in [-noise, +noise]; variant 0 untouched; then
    // rescale to the original magnitude (search_integration.rs:472-487)
    def u(i: org.apache.spark.sql.Column) =
      graft.functions.TextFunctions.stableHash32(concat_ws(":",
        col(queryIdCol).cast("string"), col("variant").cast("string"),
        i.cast("string"), lit(seed.toString)))
        .cast("double") / 4294967296.0 * 2.0 - 1.0
    val noisy = expanded.withColumn("noisy",
      when(col("variant") === 0, col("emb")).otherwise(
        transform(col("emb"), (x, i) =>
          (x.cast("double") + u(i) * noise).cast("float"))))
    val origNorm = sqrt(aggregate(col("emb"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    val newNorm = sqrt(aggregate(col("noisy"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    noisy.withColumn(queryEmbCol,
        when(newNorm === 0.0, col("noisy")).otherwise(
          transform(col("noisy"), x => (x.cast("double") * origNorm / newNorm).cast("float"))))
      .select(col(queryIdCol), col("variant"), col(queryEmbCol))
  }
}
