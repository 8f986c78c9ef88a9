package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Input shapes shared across query modules — single definitions because
  * oracles depend on their exact arithmetic. */
object QueryShapes {

  /** The 50x deterministically-perturbed corpus behind every *_scale query
    * and persisted scale index (100K rows at sf0.1): id = vec_id * 50 + i,
    * every coordinate shifted by i * 0.001. The ann_* self-retrieval
    * oracles assert `id = query vec_id * 50 at distance 0` from this exact
    * recipe — change it only together with those oracle SQL strings. The
    * repartition forces the transform-built (boxed) arrays through an
    * UnsafeRow exchange so distance kernels read primitive floats. */
  def scaleCorpus(e: DataFrame): DataFrame = e
    .select(col("vec_id"), col("embedding"), explode(sequence(lit(0), lit(49))).as("i"))
    .select((col("vec_id") * 50 + col("i")).as("id"),
      transform(col("embedding"),
        x => (x.cast("double") + col("i").cast("double") * 0.001).cast("float"))
        .as("embedding"))
    .repartition(col("id"))

  /** Per-label element-wise mean centroid (A3) as (label, float[]) —
    * DuckDB recomputes it exactly, which is what makes the label-IVF
    * queries oracle-checkable. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg("v").as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x("m").cast("float")).as("centroid"))
}
