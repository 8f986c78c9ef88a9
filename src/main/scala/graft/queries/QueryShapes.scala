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
    * queries oracle-checkable. One hash aggregate with dim column-avg
    * slots instead of posexplode + two shuffles + collect_list sort:
    * same arithmetic (per-element double avg, cast float), one pass.
    * The slot count comes from the first row's embedding (vectors are
    * dense and uniform — the kernels throw on mismatch anyway), so the
    * aggregate stays dimension-generic. */
  def labelCentroids(emb: DataFrame): DataFrame = {
    val first = emb.select(size(col("embedding"))).head(1)
    // no rows -> no centroids (empty frame with the right shape), matching
    // what a groupBy over an empty input would have produced
    val dim = if (first.isEmpty) 0 else first.head.getInt(0)
    emb.groupBy("label").agg(
      array((0 until dim).map(i =>
        avg(col("embedding").getItem(i)).cast("float")): _*).as("centroid"))
  }

  // Centroid training is index state: computed once per (corpus, subset)
  // and then served, exactly like the persisted scale indexes amortize
  // graph/inverted-file construction (the reference trains its coarse
  // quantizer once too). The cache key embeds the sf dir, so different
  // corpora never share centroids within one JVM.
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Int, Array[Float])]]()

  /** Driver-cached (label, centroid) pairs, sorted by label. `cents` is a
    * [[labelCentroids]]-shaped frame, evaluated only on cache miss. */
  def cachedLabelCentroids(key: String, cents: => DataFrame): Array[(Int, Array[Float])] =
    centroidCache.computeIfAbsent(key, _ =>
      cents.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1))

  /** The cached centroids re-wrapped as a local relation (no Spark job on
    * the warm path; broadcast directly from the driver arrays). */
  def labelCentroidsDF(s: org.apache.spark.sql.SparkSession, key: String,
      cents: => DataFrame): DataFrame = {
    import s.implicits._
    cachedLabelCentroids(key, cents).toSeq.toDF("label", "centroid")
  }
}
