package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** PCA dimensionality reduction for embedding columns — the
  * store-smaller/search-faster preprocessing step a training-data pipeline
  * runs before indexing (the reference stores raw f32 only; reduction is
  * the natural companion to its quantization utilities,
  * `/root/reference/src/core/vector_ops.rs:349-578`).
  *
  * Train: MLlib PCA (driver-side eigendecomposition of the Gramian — the
  * k×dim component matrix is tiny and deterministic for a fixed corpus).
  * Project: the components ride the plan as literals and each output
  * coordinate is one codegen'd [[VectorExpressions.vecDot]] against the
  * (mean-centered) input — map-only at any scale, no UDF, no MLlib row
  * conversion on the hot path.
  */
object Pca {

  /** Trained model: row-major components (k rows of dim floats) + the
    * training mean (projection centers inputs like MLlib's fit). */
  case class PcaModel(components: Array[Array[Float]], mean: Array[Float],
      explainedVariance: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  /** Fit a k-component PCA on `embCol` (ARRAY<FLOAT>). Training samples
    * at most `trainSize` rows (deterministic head of a vid-ordered sample
    * would bias; MLlib's Gramian uses every passed row, so pass a bounded
    * uniform-ish slice for huge corpora — at 100 TB you fit on a sample,
    * not the corpus). */
  def train(corpus: DataFrame, k: Int, embCol: String = "embedding",
      trainSize: Int = 10000): PcaModel = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.feature.PCA
    // materialize the sample ONCE: an unordered limit() evaluated by two
    // separate jobs (the PCA fit, then the mean aggregate) may pick
    // DIFFERENT rows per job, leaving the stored centering mean mismatched
    // against the fitted components — silent reduction-quality loss
    val sample = corpus.select(col(embCol)).limit(trainSize)
      .select(array_to_vector(col(embCol)).as("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = new PCA().setK(k).setInputCol("features").setOutputCol("pca")
        .fit(sample)
      // column j of the dim×k principalComponents matrix is component j
      val pc = model.pc
      val dim = pc.numRows
      val comps = Array.tabulate(k)(j => Array.tabulate(dim)(i => pc(i, j).toFloat))
      // MLlib PCA does NOT center; compute the mean ourselves so projection
      // can center (standard PCA) — fold into one aggregate pass
      val mean = sample
        .select(org.apache.spark.ml.functions.vector_to_array(col("features")).as("a"))
        .select((0 until dim).map(i => avg(element_at(col("a"), i + 1)).as(s"m$i")): _*)
        .head().toSeq.map(_.asInstanceOf[Double].toFloat).toArray
      PcaModel(comps, mean, model.explainedVariance.toArray)
    } finally sample.unpersist(blocking = false)
  }

  /** Project an embedding column to k coordinates: ONE codegen
    * matrix-vector loop over the component rows (the MatVec kernel,
    * r14 — the former per-component vecDot form re-evaluated the
    * centering subtree k times, the same duplication pathology the OPQ
    * rotation measured at 25x; same arithmetic, one kernel). Returns
    * ARRAY<FLOAT>. */
  def project(model: PcaModel, emb: Column): Column =
    VectorExpressions.matVec(
      zip_with(emb, typedLit(model.mean), (x, m) => x - m),
      model.components)

  /** Save/load the model as a tiny one-row parquet sidecar. */
  def save(spark: org.apache.spark.sql.SparkSession, model: PcaModel,
      path: String): Unit = {
    import spark.implicits._
    Seq((model.components.map(_.toSeq).toSeq, model.mean.toSeq,
        model.explainedVariance.toSeq))
      .toDF("components", "mean", "explained_variance")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PcaModel = {
    val r = spark.read.parquet(path).head()
    // row values come back as collection.Seq (mutable ArraySeq) — typing
    // the elements immutable would CCE on first access
    PcaModel(
      r.getSeq[scala.collection.Seq[Float]](0).map(_.toArray).toArray,
      r.getSeq[Float](1).toArray,
      r.getSeq[Double](2).toArray)
  }
}
