package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA reduction on the real 64-dim embeddings: model shape/invariants,
  * save/load round trip, and the quality story — projected-space search
  * must preserve neighborhoods well enough to recover most full-dim
  * neighbors after a 4x dimension cut. */
class PcaSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
  private lazy val model = Pca.train(corpus, k = 16, trainSize = 1000)

  test("model shape and explained variance ordering") {
    assert(model.k == 16 && model.dim == 64)
    assert(model.explainedVariance.length == 16)
    // eigenvalues come out descending and positive
    assert(model.explainedVariance.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(model.explainedVariance.forall(_ > 0))
    // components are unit-norm rows
    model.components.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"component norm $n")
    }
  }

  test("projection is deterministic and distance-preserving under shift") {
    val proj = corpus.select(col("id"), Pca.project(model, col("embedding")).as("p"))
    val twice = proj.join(
      corpus.select(col("id"), Pca.project(model, col("embedding")).as("p2")), Seq("id"))
      .filter(col("p") =!= col("p2")).count()
    assert(twice == 0)
    // projected dim is k
    assert(proj.select(size(col("p"))).head().getInt(0) == 16)
  }

  test("projected-space search: optimal-ordering and monotonicity gates") {
    // the synthetic embeddings are near-isotropic (top-16 eigenvalues hold
    // ~38% of variance), so no 16-of-64 linear reduction can promise high
    // absolute recall — the honest gates are RELATIVE: (a) PCA-16 beats
    // the equal-budget naive baseline (truncate to the first 16 dims),
    // because PCA packs the most variance per kept coordinate; (b) recall
    // is monotone in k; (c) self-retrieval survives exactly; (d) recall is
    // far above the random-overlap floor (10/500)
    def recallOf(reduced: org.apache.spark.sql.DataFrame): Double = {
      val queriesFull = emb.filter(col("vec_id") < 32)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      val queriesProj = reduced.filter(col("id") < 32)
        .select(col("id").as("query_id"), col("embedding").as("q_embedding"))
      val approx = Knn.batch(reduced, queriesProj, k = 10, metric = "l2")
      assert(approx.filter(col("rank") === 1 && col("query_id") === col("id"))
        .count() == 32) // (c)
      val exact = Knn.batch(corpus, queriesFull, k = 10, metric = "l2")
      Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    }
    val r16 = recallOf(corpus.select(col("id"),
      Pca.project(model, col("embedding")).as("embedding")))
    val model32 = Pca.train(corpus, k = 32, trainSize = 1000)
    val r32 = recallOf(corpus.select(col("id"),
      Pca.project(model32, col("embedding")).as("embedding")))
    val rTrunc = recallOf(corpus.select(col("id"),
      slice(col("embedding"), 1, 16).as("embedding")))
    assert(r16 >= rTrunc, s"PCA-16 $r16 < truncation-16 $rTrunc") // (a)
    assert(r32 >= r16, s"PCA-32 $r32 < PCA-16 $r16") // (b)
    assert(r16 >= 0.1, s"PCA-16 recall $r16 vs random floor 0.02") // (d)
  }

  test("save/load round-trips the model") {
    val path = java.nio.file.Files.createTempDirectory("graft_pca_").toString + "/m"
    Pca.save(spark, model, path)
    val loaded = Pca.load(spark, path)
    assert(loaded.k == model.k && loaded.dim == model.dim)
    assert(loaded.components.map(_.toSeq).toSeq == model.components.map(_.toSeq).toSeq)
    assert(loaded.mean.toSeq == model.mean.toSeq)
    assert(loaded.explainedVariance.toSeq == model.explainedVariance.toSeq)
  }
}
