package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF maintenance: retrain (X8), cluster balancing (X9), centroid
  * export/import (X10).
  */
class IvfMaintenanceSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val corpus = emb.select(col("vec_id").as("id"), col("embedding")).cache()

  test("retrain with a new cluster count reassigns everything") {
    val (c1, a1) = Ivf.retrain(corpus, Ivf.IvfConfig(nClusters = 4, maxIterations = 5))
    assert(c1.count() == 4)
    assert(a1.count() == corpus.count())
    val (c2, a2) = Ivf.retrain(a1, Ivf.IvfConfig(nClusters = 8, maxIterations = 5))
    assert(c2.count() == 8)
    assert(a2.select("cluster_id").distinct().count() <= 8)
    assert(a2.count() == corpus.count())
  }

  test("balance caps oversized clusters and moves overflow to second-nearest") {
    val cents = Ivf.train(corpus, Ivf.IvfConfig(nClusters = 5, maxIterations = 10))
    val assigned = Ivf.assign(corpus, cents).cache()
    val maxSize = 60
    val balanced = Ivf.balance(assigned, cents, maxSize).cache()
    assert(balanced.count() == assigned.count())
    val sizes = balanced.groupBy("cluster_id").count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    val origSizes = assigned.groupBy("cluster_id").count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    // every originally-oversized cluster shrank to exactly maxSize... unless
    // it RECEIVED overflow from another oversized cluster; assert no cluster
    // grew except by receiving, and previously-small clusters only grow
    origSizes.filter(_._2 > maxSize).foreach { case (cid, _) =>
      val moved = assigned.filter(col("cluster_id") === cid).count() -
        balanced.filter(col("cluster_id") === cid)
          .join(assigned.filter(col("cluster_id") === cid).select("id"), Seq("id"), "left_semi")
          .count()
      assert(moved > 0, s"oversized cluster $cid moved nothing")
    }
    assigned.unpersist(); balanced.unpersist()
  }

  test("centroid export/import round-trip validates dimension") {
    val cents = Ivf.train(corpus, Ivf.IvfConfig(nClusters = 3, maxIterations = 5))
    val p = java.nio.file.Files.createTempDirectory("graft_cent_").toString + "/c"
    Ivf.exportCentroids(cents, p)
    val back = Ivf.importCentroids(spark, p, expectedDim = 64)
    assert(back.count() == 3)
    intercept[IllegalArgumentException] {
      Ivf.importCentroids(spark, p, expectedDim = 128)
    }
  }
}
