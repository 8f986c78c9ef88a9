package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF tier: train/assign/partitioned-write/probe-search, recall vs exact
  * ground truth (the reference's own quality gate,
  * `/root/reference/src/ivf/operations.rs:329-391`).
  */
class IvfSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
  private lazy val centroids = Ivf.train(corpus, Ivf.IvfConfig(nClusters = 10, maxIterations = 10)).cache()

  test("train produces k centroids of the right dimension") {
    assert(centroids.count() == 10)
    val dims = centroids.select(size(col("centroid"))).distinct().collect().map(_.getInt(0))
    assert(dims.sameElements(Array(64)))
  }

  test("assign gives every vector a valid cluster and respects nearest-centroid") {
    val assigned = Ivf.assign(corpus, centroids).cache()
    assert(assigned.count() == corpus.count())
    assert(assigned.filter(col("cluster_id").isNull).count() == 0)
    // nearest-centroid invariant on a sample: assigned distance <= distance
    // to every other centroid
    val sample = assigned.limit(20)
      .join(broadcast(centroids), "cluster_id")
      .select(Knn.distance("l2", col("embedding"), col("centroid")).as("own"))
      .collect().map(_.getDouble(0))
    val minAll = assigned.limit(20)
      .crossJoin(broadcast(centroids))
      .groupBy("id").agg(min(Knn.distance("l2", col("embedding"), col("centroid"))).as("best"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(sample.sorted.zip(minAll.sorted).forall { case (o, b) => math.abs(o - b) < 1e-9 })
  }

  test("full-probe IVF search equals exact search (recall 1.0)") {
    val assigned = Ivf.assign(corpus, centroids)
    val approx = Ivf.searchBatch(assigned, centroids, queries, k = 10, nProbe = 10)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val r = Ivf.evaluateRecall(approx, exact).head()
    assert(r.getDouble(0) == 1.0, s"full-probe recall ${r.getDouble(0)}")
    assert(r.getLong(1) == 5)
  }

  test("n_probe=3 search has reasonable recall and scans fewer rows") {
    val assigned = Ivf.assign(corpus, centroids)
    val approx = Ivf.searchBatch(assigned, centroids, queries, k = 10, nProbe = 3)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    assert(recall >= 0.5, s"nProbe=3 recall too low: $recall")
  }

  test("partitioned write prunes unprobed clusters at scan time") {
    val assigned = Ivf.assign(corpus, centroids)
    val path = "/tmp/graft_test_ivf_table"
    Ivf.writePartitioned(assigned, path)
    val table = spark.read.parquet(path)
    val pruned = table.filter(col("cluster_id").isin(1, 2))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filters present on cluster_id -> parquet directory pruning
    assert(scan.contains("PartitionFilters") && scan.contains("cluster_id"), scan)
    val expected = assigned.filter(col("cluster_id").isin(1, 2)).count()
    assert(pruned.count() == expected)
  }

  test("searchBatch against a partitioned table prunes unprobed partitions") {
    val assigned = Ivf.assign(corpus, centroids)
    val path = "/tmp/graft_test_ivf_search_table"
    Ivf.writePartitioned(assigned, path)
    val table = spark.read.parquet(path)
    val res = Ivf.searchBatch(table, centroids, queries.limit(1), k = 5, nProbe = 2)
    res.collect()
    val scans = res.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val scan = scans.find(_.contains("graft_test_ivf_search_table")).get
    assert(scan.contains("PartitionFilters") && scan.contains("cluster_id"), scan)
    // the in filter must appear in the partition filters, i.e. static pruning
    assert(scan.matches("(?s).*PartitionFilters: \\[.*cluster_id.* IN \\(.*\\).*"), scan)
  }

  test("cluster stats aggregate") {
    val assigned = Ivf.assign(corpus, centroids)
    val r = Ivf.clusterStats(assigned).head()
    assert(r.getLong(0) == 10)
    assert(r.getLong(1) == corpus.count())
  }

  test("cluster stats with configured range count empty slots (reference rule)") {
    // ivf/operations.rs:269-280: sizes default to 0 over 0..n_clusters-1
    val assigned = Ivf.assign(corpus, centroids)
    val r = Ivf.clusterStats(assigned, nClusters = 12).head()
    assert(r.getLong(0) == 12)                      // n_clusters = configured
    assert(r.getLong(1) == corpus.count())          // total unchanged
    assert(r.getLong(5) == 0)                       // min_size: an empty slot
    assert(r.getLong(6) == 2)                       // empty_clusters
    val obs = Ivf.clusterStats(assigned).head()
    // the zeros drag the mean down and (here) spread the variance out
    assert(r.getDouble(2) < obs.getDouble(2))
  }

  test("evaluateRecall: reference precision formulas incl. empty-result 0.0") {
    // ivf/operations.rs:356-377 — precision = matches/|returned|, an
    // empty result set scores 0.0 (not NaN/skip)
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("query_id", "id")
    val approx = Seq((1L, 10L), (1L, 99L)).toDF("query_id", "id") // q2 empty
    val r = Ivf.evaluateRecall(approx, exact).head()
    assert(math.abs(r.getDouble(0) - 0.25) < 1e-9)  // (1/2 + 0) / 2
    assert(r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-9)  // (1/2 + 0.0) / 2
  }
}
