package graft.tools

import graft.core.Tables
import graft.queries.StoreQueries
import graft.store.VectorStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the store_*_scale bench rows: times each tier of
  * the serving composition separately (bench-shaped session). */
object DebugStoreScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).agg(sum("id")).collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val base = t("ensureScaleServingStore")(
      StoreQueries.ensureScaleServingStore(spark, dir))
    val cfg = VectorStore.Config(
      recentThresholdSeconds = 3600, nClusters = 32, nProbe = 4)
    val st = new VectorStore(spark, s"$base/store", cfg)
    val e = Tables.load(spark, dir, "embeddings")
    def qs(offset: Int) = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"),
          x => (x.cast("double") + lit(offset).cast("double") * 0.001)
            .cast("float")).as("q_embedding"))

    for (pass <- 1 to 3) {
      println(s"[scale] === pass $pass ===")
      t("hnsw_recent_only") {
        graft.operators.Hnsw.searchSaved(spark,
          s"$base/store/recent_index/blobs", qs(1), k = 10, efSearch = 120)
          .count()
      }
      t("ivf_hist_only") {
        graft.operators.Ivf.searchBatch(
          st.historical.select(col("id"), col("embedding"), col("cluster_id")),
          st.centroids, qs(1), k = 10, nProbe = 4, "l2").count()
      }
      t("searchBatch_full") {
        st.searchBatch(qs(1), k = 10, metric = "l2", nProbe = 4,
          useRecentIndex = true, recentEfSearch = 120).count()
      }
      t("searchBatchSq_full") {
        st.searchBatchSq(qs(0), k = 10, nProbe = 4, shortlist = 200,
          useRecentIndex = true).count()
      }
    }
    spark.stop()
  }
}
