package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the ann_bq_scale shape (bench-session config):
  * isolates the hamming scan, the shortlist aggregate, and the rerank so
  * a slow row can be attributed instead of guessed at. */
object DebugBq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Bq
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = graft.queries.AnnQueries.ensureIvfScaleIndex(spark, sfDir)
    val bqPath = graft.queries.AnnQueries.ensureBqScaleIndex(spark, sfDir)
    val enc = spark.read.parquet(bqPath)
    val corpus = spark.read.parquet(s"$base/data").select(col("id"), col("embedding"))
    val queries = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[debugbq] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    val q = queries.select(col("query_id"), col("q_embedding"),
      Bq.encode(col("q_embedding"), 64).as("q_words"))
    val scored = enc.crossJoin(broadcast(q.select(col("query_id"), col("q_words"))))
      .select(col("query_id"), col("id"),
        Bq.hamming(col("words"), col("q_words")).cast("double").as("distance"))
    time("hamming scan only (agg count+sum)") {
      scored.agg(count(lit(1)), sum("distance")).collect(); 10000000L
    }
    import graft.operators.TopK
    for (sl <- Seq(50, 200)) {
      val short = scored.groupBy("query_id")
        .agg(TopK.topK(sl)(col("id"), col("distance")).as("hits"))
        .select(col("query_id"), explode(col("hits")).as("hit"))
      time(s"+ shortlist topk($sl)") { short.count() }
    }
    time("full searchBatch shortlist=200 (rerank broadcast)") {
      Bq.searchBatch(enc, queries, dim = 64, k = 10, shortlist = 200,
        rerank = Some(corpus)).count()
    }
    time("full searchBatch shortlist=50") {
      Bq.searchBatch(enc, queries, dim = 64, k = 10, shortlist = 50,
        rerank = Some(corpus)).count()
    }
    time("knn_scale reference shape") {
      graft.operators.Knn.batch(corpus, queries, k = 10, metric = "l2",
        roundDecimals = 6).count()
    }
    spark.stop()
  }
}
