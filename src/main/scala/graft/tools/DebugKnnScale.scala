package graft.tools

import graft.core.Tables
import graft.operators.{Knn, TopK}
import graft.queries.AnnQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for knn_scale: isolates scan, kernel, round, top-k. */
object DebugKnnScale {
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
      println(f"[knn] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val base = AnnQueries.ensureIvfScaleIndex(spark, dir)
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = spark.read.parquet(s"$base/data").select(col("id"), col("embedding"))
    val queries = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    println(s"[knn] corpus scan partitions: " +
      corpus.rdd.getNumPartitions)

    for (pass <- 1 to 3) {
      println(s"[knn] === pass $pass ===")
      t("scan_only")(corpus.agg(sum(length(col("id")))).collect())
      val scoredRaw = corpus.crossJoin(broadcast(queries))
        .select(col("query_id"), col("id"),
          graft.functions.VectorExpressions.vecL2(
            col("embedding"), col("q_embedding")).as("distance"))
      t("kernel_no_round")(scoredRaw.agg(sum("distance")).collect())
      val scoredRound = corpus.crossJoin(broadcast(queries))
        .select(col("query_id"), col("id"),
          round(graft.functions.VectorExpressions.vecL2(
            col("embedding"), col("q_embedding")), 6).as("distance"))
      t("kernel_round")(scoredRound.agg(sum("distance")).collect())
      t("topk_no_round") {
        val topk = TopK.topKStr(10)
        scoredRaw.groupBy("query_id")
          .agg(topk(col("id"), col("distance")).as("hits")).count()
      }
      t("full_query") {
        Knn.batch(corpus, queries, k = 10, metric = "l2", roundDecimals = 6)
          .select(col("query_id"), col("id"), col("distance"),
            col("rank").cast("long").as("rank"))
          .orderBy("query_id", "rank").count()
      }
    }
    spark.stop()
  }
}
