package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the decontaminate plan (Test scope, not shipped). */
object CurationDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("DBG_MPB", "128m"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("DBG_OCB", "4m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    sys.env.get("DBG_ENSURE").foreach { which =>
      if (which.contains("hnsw")) time("ensureHnsw")(
        graft.queries.AnnQueries.ensureHnswScaleIndex(spark, dir))
      if (which.contains("ivf")) time("ensureIvf")(
        graft.queries.AnnQueries.ensureIvfScaleIndex(spark, dir))
      if (which.contains("store")) time("ensureStore")(
        graft.queries.StoreQueries.ensureServingStore(spark, dir))
    }
    import graft.functions.TextFunctions._
    val train = Dedup.spread(docs.filter(col("doc_id") % 97 =!= 0))
      .select(col("doc_id"), array_distinct(shingleHashes(col("text"), 2)).as("hs"))
    time("train hash+explode count") {
      println(train.select(explode(col("hs"))).count())
    }
    val evalH = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"),
        explode(array_distinct(shingleHashes(col("text"), 2))).as("h"))
    time("eval count")(println(evalH.count()))
    val trainH = train.select(col("doc_id"), size(col("hs")).as("n_sh"), explode(col("hs")).as("h"))
    time("join count") {
      println(trainH.join(broadcast(evalH), Seq("h")).count())
    }
    time("full pairs") {
      println(Curation.contaminationPairs(docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0).select(col("doc_id").as("eval_id"), col("text")),
        2, 0.2).count())
    }
    time("full pairs again") {
      println(Curation.contaminationPairs(docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0).select(col("doc_id").as("eval_id"), col("text")),
        2, 0.2).count())
    }
    spark.stop()
  }
}

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Dedup.prepPipeline(docs, 0.3, "en", 2, 4, 2, 0.3)
    println("=== optimized ===")
    println(df.queryExecution.optimizedPlan.treeString.take(3000))
    spark.stop()
  }
}
