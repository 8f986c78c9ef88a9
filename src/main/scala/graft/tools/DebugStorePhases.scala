package graft.tools

import graft.core.Tables
import graft.store.VectorStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (optimization round): per-phase wall timing of the
  * integrity_scan query's store lifecycle, warm (second pass measured).
  */
object DebugStorePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (pass <- 0 to 1) {
      println(s"-- pass $pass --")
      val path = java.nio.file.Files
        .createTempDirectory("graft_dbgstore_").toString
      val store = new VectorStore(spark, path, VectorStore.Config(
        recentThresholdSeconds = 7L * 24 * 3600, nClusters = 8, nProbe = 4))
      val emb = Tables.load(spark, sfDir, "embeddings")
      t("insertDF") {
        store.insertDF(emb.select(
          concat(lit("v"), col("vec_id")).as("id"),
          col("embedding"),
          when(col("vec_id") % 2 === 0, lit("2020-01-01 00:00:00"))
            .otherwise(lit("2026-01-01 23:00:00")).cast("timestamp").as("ts")))
      }
      val now = Some(java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
      t("migrate") { store.migrate(now) }
      t("enableSq") { store.enableSq() }
      t("enableBq") { store.enableBq() }
      t("enablePq") { store.enablePq(m = 4, kCodes = 16, trainSize = 2048) }
      t("enableOpq") { store.enableOpq(m = 4, kCodes = 16, trainSize = 2048, iters = 1) }
      val ts = lit("2026-01-01 23:30:00").cast("timestamp")
      t("plants") {
        emb.filter(col("vec_id") % 37 === 0).select(
            concat(lit("orph"), col("vec_id")).as("id"),
            concat(lit("vidorph"), col("vec_id")).as("vid"),
            ts.as("ts"), array(lit(0L)).as("words"), lit(0L).as("cluster_id"))
          .write.mode("append").partitionBy("cluster_id")
          .parquet(s"$path/bq_codes")
        val wrongDim = emb.filter(col("vec_id") % 17 === 0).select(
          concat(lit("wd"), col("vec_id")).as("id"),
          concat(lit("vidwd"), col("vec_id")).as("vid"),
          array(lit(1.0f), lit(2.0f)).as("embedding"),
          lit(null).cast("string").as("metadata"), ts.as("ts"))
        val dups = emb.filter(col("vec_id") % 2 === 1 && col("vec_id") % 23 === 0)
          .select(concat(lit("v"), col("vec_id")).as("id"),
            concat(lit("viddup"), col("vec_id")).as("vid"),
            col("embedding"), lit(null).cast("string").as("metadata"), ts.as("ts"))
        val cross = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") % 29 === 0)
          .select(concat(lit("v"), col("vec_id")).as("id"),
            concat(lit("vidx"), col("vec_id")).as("vid"),
            col("embedding"), lit(null).cast("string").as("metadata"), ts.as("ts"))
        wrongDim.unionByName(dups).unionByName(cross)
          .write.mode("append").parquet(s"$path/recent")
        emb.filter(col("vec_id") % 31 === 0).select(
            concat(lit("ic"), col("vec_id")).as("id"),
            concat(lit("vidic"), col("vec_id")).as("vid"),
            col("embedding"), lit(null).cast("string").as("metadata"),
            ts.as("ts"), lit(9999).as("cluster_id"))
          .write.mode("append").partitionBy("cluster_id")
          .parquet(s"$path/historical")
      }
      t("checkIntegrity") { store.checkIntegrity() }
      t("cleanup") {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      }
    }
    spark.stop()
  }
}
