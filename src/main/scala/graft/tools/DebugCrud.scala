package graft.tools

import graft.core.Tables
import graft.store.VectorStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the crud_lifecycle bench row: times each store
  * call of the lifecycle separately (bench-shaped session). */
object DebugCrud {
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
      println(f"[crud] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    for (pass <- 1 to 2) {
      println(s"[crud] === pass $pass ===")
      val path = java.nio.file.Files.createTempDirectory("graft_crud_dbg_").toString
      val store = new VectorStore(spark, path)
      val recs = t("collect+records") {
        Tables.load(spark, dir, "embeddings").collect().map { r =>
          VectorStore.VectorRecord(s"v${r.getLong(0)}",
            r.getSeq[Float](1).toArray,
            Some(s"""{"label": ${r.getInt(2)}}"""))
        }.toSeq
      }
      t("insert")(store.insert(recs))
      t("deleteByMetadata")(store.deleteByMetadata("""{"label": {"$gte": 7}}"""))
      t("vacuum")(store.vacuum())
      t("stats")(store.stats())
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    }
    spark.stop()
  }
}
