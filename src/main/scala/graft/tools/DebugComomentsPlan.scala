package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: dump the per-batch co-moments aggregate plans (flat +
  * grouped) for the PLANS.md audit — the same shape the streaming folds
  * run per micro-batch. */
object DebugComomentsPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("n_chars").cast("long").as("x"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("y"))
    println("=== flat comoments ===")
    val flat = graft.operators.Profile.comoments(docs, "x", "y")
    flat.head() // realize the AQE final plan before explaining
    flat.explain()
    println("=== grouped comoments ===")
    val grouped = graft.operators.Profile
      .comomentsPerGroup(docs, "source", "x", "y")
    grouped.head()
    grouped.explain()
    spark.stop()
  }
}
