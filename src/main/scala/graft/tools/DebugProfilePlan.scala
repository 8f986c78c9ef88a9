package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession

/** Dump the executed plans of Profile.profile's two distinct-count
  * modes over the sf0.01 documents table — the PLANS.md evidence that
  * the default (sketched) mode's exchange carries fixed-size HLL++
  * partials while the exact opt-in pays the Expand + (gid, value)
  * shuffle. */
object DebugProfilePlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val approx = graft.operators.Profile.profile(docs, cols)
    approx.collect()
    println("=== DEFAULT (sketched) profile plan ===")
    println(approx.queryExecution.executedPlan.toString)
    val exact = graft.operators.Profile.profile(docs, cols,
      exactDistinct = true)
    exact.collect()
    println("=== EXACT opt-in profile plan ===")
    println(exact.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
