package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BpeDepthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[probe] $n ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    val merges = t("train 3x255")(graft.functions.BpeTokenizer.train(docs, mergesPerRound = 255, rounds = 3))
    println(s"[probe] learned ${merges.size} merges")
    val n = t("apply pass1")(docs.select(graft.functions.BpeTokenizer.tokenCount(col("text"), merges).as("n")).agg(sum("n")).head.getLong(0))
    println(s"[probe] token sum $n")
    t("apply pass2")(docs.select(graft.functions.BpeTokenizer.tokenCount(col("text"), merges).as("n")).agg(sum("n")).head.getLong(0))
    spark.stop()
  }
}
