package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (optimization round): isolate the fixed per-action cost a
  * trivial aggregate pays under different session configs — AQE on/off,
  * shuffle partition count, core count — to find where the ~90 ms/op goes.
  */
object DebugActionOverhead {
  def main(args: Array[String]): Unit = {
    val variants = Seq(
      ("aqe=on  sp=32 local[32]", "32", "32", "true"),
      ("aqe=off sp=32 local[32]", "32", "32", "false"),
      ("aqe=on  sp=1  local[32]", "32", "1", "true"),
      ("aqe=on  sp=32 local[8] ", "8", "32", "true"),
      ("aqe=off sp=1  local[8] ", "8", "1", "false"))
    variants.foreach { case (label, cores, sp, aqe) =>
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", sp)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def op(): Unit = { spark.range(100).agg(sum(col("id"))).head(); () }
      (0 until 20).foreach(_ => op()) // warm
      val t0 = System.nanoTime()
      (0 until 50).foreach(_ => op())
      val ms = (System.nanoTime() - t0) / 1e6 / 50
      // also: a pure RDD job with one task, no SQL layer at all
      val rdd = spark.sparkContext.parallelize(1 to 100, 1)
      (0 until 20).foreach(_ => rdd.count())
      val t1 = System.nanoTime()
      (0 until 50).foreach(_ => rdd.count())
      val rddMs = (System.nanoTime() - t1) / 1e6 / 50
      println(f"[variant] $label  sqlAgg=$ms%.1f ms/op  rddCount=$rddMs%.1f ms/op")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
