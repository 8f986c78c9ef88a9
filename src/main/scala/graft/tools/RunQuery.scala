package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run named SparkEntry queries against an sf dir and print
  * the result (and optionally the formatted plan) — the local inner loop
  * for one query, without a full Verify/Bench sweep.
  *
  * {{{ sbt "runMain graft.tools.RunQuery /root/testdata/sf0.01 knn_l2 [--explain] [--time]" }}}
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    require(rest.length >= 2, "usage: RunQuery <sfDir> <query>... [--explain] [--time]")
    val sfDir = rest.head
    val names = rest.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (flags.contains("--explain")) df.explain("formatted")
      df.show(30, truncate = false)
      if (flags.contains("--time")) {
        // second run = warm number (first pass paid codegen/footer costs)
        val t1 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[$name] first=${(t1 - t0) / 1e9}%.2fs warm=${(System.nanoTime() - t1) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
