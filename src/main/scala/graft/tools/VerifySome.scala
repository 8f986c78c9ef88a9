package graft.tools

import org.apache.spark.sql.SparkSession

/** Local slice of the Verify dump: run only the named queries (all when
  * none given) against a sf dir — for iterating on a new oracle pair
  * without paying the full 60-query sweep. Same session shape as Verify. */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          println(s"[verifysome] $name ok")
        } catch { case e: Throwable =>
          println(s"[verifysome] $name FAILED: ${e.getMessage}")
        }
      }
    val sqls = graft.SparkEntry.oracleSql
      .filter { case (n, _) => names.isEmpty || names(n) }
    // one file per oracle — trivially readable from python without JSON escaping
    sqls.foreach { case (n, sql) =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$n.sql"), sql)
    }
    spark.stop()
  }
}
