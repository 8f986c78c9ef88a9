package graft.streaming

import graft.operators.Profile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (optimization round): split applyBatch's per-micro-batch
  * cost into state-read / per-batch aggregate / state-write legs, warm.
  * Lives in graft.streaming for access to the private[streaming] pieces.
  */
object DebugApplyBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dbgab_").toString
    graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("n_chars").cast("long").as("value"))
      .repartition(4).write.parquet(s"$tmp/src")
    val batch = spark.read.parquet(s"$tmp/src")
    def t(label: String, n: Int = 10)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      println(f"[leg] $label%-34s ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/op")
    }
    t("Profile.moments(batch).head()") {
      StreamingMoments.momentsFromRow(
        Profile.moments(batch, "value").head(), 0, "dbg")
    }
    t("readState") {
      StreamingMoments.readState(spark, s"$tmp/state")
    }
    val snap = StreamingMoments.MomentsSnapshot("value", "ck", 0L,
      StreamingMoments.Moments(10L, 0L, 1L, 2L, BigInt(3), BigInt(4)))
    t("applyBatch-equivalent writeState") {
      // writeState is private; mergeStates path writes too — use the
      // state file through a fresh merge-shaped write each op
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = m.createObjectNode()
      root.put("value_col", snap.valueCol); root.put("checkpoint", snap.checkpoint)
      root.put("batch_id", snap.lastBatchId)
      StreamingMoments.putMoments(root, snap.moments)
      new graft.core.SwapStateFile(
        new org.apache.hadoop.fs.Path(s"$tmp/state", "moments_state.json")
          .getFileSystem(spark.sparkContext.hadoopConfiguration),
        s"$tmp/state", "moments_state.json", "moments_state.swap.inprogress",
        "moments state").write(m.writeValueAsBytes(root))
    }
    t("bare agg head() on cached tiny df") {
      spark.range(100).agg(sum(col("id"))).head()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
