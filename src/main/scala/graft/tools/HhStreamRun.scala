package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run probe for the streaming Misra–Gries fold
  * (StreamingHeavyHitters): drive 50 micro-batches of real document text
  * (replicated per scale) through `ingest`, record per batch the wall
  * time and the post-batch STATE ENTRY COUNT — which must sit at ≤ k from
  * the first batch to the last (bounded by construction: the fold
  * compacts at every merge, there is no growth to amortize away) — then
  * recount the folded candidates over the full corpus and assert the
  * answer EQUALS the batch HeavyHitters.exact on the same corpus. Run at
  * 1x and 10x batch size for the scale trend. Results -> SCALING.md. */
object HhStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).agg(sum("id")).collect()

    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val denom = 200L
    val k = 512

    for (scale <- Seq(1, 10)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_hhrun_${scale}x_").toString
      // one source file per micro-batch; real text so the token
      // distribution (and therefore the MG decrement pressure) is the
      // documents table's own
      for (i <- 1 to nBatches) {
        docs.withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
          .select((col("doc_id") + col("rep") * 1000000L
            + lit(i.toLong * 100000000L)).as("doc_id"), col("text"))
          .coalesce(1)
          .write.mode("append").parquet(s"$tmp/src")
      }
      val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Int)]()
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (p.numInputRows > 0)
            rows.add((p.batchId, p.durationMs.get("triggerExecution").toDouble / 1000.0,
              graft.streaming.StreamingHeavyHitters
                .readState(spark, s"$tmp/state").counts.size))
        }
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingHeavyHitters.ingest(
        spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
        denominator = denom, sketchK = k, maxFilesPerTrigger = 1)
      q.processAllAvailable(); q.stop()
      spark.streams.removeListener(listener)
      val total = (System.nanoTime() - t0) / 1e9
      val st = graft.streaming.StreamingHeavyHitters.readState(spark, s"$tmp/state")
      val recs = rows.toArray(Array.empty[(Long, Double, Int)]).sortBy(_._1)
      println(s"[hhrun] === scale=${scale}x batches=$nBatches " +
        f"total=$total%.1fs tokens=${st.n} state_entries=${st.counts.size} ===")
      recs.foreach { case (b, s, e) =>
        println(f"[hhrun] batch=$b%3d wall=$s%6.2fs state_entries=$e%4d")
      }
      val steady = recs.drop(3).map(_._2)
      if (steady.nonEmpty)
        println(f"[hhrun] steady median=${steady.sorted.apply(steady.length / 2)}%.2fs " +
          f"max_entries=${recs.map(_._3).max} (k=$k)")
      // headline equivalence at full corpus scale: stream fold == batch
      val toks = spark.read.parquet(s"$tmp/src").select(
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      val fromStream = graft.streaming.StreamingHeavyHitters
        .heavyHittersFromState(spark, s"$tmp/state", toks, "token", denom)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val fromBatch = graft.operators.HeavyHitters
        .exact(toks, "token", denom, sketchK = k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      println(s"[hhrun] equivalence: ${if (fromStream == fromBatch) "EQUAL"
        else "MISMATCH"} (${fromStream.length} heavy hitters)")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
