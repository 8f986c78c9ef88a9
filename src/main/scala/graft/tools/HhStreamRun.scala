package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run probe for the streaming Misra–Gries folds
  * (StreamingHeavyHitters / StreamingGroupedHeavyHitters): drive
  * micro-batches of real document text (replicated per scale) through
  * `ingest`, record per batch the wall time and the post-batch STATE
  * ENTRY COUNT — which must sit at ≤ k (flat) / ≤ groups × k (grouped)
  * from the first batch to the last (bounded by construction: the fold
  * compacts at every merge, there is no growth to amortize away) — then
  * recount the folded candidates over the full corpus and assert the
  * answer EQUALS the batch operator on the same corpus. Scales via
  * SPARK_GRAFT_HH_SCALES (default "1,10"; r13 adds the 100x third
  * decade), batches via SPARK_GRAFT_LONGRUN_BATCHES, grouped mode via
  * SPARK_GRAFT_HH_GROUPED=1. Results -> SCALING.md. */
object HhStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_HH_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val grouped = sys.env.get("SPARK_GRAFT_HH_GROUPED").contains("1")
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

    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val denom = if (grouped) 100L else 200L
    val k = if (grouped) 256 else 512
    val tag = if (grouped) "hhrun-grouped" else "hhrun"

    for (scale <- scales) {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_").toString
      // one source file per micro-batch; real text so the token
      // distribution (and therefore the MG decrement pressure) is the
      // documents table's own
      for (i <- 1 to nBatches) {
        docs.withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
          .select((col("doc_id") + col("rep") * 1000000L
            + lit(i.toLong * 100000000L)).as("doc_id"),
            col("source"), col("text"))
          .coalesce(1)
          .write.mode("append").parquet(s"$tmp/src")
      }
      val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Int)]()
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (p.numInputRows > 0) {
            // the LINEARIZABLE read (r13): the lock-free readState is
            // loud-by-design under read/commit contention, and Spark
            // swallows listener exceptions — a thrown read would silently
            // drop this batch's sample from the SCALING.md data. The
            // locked read can't hit the contention error; any residual
            // failure is recorded as a -1 sentinel, never dropped.
            val entries =
              try {
                if (grouped)
                  graft.streaming.StreamingGroupedHeavyHitters
                    .readStateLocked(spark, s"$tmp/state").totalEntries
                else
                  graft.streaming.StreamingHeavyHitters
                    .readStateLocked(spark, s"$tmp/state").counts.size
              } catch { case scala.util.control.NonFatal(_) => -1 }
            rows.add((p.batchId,
              p.durationMs.get("triggerExecution").toDouble / 1000.0,
              entries))
          }
        }
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      val q =
        if (grouped)
          graft.streaming.StreamingGroupedHeavyHitters.ingest(
            spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
            denominator = denom, sketchK = k, maxFilesPerTrigger = 1)
        else
          graft.streaming.StreamingHeavyHitters.ingest(
            spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
            denominator = denom, sketchK = k, maxFilesPerTrigger = 1)
      q.processAllAvailable(); q.stop()
      spark.streams.removeListener(listener)
      val total = (System.nanoTime() - t0) / 1e9
      val recs = rows.toArray(Array.empty[(Long, Double, Int)]).sortBy(_._1)
      val dropped = recs.count(_._3 < 0)
      if (grouped) {
        val st = graft.streaming.StreamingGroupedHeavyHitters
          .readState(spark, s"$tmp/state")
        println(s"[$tag] === scale=${scale}x batches=$nBatches " +
          f"total=$total%.1fs groups=${st.groups.size} " +
          f"state_entries=${st.totalEntries} dropped_samples=$dropped ===")
      } else {
        val st = graft.streaming.StreamingHeavyHitters
          .readState(spark, s"$tmp/state")
        println(s"[$tag] === scale=${scale}x batches=$nBatches " +
          f"total=$total%.1fs tokens=${st.n} " +
          f"state_entries=${st.counts.size} dropped_samples=$dropped ===")
      }
      recs.foreach { case (b, s, e) =>
        println(f"[$tag] batch=$b%3d wall=$s%6.2fs state_entries=$e%4d")
      }
      val steady = recs.drop(3).map(_._2)
      if (steady.nonEmpty)
        println(f"[$tag] steady median=${steady.sorted.apply(steady.length / 2)}%.2fs " +
          f"max_entries=${recs.map(_._3).max} (k=$k)")
      // headline equivalence at full corpus scale: stream fold == batch
      val corpus = spark.read.parquet(s"$tmp/src")
      if (grouped) {
        val toks = corpus.select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
        val fromStream = graft.streaming.StreamingGroupedHeavyHitters
          .heavyHittersFromState(spark, s"$tmp/state", toks, "source", "token", denom)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        val fromBatch = graft.operators.HeavyHitters
          .exactPerGroup(toks, "source", "token", denom, sketchK = k)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        println(s"[$tag] equivalence: ${if (fromStream == fromBatch) "EQUAL"
          else "MISMATCH"} (${fromStream.length} grouped heavy hitters)")
      } else {
        val toks = corpus.select(
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
        val fromStream = graft.streaming.StreamingHeavyHitters
          .heavyHittersFromState(spark, s"$tmp/state", toks, "token", denom)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val fromBatch = graft.operators.HeavyHitters
          .exact(toks, "token", denom, sketchK = k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        println(s"[$tag] equivalence: ${if (fromStream == fromBatch) "EQUAL"
          else "MISMATCH"} (${fromStream.length} heavy hitters)")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
