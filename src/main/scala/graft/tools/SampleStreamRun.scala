package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run pricing probe for the streaming bottom-k sample folds
  * ([[graft.streaming.StreamingSample]] /
  * [[graft.streaming.StreamingGroupedSample]]) — the r14 HH methodology
  * applied to the sampling face: drive 50 micro-batches of real document
  * ids+values (replicated per scale decade), record per batch the trigger
  * wall time and the post-batch state entry count (which must sit at ≤ k,
  * or ≤ groups × k grouped, from the first batch to the last — the fold
  * merges to the k smallest every batch, there is no growth to amortize),
  * then the final state-file byte size, and assert the drained fold
  * EQUALS the one-shot batch bottom-k over the whole staged corpus
  * (semilattice exactness, not sampled spot-checks).
  *
  * Legs via env:
  *   SPARK_GRAFT_SAMPLE_SCALES  (default "1,10")    corpus decades
  *   SPARK_GRAFT_SAMPLE_KS      (default "32,1024") k decades
  *   SPARK_GRAFT_SAMPLE_GROUPED=1                   per-source fold
  *   SPARK_GRAFT_SAMPLE_GROUPS=N                    width leg: N synthetic
  *     sources (the HhStreamRun stride-walked residue ring, so the state
  *     genuinely accumulates N groups) — prices the groups × k state and
  *     the per-batch driver fold at e.g. the 10,000-group default cap
  *   SPARK_GRAFT_SAMPLE_POLL_MS=M                   hot locked-read poller
  *   SPARK_GRAFT_LONGRUN_BATCHES (default 50)
  * Results -> SCALING.md.
  */
object SampleStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val ks = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_KS", "32,1024")
      .split(",").map(_.trim.toInt).toSeq
    val grouped = sys.env.get("SPARK_GRAFT_SAMPLE_GROUPED").contains("1")
    val widthGroups = sys.env.get("SPARK_GRAFT_SAMPLE_GROUPS").map(_.toInt)
    val pollMs = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_POLL_MS", "0").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).agg(sum("id")).collect()

    val baseDocs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("double").as("value"))
    val tag = (if (grouped) "samplerun-grouped" else "samplerun") +
      widthGroups.filter(_ => grouped).map(g => s"-w$g").getOrElse("")
    val stateName =
      if (grouped) "sample_grouped_state.json" else "sample_state.json"
    // width mode: the HhStreamRun residue-ring walk — g synthetic sources
    // with a per-batch g-coprime stride so the STATE accumulates g groups
    // within the first few batches even when |docs| < g
    def widthStride(g: Int): Long =
      Iterator.from(4999).find(s => BigInt(s).gcd(BigInt(g)) == 1).get.toLong
    def widthSource(g: Int, batchId: Int) =
      concat(lit("src_"),
        pmod(col("doc_id") + lit(batchId.toLong * widthStride(g)),
          lit(g.toLong)).cast("string"))

    def runLeg(scale: Int, k: Int, poll: Boolean): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_k${k}_").toString
      try {
        // one source file per micro-batch; ids disjoint per batch and per
        // replica so the distinct-id universe genuinely grows with the
        // stream (the case the bottom-k must stay O(k) against)
        for (i <- 1 to nBatches) {
          val srcCol = widthGroups match {
            case Some(g) if grouped => widthSource(g, i)
            case _ => col("source")
          }
          baseDocs.withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
            .select((col("doc_id") + col("rep") * 1000000L
              + lit(i.toLong * 100000000L)).as("doc_id"),
              srcCol.as("source"), col("value"))
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
              val entries =
                try {
                  if (grouped)
                    graft.streaming.StreamingGroupedSample
                      .readStateLocked(spark, s"$tmp/state").totalEntries
                  else
                    graft.streaming.StreamingSample
                      .readStateLocked(spark, s"$tmp/state").entries.size
                } catch { case scala.util.control.NonFatal(_) => -1 }
              rows.add((p.batchId,
                p.durationMs.get("triggerExecution").toDouble / 1000.0,
                entries))
            }
          }
        }
        val pollLat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val pollErr = new java.util.concurrent.atomic.AtomicInteger(0)
        @volatile var polling = poll
        val poller = new Thread(() => {
          while (polling) {
            val t0 = System.nanoTime()
            try {
              if (grouped)
                graft.streaming.StreamingGroupedSample
                  .readStateLocked(spark, s"$tmp/state")
              else
                graft.streaming.StreamingSample
                  .readStateLocked(spark, s"$tmp/state")
              pollLat.add(System.nanoTime() - t0)
            } catch { case scala.util.control.NonFatal(_) =>
              pollErr.incrementAndGet() }
            try Thread.sleep(pollMs)
            catch { case _: InterruptedException => polling = false }
          }
        }, "samplerun-locked-poller")
        poller.setDaemon(true)
        spark.streams.addListener(listener)
        val t0 = System.nanoTime()
        val q =
          if (grouped)
            graft.streaming.StreamingGroupedSample.ingest(spark,
              s"$tmp/src", s"$tmp/state", s"$tmp/chk", k = k,
              valueCol = Some("value"), maxFilesPerTrigger = 1)
          else
            graft.streaming.StreamingSample.ingest(spark, s"$tmp/src",
              s"$tmp/state", s"$tmp/chk", k = k,
              idCol = "doc_id", valueCol = Some("value"),
              maxFilesPerTrigger = 1)
        if (poll) poller.start()
        try q.processAllAvailable()
        finally {
          q.stop()
          polling = false
          if (poll) { poller.interrupt(); poller.join(5000) }
          spark.streams.removeListener(listener)
        }
        val total = (System.nanoTime() - t0) / 1e9
        val stateBytes = new java.io.File(s"$tmp/state/$stateName").length()
        val recs = rows.toArray(Array.empty[(Long, Double, Int)]).sortBy(_._1)
        val dropped = recs.count(_._3 < 0)
        val mode = if (poll) s"poll=${pollMs}ms" else "poll=off"
        // the exactness cross-check on the drained stream (skipped in
        // poll mode — the poll leg prices contention, not correctness)
        val equal =
          if (poll) "skipped"
          else {
            val corpus = spark.read.parquet(s"$tmp/src")
            if (grouped) {
              val st = graft.streaming.StreamingGroupedSample
                .readState(spark, s"$tmp/state")
              val twin = graft.streaming.StreamingGroupedSample
                .batchBottomKPerGroup(corpus, k, valueCol = Some("value"))
                .collect().groupBy(_.getString(0))
                .map { case (g, rs) => g -> rs.map(r =>
                  (r.getLong(1), r.getLong(2))).sortBy(identity).toSeq }
              val folded = st.groups.map { case (g, gs) =>
                g -> gs.entries.map(e => (e.key, e.id)).sorted }
              (folded == twin).toString
            } else {
              val st = graft.streaming.StreamingSample
                .readState(spark, s"$tmp/state")
              val twin = graft.streaming.StreamingSample
                .batchBottomK(corpus, k, valueCol = Some("value"))
              (st.entries == twin).toString
            }
          }
        println(s"[$tag] === scale=${scale}x k=$k batches=$nBatches $mode " +
          f"total=$total%.1fs state_bytes=$stateBytes " +
          f"dropped_samples=$dropped equals_batch_twin=$equal ===")
        val steady = recs.drop(3).map(_._2)
        if (steady.nonEmpty)
          println(f"[$tag] steady median=${steady.sorted.apply(steady.length / 2)}%.2fs/batch " +
            f"max_entries=${recs.map(_._3).max} (k=$k, scale=${scale}x, $mode)")
        if (poll) {
          val lats = pollLat.toArray(Array.empty[java.lang.Long])
            .map(_.longValue / 1e6).sorted
          if (lats.nonEmpty)
            println(f"[$tag] locked-read poller: n=${lats.length} " +
              f"median=${lats(lats.length / 2)}%.1fms " +
              f"p99=${lats((lats.length * 99) / 100 min (lats.length - 1))}%.1fms " +
              f"max=${lats.last}%.1fms errors=${pollErr.get()}")
        }
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }

    for (scale <- scales; k <- ks)
      runLeg(scale, k, poll = false)
    if (pollMs > 0) runLeg(scales.last, ks.head, poll = true)
    spark.stop()
  }
}
