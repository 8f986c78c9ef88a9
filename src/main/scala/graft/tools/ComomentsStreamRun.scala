package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run probe for the streaming exact co-moments folds
  * (StreamingComoments / StreamingGroupedComoments) — the bivariate
  * square's analog of [[MomentsStreamRun]]: drive micro-batches of real
  * document char counts paired with a second long column (replicated per
  * scale) through `ingest`, record per batch the wall time and the
  * post-batch STATE SIZE (flat: one thirteen-counter entry; grouped: the
  * group count), then assert the folded state EQUALS the one-shot batch
  * aggregate of the full corpus, exactly (BigInt sums: bit equality, no
  * tolerance). Scales via SPARK_GRAFT_COMOM_SCALES (default "1,10"),
  * batches via SPARK_GRAFT_LONGRUN_BATCHES, grouped mode via
  * SPARK_GRAFT_COMOM_GROUPED=1, hot locked-read poller via
  * SPARK_GRAFT_COMOM_POLL_MS. Results -> SCALING.md. */
object ComomentsStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_COMOM_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val grouped = sys.env.get("SPARK_GRAFT_COMOM_GROUPED").contains("1")
    val pollMs = sys.env.getOrElse("SPARK_GRAFT_COMOM_POLL_MS", "0").toLong
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

    // x = real char counts; y = a second long derived cheaply at staging
    // time (the fold's cost is invariant to the VALUES — it aggregates
    // two long columns into thirteen counters either way)
    val baseDocs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("n_chars").as("x"),
        (col("n_chars") * 2 + pmod(col("doc_id"), lit(7L))).as("y"))
    val tag = if (grouped) "comomrun-grouped" else "comomrun"

    scales.foreach { scale =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_").toString
      try {
        for (_ <- 1 to nBatches) {
          baseDocs
            .withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
            .select(col("source"), col("x"), col("y"))
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
              val size =
                try {
                  if (grouped)
                    graft.streaming.StreamingGroupedComoments
                      .readStateLocked(spark, s"$tmp/state").groups.size
                  else if (graft.streaming.StreamingComoments
                      .readStateLocked(spark, s"$tmp/state").lastBatchId >= 0L) 1
                  else 0
                } catch { case scala.util.control.NonFatal(_) => -1 }
              rows.add((p.batchId,
                p.durationMs.get("triggerExecution").toDouble / 1000.0,
                size))
            }
          }
        }
        val pollLat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val pollErr = new java.util.concurrent.atomic.AtomicInteger(0)
        @volatile var polling = pollMs > 0
        val poller = new Thread(() => {
          while (polling) {
            val p0 = System.nanoTime()
            try {
              if (grouped)
                graft.streaming.StreamingGroupedComoments
                  .readStateLocked(spark, s"$tmp/state")
              else
                graft.streaming.StreamingComoments
                  .readStateLocked(spark, s"$tmp/state")
              pollLat.add(System.nanoTime() - p0)
            } catch { case scala.util.control.NonFatal(_) =>
              pollErr.incrementAndGet() }
            try Thread.sleep(pollMs)
            catch { case _: InterruptedException => polling = false }
          }
        }, "comomrun-locked-poller")
        poller.setDaemon(true)
        spark.streams.addListener(listener)
        val t0 = System.nanoTime()
        val q =
          if (grouped)
            graft.streaming.StreamingGroupedComoments.ingest(
              spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              groupCol = "source", xCol = "x", yCol = "y",
              maxFilesPerTrigger = 1)
          else
            graft.streaming.StreamingComoments.ingest(
              spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              xCol = "x", yCol = "y", maxFilesPerTrigger = 1)
        if (pollMs > 0) poller.start()
        try q.processAllAvailable()
        finally {
          q.stop()
          polling = false
          if (pollMs > 0) { poller.interrupt(); poller.join(5000) }
          spark.streams.removeListener(listener)
        }
        if (pollMs > 0) {
          val lats = pollLat.toArray(Array.empty[java.lang.Long])
            .map(_.longValue / 1e6).sorted
          if (lats.nonEmpty)
            println(f"[$tag] locked-read poller (${pollMs}ms cadence): " +
              f"n=${lats.length} median=${lats(lats.length / 2)}%.1fms " +
              f"p99=${lats((lats.length * 99) / 100)}%.1fms " +
              f"max=${lats.last}%.1fms errors=${pollErr.get()}")
        }
        val total = (System.nanoTime() - t0) / 1e9
        val recs = rows.toArray(Array.empty[(Long, Double, Int)]).sortBy(_._1)
        val dropped = recs.count(_._3 < 0)
        val corpus = spark.read.parquet(s"$tmp/src")
        if (grouped) {
          val st = graft.streaming.StreamingGroupedComoments
            .readState(spark, s"$tmp/state")
          val stateBytes = new java.io.File(
            s"$tmp/state/comoments_grouped_state.json").length()
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs rows=${st.groups.valuesIterator.map(_.nRows).sum} " +
            f"groups=${st.groups.size} state_bytes=$stateBytes " +
            f"dropped_samples=$dropped ===")
          val truth = graft.operators.Profile
            .comomentsPerGroup(corpus, "source", "x", "y").collect()
            .map(r => r.getString(0) ->
              graft.streaming.StreamingComoments.comomentsFromRow(
                r, 1, "comomrun truth")).toMap
          val equal = st.groups == truth
          println(s"[$tag] equivalence: ${if (equal) "EQUAL" else "MISMATCH"} " +
            s"(${st.groups.size} groups x thirteen exact numbers)")
        } else {
          val st = graft.streaming.StreamingComoments
            .readState(spark, s"$tmp/state")
          val stateBytes = new java.io.File(
            s"$tmp/state/comoments_state.json").length()
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs rows=${st.comoments.nRows} " +
            f"state_bytes=$stateBytes dropped_samples=$dropped ===")
          val truth = graft.streaming.StreamingComoments
            .batchComoments(corpus, "x", "y")
          println(s"[$tag] equivalence: " +
            s"${if (st.comoments == truth) "EQUAL" else "MISMATCH"} " +
            s"(xy_sum=${st.comoments.xySum}, corr=${st.comoments.correlation})")
        }
        recs.foreach { case (b, s, c) =>
          println(f"[$tag] batch=$b%3d wall=$s%6.2fs state_size=$c%6d")
        }
        val steady = recs.drop(3).map(_._2)
        if (steady.nonEmpty)
          println(f"[$tag] steady median=${steady.sorted.apply(steady.length / 2)}%.2fs " +
            f"max_state=${recs.map(_._3).max}")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }
    spark.stop()
  }
}
