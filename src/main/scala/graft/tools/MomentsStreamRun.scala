package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run probe for the streaming exact-moments folds
  * (StreamingMoments / StreamingGroupedMoments) — the moments square's
  * analog of [[HistStreamRun]]: drive micro-batches of real document
  * char counts (replicated per scale) through `ingest`, record per batch
  * the wall time and the post-batch STATE SIZE (flat: one seven-counter
  * entry; grouped: the group count — which must sit at ≤ the source's
  * true group cardinality from the first batch to the last; there is no
  * per-key state to grow), then assert the folded state EQUALS the
  * one-shot batch aggregate of the full corpus, exactly (BigInt sums:
  * bit equality, no tolerance). Scales via SPARK_GRAFT_MOM_SCALES
  * (default "1,10"), batches via SPARK_GRAFT_LONGRUN_BATCHES, grouped
  * mode via SPARK_GRAFT_MOM_GROUPED=1, width via
  * SPARK_GRAFT_MOM_GROUPS=N (synthesize N groups from doc_id over the
  * real value distribution). Results -> SCALING.md. */
object MomentsStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_MOM_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val grouped = sys.env.get("SPARK_GRAFT_MOM_GROUPED").contains("1")
    val widthGroups = sys.env.get("SPARK_GRAFT_MOM_GROUPS").map(_.toInt)
    // hot locked-read poller (ms cadence; 0 = off) — the family's r14
    // contention methodology: a monitor hammering readStateLocked while
    // the writer folds, reporting reader latency + writer slowdown
    val pollMs = sys.env.getOrElse("SPARK_GRAFT_MOM_POLL_MS", "0").toLong
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

    val baseDocs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars").as("value"))
    val tag = (if (grouped) "momrun-grouped" else "momrun") +
      widthGroups.filter(_ => grouped).map(g => s"-w$g").getOrElse("")
    val maxGroups = widthGroups.map(g => math.max(g + 10,
      graft.streaming.StreamingGroupedMoments.DefaultMaxGroups))
      .getOrElse(graft.streaming.StreamingGroupedMoments.DefaultMaxGroups)

    scales.foreach { scale =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_").toString
      try {
        // one source file per micro-batch; replication scales row counts,
        // not distribution shape — the fold's cost is the per-batch
        // aggregation plus the O(state) driver merge. Width legs
        // synthesize the group key over (doc_id, replica) so the group
        // domain is scale x |docs| — measurable AT the default cap even
        // when the corpus has fewer distinct ids than the cap.
        for (_ <- 1 to nBatches) {
          val staged = baseDocs
            .withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
          val withGroup = widthGroups match {
            case Some(g) if grouped => staged.select(
              concat(lit("src_"),
                pmod(col("doc_id") * lit(scale.toLong) + col("rep"),
                  lit(g.toLong)).cast("string")).as("source"),
              col("value"))
            case _ => staged.select(col("source"), col("value"))
          }
          withGroup.coalesce(1)
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
                    graft.streaming.StreamingGroupedMoments
                      .readStateLocked(spark, s"$tmp/state").groups.size
                  else if (graft.streaming.StreamingMoments
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
                graft.streaming.StreamingGroupedMoments
                  .readStateLocked(spark, s"$tmp/state")
              else
                graft.streaming.StreamingMoments
                  .readStateLocked(spark, s"$tmp/state")
              pollLat.add(System.nanoTime() - p0)
            } catch { case scala.util.control.NonFatal(_) =>
              pollErr.incrementAndGet() }
            try Thread.sleep(pollMs)
            catch { case _: InterruptedException => polling = false }
          }
        }, "momrun-locked-poller")
        poller.setDaemon(true)
        spark.streams.addListener(listener)
        val t0 = System.nanoTime()
        val q =
          if (grouped)
            graft.streaming.StreamingGroupedMoments.ingest(
              spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              groupCol = "source", maxFilesPerTrigger = 1,
              maxGroups = maxGroups)
          else
            graft.streaming.StreamingMoments.ingest(
              spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              maxFilesPerTrigger = 1)
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
          val st = graft.streaming.StreamingGroupedMoments
            .readState(spark, s"$tmp/state")
          val stateBytes = new java.io.File(
            s"$tmp/state/moments_grouped_state.json").length()
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs rows=${st.groups.valuesIterator.map(_.nRows).sum} " +
            f"groups=${st.groups.size} state_bytes=$stateBytes " +
            f"dropped_samples=$dropped ===")
          val truth = graft.operators.Profile
            .momentsPerGroup(corpus, "source", "value").collect()
            .map(r => r.getString(0) ->
              graft.streaming.StreamingMoments.momentsFromRow(
                r, 1, "momrun truth")).toMap
          val equal = st.groups == truth
          println(s"[$tag] equivalence: ${if (equal) "EQUAL" else "MISMATCH"} " +
            s"(${st.groups.size} groups x seven exact numbers)")
        } else {
          val st = graft.streaming.StreamingMoments
            .readState(spark, s"$tmp/state")
          val stateBytes = new java.io.File(
            s"$tmp/state/moments_state.json").length()
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs rows=${st.moments.nRows} " +
            f"state_bytes=$stateBytes dropped_samples=$dropped ===")
          val truth = graft.streaming.StreamingMoments
            .batchMoments(corpus, "value")
          println(s"[$tag] equivalence: " +
            s"${if (st.moments == truth) "EQUAL" else "MISMATCH"} " +
            s"(sum=${st.moments.sum}, sum_sq=${st.moments.sumSq})")
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
