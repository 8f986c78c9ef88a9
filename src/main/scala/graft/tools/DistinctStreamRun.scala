package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run probe for the streaming distinct-count folds
  * (StreamingDistinct / StreamingGroupedDistinct): drive micro-batches of
  * document content fingerprints through `ingest`, record per batch the
  * wall time and post-batch STATE BYTES — which must stay O(2^lgK)
  * (flat) / O(groups × 2^lgK) (grouped) no matter how the DISTINCT
  * cardinality grows — then check the folded estimate against the exact
  * distinct count of the staged corpus (within the sketch's published
  * relative error; exact in the sparse regime).
  *
  * Two stream shapes: SPARK_GRAFT_DIS_GROW=1 suffixes each batch's
  * values with the batch index, so the distinct universe GROWS by
  * |corpus| per batch (the fixed-size claim's stress case); default
  * replays the same fingerprints every batch (the dedup case — the
  * estimate must sit at |corpus| from batch 1 to the last). Scales via
  * SPARK_GRAFT_DIS_SCALES (default "1,10"), grouped via
  * SPARK_GRAFT_DIS_GROUPED=1, width via SPARK_GRAFT_DIS_GROUPS=N.
  * Results -> SCALING.md. */
object DistinctStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_DIS_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val grouped = sys.env.get("SPARK_GRAFT_DIS_GROUPED").contains("1")
    val grow = sys.env.get("SPARK_GRAFT_DIS_GROW").contains("1")
    val widthGroups = sys.env.get("SPARK_GRAFT_DIS_GROUPS").map(_.toInt)
    // hot locked-read poller (ms cadence; 0 = off) — the family's r14
    // contention methodology
    val pollMs = sys.env.getOrElse("SPARK_GRAFT_DIS_POLL_MS", "0").toLong
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
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.contentFingerprint(col("text"))
          .as("value"))
    val tag = (if (grouped) "disrun-grouped" else "disrun") +
      (if (grow) "-grow" else "") +
      widthGroups.filter(_ => grouped).map(g => s"-w$g").getOrElse("")
    val maxGroups = widthGroups.map(g => math.max(g + 10,
      graft.streaming.StreamingGroupedDistinct.DefaultMaxGroups))
      .getOrElse(graft.streaming.StreamingGroupedDistinct.DefaultMaxGroups)

    scales.foreach { scale =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_").toString
      try {
        for (i <- 1 to nBatches) {
          val staged = baseDocs
            .withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
          val grownValue =
            // unambiguous (batch, replica) suffix: without the trailing
            // separator, batch 1/rep 10 and batch 11/rep 0 would both
            // produce "_b110" and the growth stress would self-collide
            // at scale >= 11
            if (grow) concat(col("value"), lit(s"_b${i}_"),
              col("rep").cast("string"))
            else col("value")
          val withGroup = widthGroups match {
            case Some(g) if grouped => staged.select(
              concat(lit("src_"),
                pmod(col("doc_id") * lit(scale.toLong) + col("rep"),
                  lit(g.toLong)).cast("string")).as("source"),
              grownValue.as("value"))
            case _ => staged.select(col("source"), grownValue.as("value"))
          }
          withGroup.coalesce(1)
            .write.mode("append").parquet(s"$tmp/src")
        }
        val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Long)]()
        val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
            val p = e.progress
            if (p.numInputRows > 0) {
              val name = if (grouped) "distinct_grouped_state.json"
                else "distinct_state.json"
              val bytes =
                try new java.io.File(s"$tmp/state/$name").length()
                catch { case scala.util.control.NonFatal(_) => -1L }
              rows.add((p.batchId,
                p.durationMs.get("triggerExecution").toDouble / 1000.0,
                bytes))
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
                graft.streaming.StreamingGroupedDistinct
                  .readStateLocked(spark, s"$tmp/state")
              else
                graft.streaming.StreamingDistinct
                  .readStateLocked(spark, s"$tmp/state")
              pollLat.add(System.nanoTime() - p0)
            } catch { case scala.util.control.NonFatal(_) =>
              pollErr.incrementAndGet() }
            try Thread.sleep(pollMs)
            catch { case _: InterruptedException => polling = false }
          }
        }, "disrun-locked-poller")
        poller.setDaemon(true)
        spark.streams.addListener(listener)
        val t0 = System.nanoTime()
        val q =
          if (grouped)
            graft.streaming.StreamingGroupedDistinct.ingest(
              spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              groupCol = "source", maxFilesPerTrigger = 1,
              maxGroups = maxGroups)
          else
            graft.streaming.StreamingDistinct.ingest(
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
        val recs = rows.toArray(Array.empty[(Long, Double, Long)]).sortBy(_._1)
        val corpus = spark.read.parquet(s"$tmp/src")
        if (grouped) {
          val st = graft.streaming.StreamingGroupedDistinct
            .readState(spark, s"$tmp/state")
          val truth = corpus.filter(col("source").isNotNull)
            .groupBy("source").agg(countDistinct(col("value")).as("d"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val errs = truth.map { case (g, exact) =>
            math.abs(st.groups(g).estimate.getOrElse(0.0) - exact) /
              math.max(1.0, exact.toDouble) }
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs rows=${st.groups.valuesIterator.map(_.nRows).sum} " +
            f"groups=${st.groups.size} " +
            f"max_rel_err=${errs.max}%.4f ===")
        } else {
          val st = graft.streaming.StreamingDistinct
            .readState(spark, s"$tmp/state")
          val exact = corpus.select(countDistinct(col("value")))
            .head().getLong(0)
          val est = st.estimate.getOrElse(0.0)
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs rows=${st.nRows} exact_distinct=$exact " +
            f"estimate=$est%.1f rel_err=${math.abs(est - exact) / exact}%.4f ===")
        }
        recs.foreach { case (b, s, c) =>
          println(f"[$tag] batch=$b%3d wall=$s%6.2fs state_bytes=$c%9d")
        }
        val steady = recs.drop(3).map(_._2)
        if (steady.nonEmpty)
          println(f"[$tag] steady median=${steady.sorted.apply(steady.length / 2)}%.2fs " +
            f"max_state_bytes=${recs.map(_._3).max}")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }
    spark.stop()
  }
}
