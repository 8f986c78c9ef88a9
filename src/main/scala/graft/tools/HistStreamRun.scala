package graft.tools

import graft.core.Tables
import graft.operators.HistogramSketch
import graft.operators.HistogramSketch.HistogramSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run probe for the streaming exact-histogram folds
  * (StreamingHistogram / StreamingGroupedHistogram) — the quantile
  * square's analog of [[HhStreamRun]]: drive micro-batches of real event
  * values (replicated per scale) through `ingest`, record per batch the
  * wall time and the post-batch STATE CELL COUNT — which must sit at
  * ≤ nBins+2 (flat) / ≤ groups × (nBins+2) (grouped) from the first
  * batch to the last (exact counts over a fixed binning: there is
  * nothing that can grow) — then assert the folded state EQUALS the
  * one-shot batch histogram of the full corpus, exactly. Scales via
  * SPARK_GRAFT_HIST_SCALES (default "1,10"), batches via
  * SPARK_GRAFT_LONGRUN_BATCHES, grouped mode via
  * SPARK_GRAFT_HIST_GROUPED=1, width via SPARK_GRAFT_HIST_GROUPS=N
  * (synthesize N groups from event_id over the real value
  * distribution). Results -> SCALING.md. */
object HistStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_HIST_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val grouped = sys.env.get("SPARK_GRAFT_HIST_GROUPED").contains("1")
    val widthGroups = sys.env.get("SPARK_GRAFT_HIST_GROUPS").map(_.toInt)
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

    val spec = HistogramSpec(0.0, 1000.0, 2000)
    val baseEv = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val ev = widthGroups match {
      case Some(g) if grouped => baseEv.select(col("event_id"),
        concat(lit("type_"), pmod(col("event_id"), lit(g.toLong))
          .cast("string")).as("event_type"),
        col("value"))
      case _ => baseEv
    }
    val tag = (if (grouped) "histrun-grouped" else "histrun") +
      widthGroups.filter(_ => grouped).map(g => s"-w$g").getOrElse("")
    val maxGroups = widthGroups.map(g => math.max(g + 10,
      graft.streaming.StreamingGroupedHistogram.DefaultMaxGroups))
      .getOrElse(graft.streaming.StreamingGroupedHistogram.DefaultMaxGroups)

    scales.foreach { scale =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_").toString
      try {
        // one source file per micro-batch; the real value distribution
        // (replication scales counts, not shape — the fold's cost is in
        // the per-batch aggregation and the O(state) driver add)
        for (i <- 1 to nBatches) {
          ev.withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
            .select(col("event_type"), col("value"))
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
              val cells =
                try {
                  if (grouped)
                    graft.streaming.StreamingGroupedHistogram
                      .readStateLocked(spark, s"$tmp/state").totalCells
                  else
                    graft.streaming.StreamingHistogram
                      .readStateLocked(spark, s"$tmp/state").bins.size
                } catch { case scala.util.control.NonFatal(_) => -1 }
              rows.add((p.batchId,
                p.durationMs.get("triggerExecution").toDouble / 1000.0,
                cells))
            }
          }
        }
        spark.streams.addListener(listener)
        val t0 = System.nanoTime()
        val q =
          if (grouped)
            graft.streaming.StreamingGroupedHistogram.ingest(
              spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk", spec,
              maxFilesPerTrigger = 1, maxGroups = maxGroups)
          else
            graft.streaming.StreamingHistogram.ingest(
              spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk", spec,
              maxFilesPerTrigger = 1)
        try q.processAllAvailable()
        finally { q.stop(); spark.streams.removeListener(listener) }
        val total = (System.nanoTime() - t0) / 1e9
        val recs = rows.toArray(Array.empty[(Long, Double, Int)]).sortBy(_._1)
        val dropped = recs.count(_._3 < 0)
        val corpus = spark.read.parquet(s"$tmp/src")
        if (grouped) {
          val st = graft.streaming.StreamingGroupedHistogram
            .readState(spark, s"$tmp/state")
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs values=${st.groups.valuesIterator.map(_.n).sum} " +
            f"groups=${st.groups.size} state_cells=${st.totalCells} " +
            f"dropped_samples=$dropped ===")
          val truth = corpus
            .filter(col("event_type").isNotNull && col("value").isNotNull)
            .select(col("event_type"), spec.binExpr(col("value")).as("bin"))
            .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
            .collect().groupBy(_.getString(0))
            .map { case (g, rs) =>
              g -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }
          val equal = st.groups.keySet == truth.keySet &&
            truth.forall { case (g, bins) => st.groups(g).bins == bins }
          println(s"[$tag] equivalence: ${if (equal) "EQUAL" else "MISMATCH"} " +
            s"(${st.groups.size} groups x exact bins)")
        } else {
          val st = graft.streaming.StreamingHistogram
            .readState(spark, s"$tmp/state")
          println(s"[$tag] === scale=${scale}x batches=$nBatches " +
            f"total=$total%.1fs values=${st.n} state_cells=${st.bins.size} " +
            f"dropped_samples=$dropped ===")
          val truth = HistogramSketch.counts(corpus, "value", spec)
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          println(s"[$tag] equivalence: " +
            s"${if (st.bins == truth) "EQUAL" else "MISMATCH"} " +
            s"(${st.bins.size} exact bins, n=${st.n})")
        }
        recs.foreach { case (b, s, c) =>
          println(f"[$tag] batch=$b%3d wall=$s%6.2fs state_cells=$c%6d")
        }
        val steady = recs.drop(3).map(_._2)
        if (steady.nonEmpty)
          println(f"[$tag] steady median=${steady.sorted.apply(steady.length / 2)}%.2fs " +
            f"max_cells=${recs.map(_._3).max}")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }
    spark.stop()
  }
}
