package graft.tools

import graft.core.Tables
import graft.operators.HistogramSketch.HistogramSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-run pricing probe for the three windowed ring folds
  * (StreamingWindowedMoments / StreamingWindowedHistogram /
  * StreamingWindowedDistinct) — the family methodology
  * ([[MomentsStreamRun]]) applied to the ring: drive micro-batches of
  * real document columns (replicated per scale) through `ingest` at a
  * given WINDOW WIDTH, record per batch the wall time and the
  * post-batch ring depth, report the state-file size at saturation
  * (the ring's state grows to `window` slots and stays there — the
  * property being priced), optionally hammer `readStateLocked` from a
  * poller thread while the writer folds, then assert the served window
  * aggregate EQUALS the one-shot batch answer over exactly the newest
  * `window` batches' rows (bit-exact for moments/histogram;
  * canonical-estimate-equal for the HLL ring).
  *
  * Face via SPARK_GRAFT_WIN_FACE=moments|hist|distinct; scales via
  * SPARK_GRAFT_WIN_SCALES (default "1,10"); window widths via
  * SPARK_GRAFT_WIN_WIDTHS (default "6,64"); batches via
  * SPARK_GRAFT_LONGRUN_BATCHES (default 50); locked-read poller via
  * SPARK_GRAFT_WIN_POLL_MS (0 = off). Results -> SCALING.md. */
object WindowedStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val face = sys.env.getOrElse("SPARK_GRAFT_WIN_FACE", "moments")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_WIN_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val widths = sys.env.getOrElse("SPARK_GRAFT_WIN_WIDTHS", "6,64")
      .split(",").map(_.trim.toInt).toSeq
    val pollMs = sys.env.getOrElse("SPARK_GRAFT_WIN_POLL_MS", "0").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spec = HistogramSpec(0.0, 20000.0, 2000)
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
    val stateName = face match {
      case "moments" => "moments_window_state.json"
      case "hist" => "hist_window_state.json"
      case "distinct" => "distinct_window_state.json"
      case "hh" => "mg_window_state.json"
      case other => sys.error(s"unknown face '$other'")
    }

    for (scale <- scales; window <- widths) {
      val tag = s"winrun-$face-w$window"
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_").toString
      try {
        // one source file per micro-batch with FORCED strictly-increasing
        // mtimes (stageOrderedBatches' device): the windowed folds'
        // semantics depend on batch ORDER, and both FileStreamSource's
        // processing order and the equivalence check's takeRight(window)
        // read the file timestamps — equal mtimes would race them
        val staged = baseDocs
          .withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
        val col1 = face match {
          case "moments" => staged
            .select(col("n_chars").cast("long").as("value"))
          case "hist" => staged
            .select(col("n_chars").cast("double").as("value"))
          case "hh" => staged.select(col("doc_id"), col("text"))
          case _ => staged.select(concat(col("doc_id"), lit("_"),
            col("rep")).cast("string").as("value"))
        }
        graft.queries.QueryShapes.stageOrderedBatches(
          Seq.fill(nBatches)(col1), s"$tmp/src")
        val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Int)]()
        val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
            val p = e.progress
            if (p.numInputRows > 0) {
              val depth =
                try {
                  face match {
                    case "moments" => graft.streaming.StreamingWindowedMoments
                      .readStateLocked(spark, s"$tmp/state").ring.size
                    case "hist" => graft.streaming.StreamingWindowedHistogram
                      .readStateLocked(spark, s"$tmp/state").ring.size
                    case "hh" => graft.streaming.StreamingWindowedHeavyHitters
                      .readStateLocked(spark, s"$tmp/state").ring.size
                    case _ => graft.streaming.StreamingWindowedDistinct
                      .readStateLocked(spark, s"$tmp/state").ring.size
                  }
                } catch { case scala.util.control.NonFatal(_) => -1 }
              rows.add((p.batchId,
                p.durationMs.get("triggerExecution").toDouble / 1000.0,
                depth))
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
              face match {
                case "moments" => graft.streaming.StreamingWindowedMoments
                  .readStateLocked(spark, s"$tmp/state")
                case "hist" => graft.streaming.StreamingWindowedHistogram
                  .readStateLocked(spark, s"$tmp/state")
                case "hh" => graft.streaming.StreamingWindowedHeavyHitters
                  .readStateLocked(spark, s"$tmp/state")
                case _ => graft.streaming.StreamingWindowedDistinct
                  .readStateLocked(spark, s"$tmp/state")
              }
              pollLat.add(System.nanoTime() - p0)
            } catch { case scala.util.control.NonFatal(_) =>
              pollErr.incrementAndGet() }
            try Thread.sleep(pollMs)
            catch { case _: InterruptedException => polling = false }
          }
        }, "winrun-locked-poller")
        poller.setDaemon(true)
        spark.streams.addListener(listener)
        val t0 = System.nanoTime()
        val q = face match {
          case "moments" => graft.streaming.StreamingWindowedMoments
            .ingest(spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              window, maxFilesPerTrigger = 1)
          case "hist" => graft.streaming.StreamingWindowedHistogram
            .ingest(spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk", spec,
              window, maxFilesPerTrigger = 1)
          case "hh" => graft.streaming.StreamingWindowedHeavyHitters
            .ingest(spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              denominator = 200L, window = window, sketchK = 512,
              maxFilesPerTrigger = 1)
          case _ => graft.streaming.StreamingWindowedDistinct
            .ingest(spark, s"$tmp/src", s"$tmp/state", s"$tmp/chk",
              window, maxFilesPerTrigger = 1)
        }
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
        val stateBytes = new java.io.File(s"$tmp/state/$stateName").length()
        // equivalence: the served window aggregate vs the one-shot batch
        // answer over exactly the newest `window` source files
        val files = new java.io.File(s"$tmp/src").listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
        val lastN = files.takeRight(window).map(_.getAbsolutePath)
        val windowCorpus = spark.read.parquet(lastN: _*)
        val equal = face match {
          case "moments" =>
            val st = graft.streaming.StreamingWindowedMoments
              .readState(spark, s"$tmp/state")
            st.aggregate == graft.streaming.StreamingMoments
              .batchMoments(windowCorpus, "value")
          case "hist" =>
            val st = graft.streaming.StreamingWindowedHistogram
              .readState(spark, s"$tmp/state")
            val twin = graft.operators.HistogramSketch.counts(
              windowCorpus.select(col("value")), "value", spec)
              .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
            st.aggregate.bins == twin
          case "hh" =>
            val st = graft.streaming.StreamingWindowedHeavyHitters
              .readState(spark, s"$tmp/state")
            val toks = windowCorpus.select(explode(
              graft.functions.TextFunctions.tokens(col("text")))
              .as("token"))
            val got = graft.streaming.StreamingWindowedHeavyHitters
              .heavyHittersFromSnapshot(st, s"$tmp/state", toks, "token",
                200L)
              .collect().map(r => (r.getString(0), r.getLong(1))).toSet
            val exact = graft.operators.HeavyHitters.exact(toks, "token",
              denominator = 200L, sketchK = 512)
              .collect().map(r => (r.getString(0), r.getLong(1))).toSet
            got == exact
          case _ =>
            val st = graft.streaming.StreamingWindowedDistinct
              .readState(spark, s"$tmp/state")
            val (_, _, twin) = graft.streaming.StreamingDistinct
              .batchSketch(windowCorpus, "value", st.lgK)
            graft.streaming.StreamingWindowedDistinct.canonicalEstimate(st) ==
              graft.streaming.StreamingDistinct.canonicalEstimate(st.lgK, twin)
        }
        println(s"[$tag] === scale=${scale}x window=$window " +
          f"batches=$nBatches total=$total%.1fs state_bytes=$stateBytes " +
          s"max_ring_depth=${recs.map(_._3).max} " +
          s"equivalence=${if (equal) "EQUAL" else "MISMATCH"} ===")
        val steady = recs.drop(math.max(3, window + 1)).map(_._2)
        if (steady.nonEmpty)
          println(f"[$tag] steady(post-saturation) median=" +
            f"${steady.sorted.apply(steady.length / 2)}%.2fs " +
            f"max=${steady.max}%.2fs")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }
    spark.stop()
  }
}
