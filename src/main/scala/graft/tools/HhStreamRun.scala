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
  * SPARK_GRAFT_HH_GROUPED=1. Results -> SCALING.md.
  *
  * r14 legs:
  *  - SPARK_GRAFT_HH_GROUPS=N (grouped mode): WIDTH — synthesize N
  *    real-ish sources (`src_<doc_id mod N>`, real text per group) so the
  *    groups×k state, the per-batch driver fold, and the recount's
  *    candidate-relation growth are priced in the GROUP dimension, not
  *    just depth (both prior grouped tables ran at 20 groups).
  *  - SPARK_GRAFT_HH_POLL_MS=M: price the LINEARIZABLE read under a hot
  *    writer — each scale runs TWICE (baseline, then with a monitor
  *    thread calling readStateLocked every M ms during ingest), printing
  *    both steady s/batch medians plus reader-latency stats, so the
  *    lock contention cost to BOTH sides is a measured number. The
  *    equivalence recount is skipped in poll mode (priced elsewhere;
  *    here it would double the run for no extra signal).
  */
object HhStreamRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LONGRUN_BATCHES", "50").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_HH_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val grouped = sys.env.get("SPARK_GRAFT_HH_GROUPED").contains("1")
    val widthGroups = sys.env.get("SPARK_GRAFT_HH_GROUPS").map(_.toInt)
    val pollMs = sys.env.getOrElse("SPARK_GRAFT_HH_POLL_MS", "0").toLong
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
      .select(col("doc_id"), col("source"), col("text"))
    // width mode: N synthetic sources carved from doc_id over REAL text,
    // so per-group token distributions are the documents table's own.
    // The residue is shifted by a g-coprime stride per BATCH (see
    // widthSource below): with fewer distinct doc_ids than g (the
    // 10,000-group default-cap leg over 5,000 docs), a single fixed
    // mod-g would plateau at |docs| groups — the per-batch shift walks
    // the full residue ring so the STATE genuinely accumulates g groups
    // within the first few batches. The stride is gcd-checked at
    // runtime (first candidate >= 4999 coprime to g — 4999 itself for
    // the published g=10000 leg), since a fixed constant silently stops
    // walking the ring whenever g shares a factor with it.
    def widthStride(g: Int): Long =
      Iterator.from(4999).find(s => BigInt(s).gcd(BigInt(g)) == 1).get.toLong
    def widthSource(g: Int, batchId: Int) =
      concat(lit("src_"),
        pmod(col("doc_id") + lit(batchId.toLong * widthStride(g)),
          lit(g.toLong)).cast("string"))
    val denom = if (grouped) 100L else 200L
    val k = if (grouped) 256 else 512
    val tag = (if (grouped) "hhrun-grouped" else "hhrun") +
      widthGroups.filter(_ => grouped).map(g => s"-w$g").getOrElse("")

    def runLeg(scale: Int, poll: Boolean): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_${scale}x_").toString
      try {
        // one source file per micro-batch; real text so the token
        // distribution (and therefore the MG decrement pressure) is the
        // documents table's own
        for (i <- 1 to nBatches) {
          val srcCol = widthGroups match {
            case Some(g) if grouped => widthSource(g, i)
            case _ => col("source")
          }
          baseDocs.withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
            .select((col("doc_id") + col("rep") * 1000000L
              + lit(i.toLong * 100000000L)).as("doc_id"),
              srcCol.as("source"), col("text"))
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
        // the priced monitor: a dedicated thread hammering the LOCKED read
        // at a fixed cadence while the writer commits per batch — reader
        // latency histogrammed; writer cost read off the s/batch delta vs
        // the baseline leg
        val pollLat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val pollErr = new java.util.concurrent.atomic.AtomicInteger(0)
        @volatile var polling = poll
        val poller = new Thread(() => {
          while (polling) {
            val t0 = System.nanoTime()
            try {
              if (grouped)
                graft.streaming.StreamingGroupedHeavyHitters
                  .readStateLocked(spark, s"$tmp/state")
              else
                graft.streaming.StreamingHeavyHitters
                  .readStateLocked(spark, s"$tmp/state")
              pollLat.add(System.nanoTime() - t0)
            } catch { case scala.util.control.NonFatal(_) =>
              pollErr.incrementAndGet() }
            try Thread.sleep(pollMs)
            catch { case _: InterruptedException => polling = false }
          }
        }, "hhrun-locked-poller")
        poller.setDaemon(true)
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
        if (poll) poller.start()
        try q.processAllAvailable()
        finally {
          q.stop()
          polling = false
          if (poll) { poller.interrupt(); poller.join(5000) }
          spark.streams.removeListener(listener)
        }
        val total = (System.nanoTime() - t0) / 1e9
        val recs = rows.toArray(Array.empty[(Long, Double, Int)]).sortBy(_._1)
        val dropped = recs.count(_._3 < 0)
        val mode = if (poll) s"poll=${pollMs}ms" else "poll=off"
        if (grouped) {
          val st = graft.streaming.StreamingGroupedHeavyHitters
            .readState(spark, s"$tmp/state")
          println(s"[$tag] === scale=${scale}x batches=$nBatches $mode " +
            f"total=$total%.1fs groups=${st.groups.size} " +
            f"state_entries=${st.totalEntries} dropped_samples=$dropped ===")
        } else {
          val st = graft.streaming.StreamingHeavyHitters
            .readState(spark, s"$tmp/state")
          println(s"[$tag] === scale=${scale}x batches=$nBatches $mode " +
            f"total=$total%.1fs tokens=${st.n} " +
            f"state_entries=${st.counts.size} dropped_samples=$dropped ===")
        }
        recs.foreach { case (b, s, e) =>
          println(f"[$tag] batch=$b%3d wall=$s%6.2fs state_entries=$e%4d")
        }
        val steady = recs.drop(3).map(_._2)
        if (steady.nonEmpty)
          println(f"[$tag] steady median=${steady.sorted.apply(steady.length / 2)}%.2fs " +
            f"max_entries=${recs.map(_._3).max} (k=$k, $mode)")
        if (poll) {
          val lats = pollLat.toArray(Array.empty[java.lang.Long])
            .map(_.longValue / 1e6).sorted
          if (lats.nonEmpty)
            println(f"[$tag] locked-read poller: n=${lats.length} " +
              f"median=${lats(lats.length / 2)}%.1fms " +
              f"p99=${lats((lats.length * 99) / 100 min (lats.length - 1))}%.1fms " +
              f"max=${lats.last}%.1fms errors=${pollErr.get()}")
          else
            println(s"[$tag] locked-read poller: n=0 errors=${pollErr.get()}")
        }
        // headline equivalence at full corpus scale: stream fold == batch
        // (skipped in poll-pricing mode — proven on the baseline legs and
        // by spec; here it would double the run for no extra signal)
        // keyed on THIS leg's poll flag: in poll-pricing mode the
        // BASELINE leg still attests fold == batch; only the polled leg
        // skips it (priced elsewhere)
        if (!poll) {
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
        }
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(tmp))
    }

    for (scale <- scales) {
      if (pollMs > 0L) { runLeg(scale, poll = false); runLeg(scale, poll = true) }
      else runLeg(scale, poll = false)
    }
    spark.stop()
  }
}
