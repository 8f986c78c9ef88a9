package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.operators.HistogramSketch
import graft.operators.HistogramSketch.HistogramSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Streaming value-distribution profile: per micro-batch one EXACT
  * fixed-bin histogram aggregation ([[HistogramSketch]]), folded into the
  * persisted state by plain vector addition — the quantile face of the
  * streaming profiling family, completing the square the heavy-hitter
  * folds started ([[StreamingHeavyHitters]] flat /
  * [[StreamingGroupedHeavyHitters]] grouped are the frequency faces).
  *
  * Because the fold is exact integer addition over a FIXED binning, the
  * folded state is not an estimate of anything: it IS the batch
  * histogram of everything folded so far. Exactly-once is therefore
  * hash-checkable end to end — a dropped batch, a double-applied replay,
  * or a drifted bin boundary changes some exact count, and the oracle
  * replays the whole answer (counts and interpolated quantile estimates)
  * from the raw corpus. Rank accounting is exact; only value resolution
  * is quantized (one bin width). A GK/percentile_approx fold was
  * measured and rejected for this seat — see the [[HistogramSketch]]
  * scaladoc for the numbers.
  *
  * State durability and exactly-once are [[StreamingHeavyHitters]]'s
  * protocol verbatim: one JSON state file rewritten per batch through
  * the [[graft.core.SwapStateFile]] tmp+marker swap, the last-applied
  * batch id skipping crash replays, the state bound to ONE checkpoint
  * AND one binning (folding mixed binnings would silently corrupt every
  * count), both refused loudly at stream entry.
  *
  * 100 TB/day posture: per batch one map-side-combined <= nBins+2-key
  * aggregation, O(nBins) driver fold, O(nBins) state file — no per-key
  * state, no sort, no value retention, at any stream length. */
object StreamingHistogram {

  /** Folded histogram state: the binning it was folded WITH (counts are
    * meaningless under any other), the checkpoint binding, last applied
    * micro-batch id, exact total (non-null) value count, exact underflow/
    * overflow counts, and the exact per-bin counts (sparse map). */
  case class HistSnapshot(spec: HistogramSpec, checkpoint: String,
      lastBatchId: Long, n: Long, bins: Map[Int, Long]) {
    def underflow: Long = bins.getOrElse(-1, 0L)
    def overflow: Long = bins.getOrElse(spec.nBins, 0L)
  }

  private def statePath(stateDir: String) =
    new Path(stateDir, "hist_state.json")

  private def stateFile(spark: SparkSession, stateDir: String) = {
    val p = statePath(stateDir)
    new graft.core.SwapStateFile(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration),
      stateDir, p.getName, "hist_state.swap.inprogress", "histogram state")
  }

  private def emptySnapshot =
    HistSnapshot(HistogramSpec(0.0, 1.0, 1), "", -1L, 0L, Map.empty)

  private def parseSnapshot(stateDir: String)(txt: String): HistSnapshot = {
    val node = new ObjectMapper().readTree(txt)
    if (node.get("lo") == null || node.get("hi") == null ||
        node.get("n_bins") == null || node.get("checkpoint") == null)
      throw new IllegalStateException(
        s"histogram state file ${statePath(stateDir)} lacks the binning/" +
          "checkpoint binding fields — refusing to guess which stream it " +
          "belongs to; re-fold from the source with a fresh state dir")
    val b = Map.newBuilder[Int, Long]
    val it = node.get("bins").fields()
    while (it.hasNext) {
      val e = it.next(); b += e.getKey.toInt -> e.getValue.asLong()
    }
    HistSnapshot(
      HistogramSpec(node.get("lo").asDouble(), node.get("hi").asDouble(),
        node.get("n_bins").asInt()),
      node.get("checkpoint").asText(), node.get("batch_id").asLong(),
      node.get("n").asLong(), b.result())
  }

  /** Lock-free read (the [[graft.core.SwapStateFile.read]] protocol);
    * absent file = empty stream. Monitors on a hot stream should use
    * [[readStateLocked]]. */
  def readState(spark: SparkSession, stateDir: String): HistSnapshot =
    stateFile(spark, stateDir).read(parseSnapshot(stateDir), emptySnapshot)

  /** Linearizable read under the writer's own swap lock
    * ([[graft.core.SwapStateFile.readLocked]]). */
  def readStateLocked(spark: SparkSession, stateDir: String): HistSnapshot =
    stateFile(spark, stateDir)
      .readLocked(parseSnapshot(stateDir), emptySnapshot)

  private def writeState(spark: SparkSession, stateDir: String,
      snap: HistSnapshot): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("lo", snap.spec.lo)
    root.put("hi", snap.spec.hi)
    root.put("n_bins", snap.spec.nBins)
    root.put("checkpoint", snap.checkpoint)
    root.put("batch_id", snap.lastBatchId)
    root.put("n", snap.n)
    val b = root.putObject("bins")
    // sorted for a stable file layout (diffable, digest-friendly)
    snap.bins.toSeq.sortBy(_._1).foreach { case (bin, c) =>
      b.put(bin.toString, c)
    }
    stateFile(spark, stateDir).write(mapper.writeValueAsBytes(root))
  }

  /** The checkpoint/binning binding rules — [[StreamingHeavyHitters]]'s
    * rule set with the binning in the k slot, enforced at both
    * chokepoints (ingest entry and per-batch for direct [[applyBatch]]
    * callers). */
  private[streaming] def checkStateBindings(st: HistSnapshot,
      stateDir: String, checkpoint: String, spec: HistogramSpec): Unit = {
    if (st.lastBatchId < 0L) return
    if (st.checkpoint != checkpoint)
      throw new IllegalStateException(
        s"histogram state at $stateDir was folded under checkpoint " +
          s"'${st.checkpoint}' but this stream runs under '$checkpoint' " +
          "— batch ids restart at 0 per checkpoint, so continuing would " +
          "skip new data as replays (or double-count on a rewound " +
          "checkpoint). Use a fresh state dir with a fresh checkpoint")
    if (st.spec != spec)
      throw new IllegalStateException(
        s"histogram state at $stateDir was folded with binning " +
          s"[${st.spec.lo}, ${st.spec.hi}) x ${st.spec.nBins} but this " +
          s"stream uses [${spec.lo}, ${spec.hi}) x ${spec.nBins} — " +
          "counts under one binning are meaningless under another. Use " +
          "a fresh state dir to change the binning")
  }

  /** Apply ONE micro-batch of values to the persisted state: skip if
    * already applied, else add the batch's exact bin counts. Package-
    * visible so idempotence and bindings are directly testable. */
  private[streaming] def applyBatch(spark: SparkSession, stateDir: String,
      spec: HistogramSpec, checkpoint: String, batch: DataFrame,
      valueCol: String, batchId: Long): HistSnapshot = {
    val st = readState(spark, stateDir)
    checkStateBindings(st, stateDir, checkpoint, spec)
    StreamingHeavyHitters.checkFreshStateVsCheckpoint(st.lastBatchId,
      stateDir, batchId,
      "histogram state")
    if (batchId <= st.lastBatchId) st // replayed batch: already folded
    else {
      val rows = HistogramSketch.counts(
        batch.select(col(valueCol).as("v")), "v", spec)
        .collect() // bounded: <= nBins+2 rows
      var bins = st.bins
      var added = 0L
      rows.foreach { r =>
        val bin = r.getInt(0); val c = r.getLong(1)
        bins = bins.updated(bin, bins.getOrElse(bin, 0L) + c)
        added += c
      }
      val next = HistSnapshot(spec, checkpoint, batchId, st.n + added, bins)
      writeState(spark, stateDir, next)
      next
    }
  }

  /** Cross-cluster merge — the quantile face of
    * [[StreamingMoments.mergeStates]]: combine ≥ 2 independently-folded
    * histogram states (one regional ingest each, IDENTICAL binning —
    * counts are meaningless under any other) into one state under
    * `outDir` by exact bin-wise addition (including the underflow/
    * overflow cells). The counts are exact, so the merged histogram
    * EQUALS what one cluster folding every region's arrivals would hold
    * — global quantiles from per-region O(bins) states, no data
    * movement. Same contract: locked input reads, every input folded, a
    * synthetic `merged:[...]` checkpoint that trips the ingest binding,
    * no clobbering. */
  def mergeStates(spark: SparkSession, inDirs: Seq[String],
      outDir: String): HistSnapshot = {
    val states = inDirs.map(d => d -> readStateLocked(spark, d))
    val (ckpt, lastId) = StateMerge.guard(spark, "histogram state",
      "global histogram", inDirs, outDir, states,
      (s: HistSnapshot) => s.lastBatchId, (s: HistSnapshot) => s.checkpoint,
      readState(spark, outDir).lastBatchId)
    val specs = states.map(_._2.spec).distinct
    if (specs.size > 1)
      throw new IllegalStateException(
        "mergeStates: inputs fold different binnings " +
          specs.map(s => s"[${s.lo}, ${s.hi}) x ${s.nBins}").mkString(", ") +
          " — bin counts are only meaningful relative to their binning; " +
          "merge only states folded with the identical spec (re-fold " +
          "divergent regions under one shared binning first)")
    val bins = scala.collection.mutable.Map.empty[Int, Long]
    states.foreach { case (_, st) =>
      st.bins.foreach { case (b, c) => bins.put(b, bins.getOrElse(b, 0L) + c) }
    }
    val merged = HistSnapshot(specs.head, ckpt, lastId,
      states.map(_._2.n).sum, bins.toMap)
    writeState(spark, outDir, merged)
    merged
  }

  /** One-call sample→histogram bootstrap: derive the binning from a
    * STANDING [[StreamingSample]] fold (its ≤ k carried values, read
    * through the linearizable locked read) via
    * [[HistogramSketch.fromSample]], then start the fold with that spec —
    * no corpus rescan to choose [lo, hi). The operational closing of the
    * misconfigured-range loop: the envelope's
    * `out_of_range_mass_fraction` alert says the bounds drifted, the
    * standing sample supplies fresh ones, this starts the re-fold.
    *
    * The derived spec lands in the state binding like any explicit one,
    * so a LATER ingestAutoBinned against the same state dir whose sample
    * has drifted to different bounds refuses loudly through the existing
    * binding guard (re-binning requires a fresh state dir, deliberately —
    * folded counts are only meaningful relative to their bins). Refuses
    * loudly when the sample is empty or carries no values (folded
    * without a valueCol).
    *
    * @return the started query and the derived spec (also recoverable
    *         from the state file after the first batch) */
  def ingestAutoBinned(spark: SparkSession, sourceDir: String,
      stateDir: String, checkpointDir: String, sampleStateDir: String,
      nBins: Int, coverage: Double = 0.99, valueCol: String = "value",
      maxFilesPerTrigger: Int = 0): (StreamingQuery, HistogramSpec) = {
    val sample = StreamingSample.readStateLocked(spark, sampleStateDir)
    if (sample.lastBatchId < 0L)
      throw new IllegalStateException(
        s"no folded sample state under $sampleStateDir — the auto-binned " +
          "fold derives its [lo, hi) from the standing sample; start the " +
          "sample stream (with a valueCol) first, or pass an explicit " +
          "HistogramSpec to ingest")
    if (!sample.entries.exists(_.value.exists(java.lang.Double.isFinite)))
      throw new IllegalStateException(
        s"sample state under $sampleStateDir carries no finite values " +
          "(folded without a valueCol, or every carried value is " +
          "null/NaN/Inf) — re-fold the sample with a valueCol so " +
          "fromSample has a distribution to derive bounds from")
    // the ONE derive arithmetic (fromValues — shared with the DataFrame
    // face and the REST derive route), over the ≤ k already-local
    // carried values: no Spark job, no subsampling
    val spec = HistogramSketch.fromValues(
      sample.entries.flatMap(_.value), nBins, coverage)
    (ingest(spark, sourceDir, stateDir, checkpointDir, spec, valueCol,
      maxFilesPerTrigger), spec)
  }

  /** Start the stream: parquet arrivals under `sourceDir` with a DOUBLE
    * `valueCol`, folded per micro-batch into the histogram state under
    * `stateDir`. Single-stream-per-state-dir contract, non-atomic-rename
    * refusal AND the conf-gated functional probe at entry — the
    * [[StreamingHeavyHitters.ingest]] chokepoint discipline verbatim. */
  def ingest(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String, spec: HistogramSpec,
      valueCol: String = "value",
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val srcSchema = new StructType().add(valueCol, DoubleType)
    val stateFs = statePath(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.FsCapabilities.assertAtomicRenameAtOpen(stateFs,
      new Path(stateDir), "streaming histogram state commit")
    val ckptPath = new Path(checkpointDir)
    val ckptId = ckptPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(ckptPath).toString
    val st0 = readState(spark, stateDir)
    checkStateBindings(st0, stateDir, ckptId, spec)
    val reader = spark.readStream.schema(srcSchema)
    val src =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(sourceDir)
      else reader.parquet(sourceDir)
    src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchShuffleTuning.tune(batch)
        applyBatch(spark, stateDir, spec, ckptId, batch, valueCol,
          batchId); ()
      }
      .start()
  }

  /** Interpolated quantile estimates from an already-read snapshot —
    * [[HistogramSketch.quantiles]] over the folded exact counts. Empty
    * on an empty state. */
  def quantilesFromSnapshot(st: HistSnapshot,
      probs: Seq[Double]): Seq[(Double, Double)] =
    if (st.n == 0L) Seq.empty
    else HistogramSketch.quantiles(st.spec, st.bins, probs)

  /** Quantile estimates from the persisted state (lock-free read). */
  def quantilesFromState(spark: SparkSession, stateDir: String,
      probs: Seq[Double]): Seq[(Double, Double)] =
    quantilesFromSnapshot(readState(spark, stateDir), probs)
}
