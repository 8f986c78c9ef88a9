package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.operators.Profile
import graft.streaming.StreamingMoments.{emptyMoments, mergeMoments, momentsFromRow, Moments}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructType}

/** Sliding-window exact moments — the profiling family's TIME dimension.
  * Every other face folds ALL-TIME state; a drift monitor usually wants
  * "the mean/std over the last N micro-batches" (the recent mix, not the
  * stream's whole history — an all-time mean over a year of arrivals is
  * numb to a regression that started an hour ago). This fold keeps a
  * RING of per-batch exact moments (the newest `window` batches, each
  * one [[Profile.moments]]'s seven counters) and serves their
  * semilattice reduction as the window aggregate.
  *
  * Exactness without inverses: min/max are not subtractable, so a
  * running-total-minus-evicted design would be wrong the moment the
  * evicted batch held the extremum. The ring sidesteps inversion
  * entirely — eviction drops a slot, and the aggregate is RE-REDUCED
  * over the ≤ window remaining exact partials (O(window) driver
  * arithmetic per batch, BigInt sums — no error term, no FP drift). The
  * window aggregate therefore EQUALS the one-shot batch aggregate over
  * exactly the newest `window` batches' rows, which is what the oracle
  * row replays.
  *
  * The same ring design generalizes to any face whose per-batch summary
  * is bounded (per-batch histograms, HLL sketches, MG summaries: keep
  * the ring, re-merge over it), because it never needs subtraction —
  * this face ships first as the family's cheapest demonstration
  * (7 counters × window slots of state).
  *
  * State protocol is the family's verbatim: SwapStateFile swap, bindings
  * refused loudly — (checkpoint, valueCol, AND the window width: a
  * state folded at window 6 is not comparable to one at window 3, so
  * the width is part of the state's identity) — replay idempotence off
  * the last applied batch id, loud reads, linearizable
  * [[readStateLocked]]. Empty micro-batches occupy a slot (the window
  * counts BATCHES, i.e. ingest time, not rows — a quiet hour showing up
  * as a shrunken n IS the signal a rate monitor wants).
  *
  * 100 TB/day posture: per batch ONE map-side-combined aggregate
  * collapsing to a single row, one O(window) driver re-reduce, one
  * O(window) state file — at any stream length. */
object StreamingWindowedMoments {

  /** Folded windowed state: binding fields (value column, checkpoint,
    * window width), last applied batch id, and the ring — (batchId,
    * exact per-batch moments), oldest first, ≤ window entries. */
  case class WindowedMomentsSnapshot(valueCol: String, checkpoint: String,
      window: Int, lastBatchId: Long, ring: Seq[(Long, Moments)]) {
    /** The served view: the exact semilattice reduction of the ring —
      * the moments of exactly the newest ≤ window batches' rows. */
    def aggregate: Moments =
      if (ring.isEmpty) emptyMoments
      else ring.map(_._2).reduce(mergeMoments)
  }

  private val StateName = "moments_window_state.json"

  private def stateFile(spark: SparkSession, stateDir: String) =
    new graft.core.SwapStateFile(
      new Path(stateDir, StateName)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      stateDir, StateName, "moments_window_state.swap.inprogress",
      "windowed moments state")

  private def emptySnapshot =
    WindowedMomentsSnapshot("", "", -1, -1L, Seq.empty)

  private def parseSnapshot(stateDir: String)(
      txt: String): WindowedMomentsSnapshot = {
    val node = new ObjectMapper().readTree(txt)
    if (node.get("value_col") == null || node.get("checkpoint") == null ||
        node.get("window") == null)
      throw new IllegalStateException(
        s"windowed moments state file under $stateDir lacks the " +
          "value_col/checkpoint/window binding fields — refusing to " +
          "guess which stream it belongs to; re-fold from the source " +
          "with a fresh state dir")
    val ring = Seq.newBuilder[(Long, Moments)]
    val it = node.get("ring").elements()
    while (it.hasNext) {
      val e = it.next()
      ring += e.get("batch_id").asLong() -> StreamingMoments.parseMoments(e)
    }
    WindowedMomentsSnapshot(node.get("value_col").asText(),
      node.get("checkpoint").asText(), node.get("window").asInt(),
      node.get("batch_id").asLong(), ring.result())
  }

  /** Lock-free read ([[graft.core.SwapStateFile.read]] protocol); absent
    * file = empty stream. Monitors on a hot stream should use
    * [[readStateLocked]]. */
  def readState(spark: SparkSession,
      stateDir: String): WindowedMomentsSnapshot =
    stateFile(spark, stateDir).read(parseSnapshot(stateDir), emptySnapshot)

  /** Linearizable read under the writer's own swap lock. */
  def readStateLocked(spark: SparkSession,
      stateDir: String): WindowedMomentsSnapshot =
    stateFile(spark, stateDir)
      .readLocked(parseSnapshot(stateDir), emptySnapshot)

  private def writeState(spark: SparkSession, stateDir: String,
      snap: WindowedMomentsSnapshot): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("value_col", snap.valueCol)
    root.put("checkpoint", snap.checkpoint)
    root.put("window", snap.window)
    root.put("batch_id", snap.lastBatchId)
    val arr = root.putArray("ring")
    snap.ring.foreach { case (bid, m) =>
      val e = arr.addObject()
      e.put("batch_id", bid)
      StreamingMoments.putMoments(e, m)
    }
    stateFile(spark, stateDir).write(mapper.writeValueAsBytes(root))
  }

  private[streaming] def checkStateBindings(st: WindowedMomentsSnapshot,
      stateDir: String, checkpoint: String, valueCol: String,
      window: Int): Unit = {
    if (st.lastBatchId < 0L) return
    if (st.valueCol != valueCol)
      throw new IllegalStateException(
        s"windowed moments state at $stateDir was folded over column " +
          s"'${st.valueCol}' but this stream folds '$valueCol' — the " +
          "mixed state would be the moments of neither column. Use a " +
          "fresh state dir to profile a different column")
    WindowedRing.checkCommonBindings("windowed moments state", stateDir,
      st.checkpoint, checkpoint, st.window, window)
  }

  /** Apply ONE micro-batch: skip if already applied, else append the
    * batch's exact moments to the ring and evict past the window.
    * Package-visible (repo-wide: the REST spec drives deterministic
    * batch ORDER through it, which a real stream can't guarantee
    * without the mtime-forcing staging) so idempotence, bindings, and
    * eviction are directly testable. */
  private[graft] def applyBatch(spark: SparkSession, stateDir: String,
      window: Int, checkpoint: String, batch: DataFrame, valueCol: String,
      batchId: Long): WindowedMomentsSnapshot = {
    val st = readState(spark, stateDir)
    checkStateBindings(st, stateDir, checkpoint, valueCol, window)
    StreamingHeavyHitters.checkFreshStateVsCheckpoint(st.lastBatchId,
      stateDir, batchId,
      "windowed moments state")
    if (batchId <= st.lastBatchId) st // replayed batch: already folded
    else {
      val bm = momentsFromRow(
        Profile.moments(batch, valueCol).head(), 0,
        s"windowed moments fold at $stateDir (batch $batchId)")
      val next = WindowedMomentsSnapshot(valueCol, checkpoint, window,
        batchId, WindowedRing.slide(st.ring, batchId -> bm, window))
      writeState(spark, stateDir, next)
      next
    }
  }

  /** Start the stream: parquet arrivals under `sourceDir` with a LONG
    * `valueCol`, the newest `window` micro-batches' exact moments kept
    * as the ring under `stateDir`. Same entry-time chokepoint guards as
    * the rest of the family. */
  def ingest(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String, window: Int, valueCol: String = "value",
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    WindowedRing.requireWindow(window)
    val srcSchema = new StructType().add(valueCol, LongType)
    val stateFs = new Path(stateDir, StateName)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.FsCapabilities.assertAtomicRenameAtOpen(stateFs,
      new Path(stateDir), "streaming windowed moments state commit")
    val ckptPath = new Path(checkpointDir)
    val ckptId = ckptPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(ckptPath).toString
    val st0 = readState(spark, stateDir)
    checkStateBindings(st0, stateDir, ckptId, valueCol, window)
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
        applyBatch(spark, stateDir, window, ckptId, batch, valueCol,
          batchId); ()
      }
      .start()
  }

  /** The window aggregate as a one-row relation — the same schema as
    * [[StreamingMoments.toDF]]/[[Profile.moments]], so the windowed view
    * and the batch operator over the window's rows are directly
    * comparable (and oracle-replayable). */
  def toDF(spark: SparkSession, st: WindowedMomentsSnapshot): DataFrame =
    StreamingMoments.toDF(spark,
      StreamingMoments.MomentsSnapshot(st.valueCol, st.checkpoint,
        st.lastBatchId, st.aggregate))
}
