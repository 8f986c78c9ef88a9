package graft.streaming

/** The sliding-window ring CONTRACT — one implementation of the pieces
  * every windowed face must agree on, so the refusal messages and the
  * eviction rule cannot drift between instantiations
  * ([[StreamingWindowedMoments]], [[StreamingWindowedHistogram]], and
  * any future ring over bounded per-batch summaries — HLL registers, MG
  * counters). Face-specific state IO (the payload and binding codecs)
  * stays with each face, where the types genuinely differ; a THIRD
  * instantiation should promote the whole state-file scaffold (parse/
  * write/read/applyBatch skeleton) into a generic ring store — two
  * faces' worth of duplication is the documented threshold. */
private[streaming] object WindowedRing {

  def requireWindow(window: Int): Unit =
    require(window > 0, s"window must be positive, got $window")

  /** The two ring-universal binding refusals: checkpoint identity (the
    * family rule) and WINDOW WIDTH identity (ring-specific: widening
    * cannot recover already-evicted batches, narrowing silently
    * reinterprets history). Face-specific bindings (value column /
    * binning) are checked by the caller after this. */
  def checkCommonBindings(face: String, stateDir: String,
      stCheckpoint: String, checkpoint: String, stWindow: Int,
      window: Int): Unit = {
    if (stCheckpoint != checkpoint)
      throw new IllegalStateException(
        s"$face at $stateDir was folded under checkpoint " +
          s"'$stCheckpoint' but this stream runs under '$checkpoint' — " +
          "batch ids restart at 0 per checkpoint, so continuing would " +
          "skip new data as replays (or double-count on a rewound " +
          "checkpoint). Use a fresh state dir with a fresh checkpoint")
    if (stWindow != window)
      throw new IllegalStateException(
        s"$face at $stateDir was folded at window=$stWindow but this " +
          s"stream uses window=$window — a window's ring is only " +
          "meaningful at its own width (widening cannot recover " +
          "already-evicted batches; narrowing silently reinterprets " +
          "history). Use a fresh state dir to change the window")
  }

  /** The eviction rule: append the new slot, keep the newest `window`.
    * ONE definition so every face slides identically (empty batches
    * occupy slots — the window counts ingest time, not rows). */
  def slide[T](ring: Seq[T], entry: T, window: Int): Seq[T] =
    (ring :+ entry).takeRight(window)
}
