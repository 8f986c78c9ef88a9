package graft.streaming

/** The shared cross-cluster merge contract — ONE implementation of the
  * guard ladder every face's `mergeStates` runs before its own
  * semilattice arithmetic, so the contract (and its remediation
  * messages) cannot drift across the twelve folds: arity and
  * self-output refusal, the empty-region refusal (a region that folded
  * nothing must not silently make the merged profile look complete),
  * the no-clobber rule on the output dir, and the synthesis of the
  * merged artifact's `merged:[ckpt,...]` checkpoint binding — a string
  * that can never equal a real FS-qualified checkpoint path, which is
  * what makes ingesting INTO a merged artifact trip each face's
  * existing checkpoint binding refusal. Face-specific binding equality
  * (value column / ordered pair / (k, salt) / (lgK, col) / binning / k)
  * stays with each face: the types and the remediation differ
  * genuinely. */
private[streaming] object StateMerge {

  /** Run the shared guard ladder; returns the merged artifact's
    * (checkpoint, lastBatchId) — checkpoint the sorted `merged:[...]`
    * synthesis, lastBatchId the max over inputs (observability only;
    * the synthetic checkpoint is what protects the artifact).
    *
    * @param face       the state's display name in errors, e.g.
    *                   "grouped moments state"
    * @param globalNoun what an omitted region would misreport, e.g.
    *                   "global profile" / "global sample"
    * @param states     (stateDir, locked-read snapshot) per input
    * @param priorLastBatchId the OUTPUT dir's current lastBatchId
    *                   (< 0 = nothing there, merge may proceed) */
  def guard[S](face: String, globalNoun: String, inDirs: Seq[String],
      outDir: String, states: Seq[(String, S)], lastBatchId: S => Long,
      checkpoint: S => String, priorLastBatchId: Long): (String, Long) = {
    require(inDirs.size >= 2,
      s"mergeStates needs >= 2 input state dirs, got ${inDirs.size}")
    require(!inDirs.contains(outDir),
      "mergeStates output dir must not be one of the inputs")
    states.find(s => lastBatchId(s._2) < 0L).foreach { case (d, _) =>
      throw new IllegalStateException(
        s"$face under $d holds no folded batches — refusing to merge " +
          s"an empty region (it would silently misreport the $globalNoun " +
          "as complete); start that fold or drop it from the merge")
    }
    if (priorLastBatchId >= 0L)
      throw new IllegalStateException(
        s"merge output dir $outDir already holds a folded $face — " +
          "merges never clobber; use a fresh output dir")
    ("merged:" + states.map(s => checkpoint(s._2)).sorted
      .mkString("[", ",", "]"),
      states.map(s => lastBatchId(s._2)).max)
  }

  /** The shared union-cap refusal for the grouped merges: regional
    * group sets may be disjoint, so the UNION can exceed what any one
    * region held. */
  def checkMergedGroupCap(face: String, mergedGroups: Int,
      maxGroups: Int): Unit =
    if (mergedGroups > maxGroups)
      throw new IllegalStateException(
        s"merged $face would hold $mergedGroups groups, past " +
          s"maxGroups=$maxGroups — the regional group sets union wider " +
          "than the cap. Raise maxGroups if the merged driver/monitor " +
          "can hold it, or coarsen the group key before folding")
}
