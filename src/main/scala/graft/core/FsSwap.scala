package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tmp+swap commit with marker-bracketed crash recovery — the ONE
  * implementation of the contract shared by the store's tier rewrites
  * (`VectorStore.swap`/`recoverSwaps`) and the streaming accepted-state
  * compaction (`Streaming.compactAcceptedState`/`recoverStateSwap`); the
  * two used to carry hand-copied versions that had already drifted.
  *
  * Protocol: a writer fully materializes `tmp`, then [[commit]] writes the
  * MARKER (the durable signal "this `tmp` is complete and committed to
  * replacing `live`"), deletes `live`, renames `tmp` into place, and drops
  * the marker. [[recover]], run at open time, finishes a marker-evidenced
  * swap from any crash point; with NO marker it only adopts a `tmp` whose
  * live dir is MISSING (a pre-marker-era crash between delete and rename —
  * no live writer can be mid-swap there, because a live swap holds its
  * marker until after the rename), and it leaves a markerless `tmp` next
  * to an intact live dir untouched: that may be a CONCURRENT writer's
  * in-flight rewrite, and the next rewrite clobbers it anyway (all tier
  * rewrites write `tmp` with SaveMode.Overwrite).
  *
  * Concurrency contract: a SINGLE WRITER per swapped path (any number of
  * readers). The marker makes recovery safe against crashed writers, not
  * against two live writers racing the same path — commit's `exists(tmp)`
  * re-check only narrows that window (a concurrent open's recovery may
  * have finished the swap already), it does not close it. */
object FsSwap {

  def commit(fs: FileSystem, live: Path, tmp: Path, marker: Path,
      markerContent: String = "{}"): Unit = {
    val out = fs.create(marker, true)
    try out.write(markerContent.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(tmp)) { // a concurrent open's recover may have finished it
      fs.delete(live, true)
      fs.rename(tmp, live)
    }
    fs.delete(marker, false)
  }

  def recover(fs: FileSystem, live: Path, tmp: Path, marker: Path): Unit = {
    if (fs.exists(tmp)) {
      if (fs.exists(marker)) {
        fs.delete(live, true)
        fs.rename(tmp, live)
        fs.delete(marker, false)
      } else if (!fs.exists(live)) fs.rename(tmp, live)
    } else if (fs.exists(marker)) fs.delete(marker, false) // swap finished, marker orphaned
  }
}
