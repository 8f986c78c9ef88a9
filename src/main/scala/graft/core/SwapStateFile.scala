package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** A single JSON state file committed through [[FsSwap]]'s tmp+marker
  * protocol, with the lock-free read protocol that protocol requires —
  * extracted from `StreamingHeavyHitters.readState` so the grouped
  * streaming fold (and any future driver-side state) shares ONE
  * implementation of the subtle parts instead of a hand-copied protocol
  * that can drift (the same single-implementation rule as [[FsSwap]]
  * itself).
  *
  * Layout next to `live = <dir>/<name>`: tmp = `<name>_tmp`, marker =
  * `<dir>/<markerName>`, aside = `<name>_old` (FsSwap's naming; the
  * marker name is explicit because the flat MG state predates this class
  * and its specs pin `mg_state.swap.inprogress`, not
  * `mg_state.json.swap.inprogress`).
  *
  * Two reads:
  *  - [[read]] is LOCK-FREE: it never blocks a committing writer, at the
  *    price of the bounded-retry protocol below (and a loud error, never
  *    a phantom-empty snapshot, when retries exhaust under contention).
  *  - [[readLocked]] is LINEARIZABLE: it takes the same swap lock the
  *    writer's rename section holds ([[FsSwap.readLocked]]), so the state
  *    is either fully installed or provably never committed — the right
  *    call for monitoring endpoints polling a hot stream, which would
  *    otherwise eventually hit the lock-free path's contention error by
  *    design. It can block a writer for the read's duration (one small
  *    file), and throws if the swap lock cannot be obtained within
  *    [[FsSwap.LockMaxWaitMs]].
  */
final class SwapStateFile(fs: FileSystem, dir: String, name: String,
    markerName: String, what: String) {

  val live = new Path(dir, name)
  val tmp = new Path(dir, name + "_tmp")
  val marker = new Path(dir, markerName)

  /** Atomically install `bytes` as the state file ([[FsSwap.commit]]:
    * throws rather than silently deferring if the swap cannot finish). */
  def write(bytes: Array[Byte]): Unit = {
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    FsSwap.commit(fs, live, tmp, marker)
  }

  /** The artifact-free fast-path probe shared by [[read]] and
    * [[readLocked]] (ONE copy of the load-bearing artifact set): a state
    * dir holding NO swap artifact at all — no state file, marker, tmp,
    * or aside — has provably never had anything staged into it, with no
    * ABA risk and no lock/sleep cost: mid-swap always leaves the marker
    * (and the aside) visible, so an artifact-free listing is conclusive;
    * a first commit racing the listing linearizes AFTER the read. */
  private def artifactFree(): Boolean = {
    val artifacts = Set(live.getName, marker.getName, tmp.getName,
      live.getName + "_old")
    val listed =
      try fs.listStatus(new Path(dir)).map(_.getPath.getName).toSet
      catch { case _: java.io.FileNotFoundException => Set.empty[String] }
    listed.intersect(artifacts).isEmpty
  }

  /** Lock-free read; an absent file is the empty state. A reader may
    * COMPLETE a crashed writer's marker-evidenced swap here: the FsSwap
    * contract makes recovery safe from any number of concurrent callers
    * (lock-serialized), and a monitoring read that returned the pre-crash
    * state forever would be worse than one that finishes the evidenced
    * install. A read can also RACE a live writer's commit — the state
    * file is momentarily absent between the aside/install renames — so
    * "absent" is only believed when the (state absent, marker absent,
    * state still absent) observation is STABLE across two attempts 50 ms
    * apart; a single observation can be an ABA (commit N finished between
    * the probes, commit N+1 already mid-swap). The window is narrowed,
    * not eliminated — a lock-free reader cannot distinguish a
    * perpetually-mid-swap writer from an empty stream with certainty; a
    * consumer needing a linearizable view should use [[readLocked]]. */
  def read[T](parse: String => T, empty: => T): T = {
    // fast path (see artifactFree): keeps the double-observation cost
    // off the common fresh-start path (one listing vs two 50 ms waits)
    if (artifactFree()) return empty
    var attempt = 0
    var emptyObservations = 0
    var markerEverSeen = false
    while (attempt <= 5) {
      FsSwap.recover(fs, live, tmp, marker)
      try {
        if (!fs.exists(live)) {
          // swap evidence = the MARKER alone: commit writes it before
          // ever touching live, and drops it only after the install — a
          // tmp WITHOUT a marker is a pre-commit write crash remnant,
          // provably uncommitted, and must not wedge reads
          if (!fs.exists(marker)) {
            // re-probe live AFTER the marker probe: a live commit that
            // raced the first exists(live) (absent mid-swap) has, by the
            // time its marker is observed gone, already installed live.
            // One clean observation is still not proof (the ABA above) —
            // require it twice, 50 ms apart, before believing "empty"
            if (!fs.exists(live)) {
              emptyObservations += 1
              // a marker sighting earlier in THIS read proves a commit
              // had fully materialized its tmp — a state file must exist
              // after recovery, so "empty" would be contradictory: route
              // those traces to the loud exhaustion path instead
              if (emptyObservations >= 2 && !markerEverSeen) return empty
            } else emptyObservations = 0
            // live reappeared (or first clean observation): retry
          } else { markerEverSeen = true; emptyObservations = 0 }
          // marker present: a live commit mid-rename, or a crashed swap
          // recover couldn't finish — retry through the window, and FAIL
          // below rather than misreport lost/in-flight state as empty (a
          // restarted writer folding into a phantom-empty state would
          // destroy the real contents on its first write)
        } else {
          return parse(readText())
        }
      } catch {
        // mid-swap window: open raced the install rename. Unconditional
        // (no attempt guard) so the LAST attempt's race still exits
        // through the curated error below, never as a bare FNF. An FNF
        // is POSITIVE evidence the state file existed an instant ago —
        // reset the empty counter, or two ABA observations straddling
        // this sighting would still return a phantom-empty snapshot
        case _: java.io.FileNotFoundException => emptyObservations = 0
      }
      attempt += 1
      Thread.sleep(50)
    }
    // retries exhausted: loud, like FsSwap's own writer path — returning
    // "empty" here would silently discard the committed history. The
    // diagnostic discriminates on marker PERSISTENCE — NOT marker-ever-
    // seen (a healthy live commit holds its marker through its whole
    // live-absent window, so ever-seen would misdirect plain read
    // contention down the lost-tmp path). The probe is SYNCHRONIZED with
    // recovery: recover() serializes on the swap lock, so it returns only
    // after any live commit's rename section finishes — a marker that
    // survives a completed recover is one finishSwap could not clear (tmp
    // lost with no install), i.e. genuinely wedged, not a fresh commit
    // mid-window (a new commit starting in the instant between the
    // recover and the probe remains possible; the message says "may"). An
    // UNREADABLE probe defaults to the conservative branch — asserting
    // "the state is intact, just retry" on the same flaky FS that failed
    // the reads would invite a restarted writer to clobber recovery
    // evidence.
    FsSwap.recover(fs, live, tmp, marker)
    val markerStillThere =
      try fs.exists(marker)
      catch { case _: java.io.IOException => true }
    throw new IllegalStateException(
      if (markerStillThere) wedgedMessage(retried = true)
      else
        s"$what at $dir could not be read through the retry window: " +
          "every attempt raced an in-flight commit's rename and no swap " +
          "marker remains. The state is intact — this is read contention " +
          "against a continuously-committing stream; retry the read, use " +
          "the locked read, or quiesce the stream for a linearizable view")
  }

  /** Linearizable read under the writer's own swap lock (see class doc).
    * Under the lock, after recovery: a present file is the fully-installed
    * latest state; an absent file with no marker has provably never been
    * committed (empty); an absent file with a SURVIVING marker is a
    * genuinely wedged swap (tmp lost) — loud, same contract as [[read]]'s
    * exhaustion path. */
  def readLocked[T](parse: String => T, empty: => T): T = {
    // fast path (see artifactFree): a monitor polling a state dir no
    // commit has ever staged anything into must not take the swap lock
    // at all — locking would create the state dir and churn a lock file
    // per poll from a READ endpoint (FsSwap.recover's own fast path
    // exists for the same reason).
    if (artifactFree()) return empty
    FsSwap.readLocked(fs, live, tmp, marker) {
      if (fs.exists(live)) parse(readText())
      else if (fs.exists(marker))
        throw new IllegalStateException(wedgedMessage(retried = false))
      else empty
    }
  }

  /** ONE wedged-swap diagnostic for both read paths (specs match on its
    * fragments — two hand-copied versions had already drifted); only the
    * evidence clause differs, because the locked read makes ONE
    * observation under the swap lock while the lock-free path exhausts
    * a retry window first — the message must not overstate either. */
  private def wedgedMessage(retried: Boolean): String =
    s"$what at $dir is unreadable" +
      (if (retried) " after retries" else " (observed under the swap lock)") +
      s": the swap marker ${marker.getName} persists after recovery " +
      "attempts. A crashed commit may have lost its tmp — inspect the " +
      "state dir; do NOT fold new batches until resolved"

  private def readText(): String = {
    val in = fs.open(live)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
