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
  * replacing `live`"), moves `live` aside, renames `tmp` into place, and
  * drops the marker. [[recover]], run at open time, finishes a
  * marker-evidenced swap from any crash point; with NO marker it only
  * adopts a `tmp` whose live dir is MISSING (a pre-marker-era crash — no
  * live writer can be mid-swap there, because a live swap holds its marker
  * until after the rename), and it leaves a markerless `tmp` next to an
  * intact live dir untouched: that may be a CONCURRENT writer's in-flight
  * rewrite, and the next rewrite clobbers it anyway (all tier rewrites
  * write `tmp` with SaveMode.Overwrite).
  *
  * Safety under concurrent callers: the live dir is never deleted — it is
  * renamed aside (`<live>_old`) and discarded only after the new live dir
  * is in place — and the aside/rename/cleanup sequence runs under a SWAP
  * LOCK (a sibling `<live>_swap.lock` file taken by exclusive create,
  * plus a per-path JVM monitor), so two recoveries of the same
  * marker-evidenced swap serialize instead of interleaving destructively.
  * Unchecked-interleaving recovery was a real race: `recover` used to
  * delete(live) then rename(tmp, live) with the rename result ignored, so
  * racer A's installed result could be deleted by racer B, silently
  * leaving the tier missing. Hadoop's local rename is not even atomic
  * under contention (it falls back to copy+delete and throws), which is
  * why this serializes rather than attempting lock-free convergence. A
  * lock older than [[LockStaleMs]] is presumed a crashed recoverer's and
  * is broken; a caller that cannot obtain the lock within
  * [[LockMaxWaitMs]] fails loudly rather than proceeding unserialized.
  * The holder RENEWS the lock (mtime touch) before every rename inside
  * the critical section, so a slow rename — the copy-fallback an
  * object-store "rename" degrades to, or a long GC pause — does not let
  * a waiter stale-break a live holder's lock mid-swap. The stale-break
  * heuristic compares the local clock against FS mtime, so it is only
  * sound where the two are reasonably aligned (same host, HDFS, NFS with
  * sane clocks); the renewal bounds the required alignment to
  * [[LockStaleMs]] per rename, not per swap.
  *
  * [[commit]] (the live-writer path) and [[recover]] (the crash path)
  * differ in failure handling: a recovery that cannot finish leaves the
  * marker for the next open — silent deferral is its contract. A live
  * writer's commit must NOT defer silently: the caller is about to report
  * success and persist counters describing data that never got installed,
  * while readers in this process keep serving the stale live dir
  * indefinitely (the dir exists, so nothing re-examines the marker until
  * the next store open). commit therefore retries the swap
  * [[CommitRetries]] times and THROWS if it still cannot complete — the
  * marker stays behind as recovery evidence, but the writer learns its
  * write is not live.
  *
  * The single-writer contract still governs PRODUCING `tmp` (two live
  * writers racing rewrites of one path remain exclusive by
  * `VectorStore`'s writer lease); crash recovery itself is safe from any
  * number of concurrent openers. */
object FsSwap {

  /** A swap lock file untouched for this long belongs to a crashed
    * recoverer (the critical section is a handful of renames). */
  val LockStaleMs: Long = 60000L
  /** Give up (loudly) if the lock cannot be obtained within this. */
  val LockMaxWaitMs: Long = 60000L
  /** Extra attempts a live writer's [[commit]] makes before failing
    * loudly (recovery retries at the NEXT open instead). */
  val CommitRetries: Int = 3

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Live-writer commit. Throws `IllegalStateException` if the swap cannot
    * be completed after [[CommitRetries]] retries — the marker is left in
    * place (next-open recovery will retry), but the CALLER must not report
    * success: its rewrite was never installed, and in-process readers are
    * still serving the pre-swap live dir. */
  def commit(fs: FileSystem, live: Path, tmp: Path, marker: Path,
      markerContent: String = "{}"): Unit = {
    // commit is rename-into-place — refuse on object stores (unless the
    // operator opted in) BEFORE the marker is written; recovery of
    // pre-existing swap state stays permissive on any filesystem
    FsCapabilities.assertAtomicRename(fs, s"swap commit of $tmp into $live")
    withSwapLock(fs, live) { renew =>
      // the marker is written INSIDE the swap lock (moved in r13): written
      // before it, a lock-holding reader's recovery could observe
      // (marker, tmp) mid-create, finish the swap, and DELETE the marker
      // while this writer's create() call is still setting permissions on
      // it — a chmod-on-vanished-file error that killed a healthy commit.
      // Under the lock, recovery participants are serialized out of the
      // window entirely; a crash before the marker lands leaves only a
      // markerless tmp beside an intact live dir, which recover
      // deliberately leaves alone and the next rewrite clobbers.
      val out = fs.create(marker, true)
      try out.write(markerContent.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // strict = a tmp-lost state THROWS instead of returning retryable:
      // retrying after the aside restore would misread the restored OLD
      // data as an installed swap and report false success
      var done = !fs.exists(marker) ||
        finishSwap(fs, live, tmp, marker, renew, strict = true)
      var attempt = 0
      while (!done && attempt < CommitRetries) {
        attempt += 1
        Thread.sleep(200L * attempt) // transient FS contention backs off
        done = !fs.exists(marker) ||
          finishSwap(fs, live, tmp, marker, renew, strict = true)
      }
      if (!done) throw new IllegalStateException(
        s"swap of $tmp into $live failed after ${CommitRetries + 1} attempts " +
          s"(rename refused); marker $marker retained for next-open recovery, " +
          "but THIS rewrite has NOT been installed — do not record it as done")
    }
  }

  def recover(fs: FileSystem, live: Path, tmp: Path, marker: Path): Unit = {
    // lock-free fast path: the common nothing-to-recover open costs two
    // exists probes and never creates a lock file
    if (!fs.exists(marker) && !fs.exists(tmp)) return
    withSwapLock(fs, live) { renew =>
      recoverUnderLock(fs, live, tmp, marker, renew)
    }
  }

  /** [[recover]]'s body, for callers already inside the swap lock. */
  private def recoverUnderLock(fs: FileSystem, live: Path, tmp: Path,
      marker: Path, renew: () => Unit): Unit = {
    // re-check under the lock: a concurrent recoverer may have finished.
    // An unfinishable swap defers silently (marker stays for next open).
    if (fs.exists(marker)) { finishSwap(fs, live, tmp, marker, renew); () }
    else if (fs.exists(new Path(tmp, "_SUCCESS")) && !fs.exists(live)) {
      // pre-marker-era crash between delete and rename: adopt the tmp —
      // but only a COMPLETE one (_SUCCESS): a markerless tmp still being
      // written by a live rewriter must not be yanked out from under it
      tryRename(fs, tmp, live); ()
    }
  }

  /** Linearizable read section: run `body` holding the SAME swap lock
    * [[commit]]'s rename sequence holds, after completing any evidenced
    * recovery under it. While `body` runs no commit can be mid-rename —
    * the live path is either fully installed or has genuinely never been
    * committed (a writer that has staged its tmp but not yet entered its
    * lock section linearizes AFTER this read — and since the marker is
    * written INSIDE the lock, a visible marker always belongs to a
    * lock-serialized commit or a crashed one, whose install the recovery
    * here finishes; the commit's own `!exists(marker)` re-check tolerates
    * a reader having finished it by design). The
    * price is blocking a live writer for `body`'s duration — keep `body`
    * to a read; monitors get a consistent snapshot without quiescing the
    * writer. Throws like [[recover]]'s lock path if the lock cannot be
    * obtained within [[LockMaxWaitMs]]. */
  def readLocked[T](fs: FileSystem, live: Path, tmp: Path, marker: Path)(
      body: => T): T =
    withSwapLock(fs, live) { renew =>
      recoverUnderLock(fs, live, tmp, marker, renew)
      body
    }

  /** Drive a marker-evidenced swap to completion from any crash state.
    * Caller holds the swap lock; `renew` touches the lock before each
    * rename so a slow rename cannot outlive the stale-break window. Every
    * rename is checked; the marker is dropped only once the new live dir
    * is observed in place, so a failure at any step leaves the marker as
    * evidence instead of a silently-missing tier. Returns true iff the
    * swap FINISHED (new live installed or already installed, marker
    * dropped); false means the marker remains and the swap must be
    * retried (commit) or deferred to the next open (recover). */
  private def finishSwap(fs: FileSystem, live: Path, tmp: Path,
      marker: Path, renew: () => Unit, strict: Boolean = false): Boolean = {
    val aside = new Path(live.getParent, live.getName + "_old")
    if (fs.exists(tmp)) {
      if (fs.exists(live)) {
        // a crashed recovery's aside dir holds pre-swap data that `tmp`
        // supersedes — clear it so the aside rename cannot collide
        fs.delete(aside, true)
        renew()
        if (!tryRename(fs, live, aside)) return false // marker stays
      }
      renew()
      if (tryRename(fs, tmp, live)) {
        fs.delete(aside, true)
        fs.delete(marker, false)
        true
      } else false
    } else if (fs.exists(live)) {
      // tmp consumed and live in place. Recovery: crash after the install
      // rename, only cleanup remains. Under a COMMIT's held lock the only
      // tmp consumer is an installer (our earlier attempt, or a recoverer
      // that raced in before we took the lock and died pre-cleanup), so
      // the same conclusion holds: the swap IS installed.
      fs.delete(aside, true)
      fs.delete(marker, false)
      true
    } else if (fs.exists(aside)) {
      // tmp gone but NOT installed (live missing, pre-swap data in the
      // aside). Keep the path serveable by restoring the aside — but the
      // REWRITE IS LOST: a strict (live-writer) caller must fail here,
      // NOT retry. Retrying used to poison the next attempt: with the
      // aside restored, the retry would hit the live-exists branch above,
      // mistake the restored OLD data for an installed swap, drop the
      // marker, and report success for a rewrite that never landed.
      renew()
      val restored = tryRename(fs, aside, live)
      if (strict) throw new IllegalStateException(
        s"swap tmp $tmp vanished without an install (pre-swap data " +
          (if (restored) s"restored from $aside" else
            s"STILL STRANDED in $aside — the restore rename failed too; " +
              "the live path is empty until the next open's recovery") +
          "); the rewrite is LOST — do not record it as done. " +
          "Marker retained as evidence.")
      false
    } else {
      // marker with no dirs at all: nothing here can finish it
      if (strict) throw new IllegalStateException(
        s"swap of $tmp into $live found neither tmp nor live nor aside; " +
          "the rewrite is LOST — do not record it as done")
      false
    }
  }

  /** Checked rename: Hadoop FileSystem.rename both returns false AND
    * throws (local FS copy-fallback) depending on how a race lands;
    * normalize to a boolean so callers can keep the marker on failure. */
  private def tryRename(fs: FileSystem, src: Path, dst: Path): Boolean =
    try fs.rename(src, dst)
    catch { case _: java.io.IOException => false }

  /** Serialize swap-finishing per live path: per-path JVM monitor for
    * same-process callers (VectorStore opens share one JVM in local mode)
    * plus an exclusive-create lock file for cross-process callers. The
    * body receives a RENEW thunk that touches the lock's mtime — called
    * before each rename so the [[LockStaleMs]] stale-break clock restarts
    * per step, never spanning a whole multi-rename swap. */
  private def withSwapLock[T](fs: FileSystem, live: Path)(
      body: (() => Unit) => T): T = {
    val mon = jvmLocks.computeIfAbsent(
      fs.makeQualified(live).toString, _ => new Object)
    mon.synchronized {
      val lock = new Path(live.getParent, live.getName + "_swap.lock")
      val deadline = System.currentTimeMillis() + LockMaxWaitMs
      var acquired = tryCreate(fs, lock)
      while (!acquired) {
        val age =
          try System.currentTimeMillis() -
            fs.getFileStatus(lock).getModificationTime
          catch { case _: java.io.IOException => Long.MaxValue } // vanished
        if (age > LockStaleMs) fs.delete(lock, false) // crashed recoverer
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"could not obtain swap lock $lock within $LockMaxWaitMs ms; " +
              "another recovery appears wedged — remove the lock file if " +
              "no recovering process is alive")
        else Thread.sleep(100)
        acquired = tryCreate(fs, lock)
      }
      val renew: () => Unit = () =>
        // mtime touch; best-effort (a missed renewal degrades to the old
        // fixed-window behavior, it cannot corrupt anything). NonFatal,
        // not just IOException: some Hadoop FileSystems throw
        // UnsupportedOperationException from setTimes, and an escaping
        // throw here would spuriously abort a live commit mid-critical-
        // section despite the documented best-effort intent.
        try fs.setTimes(lock, System.currentTimeMillis(), -1)
        catch { case scala.util.control.NonFatal(_) => () }
      try body(renew) finally fs.delete(lock, false)
    }
  }

  private def tryCreate(fs: FileSystem, p: Path): Boolean =
    try { fs.create(p, false).close(); true }
    catch { case _: java.io.IOException => false }
}
