package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory single-writer lease over a store root — the ENFORCEMENT of the
  * contract [[FsSwap]]'s scaladoc only documents. Every mutating store
  * entry point runs under [[withLease]]; a second live writer gets a loud
  * `ConcurrentWriterException` instead of undefined behavior, while
  * readers never touch the lease at all.
  *
  * Mechanics: acquisition is an EXCLUSIVE create of `<root>/_writer.lease`
  * (`FileSystem.create(overwrite = false)` — the atomic primitive on
  * local FS and HDFS; on S3-like stores without atomic create the lease
  * would degrade to best-effort advisory, which [[FsCapabilities]] turns
  * from a documented caveat into a mechanism: the outermost acquire
  * REFUSES known non-atomic schemes unless the operator opts in). The
  * file body records owner (`pid@host`), a random token, and the acquire
  * time. A lease older than `ttlMs` is STALE — its writer is presumed
  * crashed (crash state itself is handled by [[FsSwap.recover]] at the
  * next open) — and may be broken and re-acquired; the delete+recreate
  * race between two breakers is resolved by the exclusive create (exactly
  * one wins). Release re-reads the file and deletes it only when the
  * token still matches, so a breaker that legitimately took over a stale
  * lease can't have its fresh lease deleted by the stale owner's
  * `finally`.
  *
  * Reentrant per handle: compound operations (migrate → auto-rebalance,
  * insert → insertDF) nest `withLease` freely; depth counting keeps one
  * FS create/delete pair per outermost call. The handle itself is
  * synchronized, matching the store's one-writer-thread usage.
  *
  * TTL default (30 min) is sized to bound the longest mutation the store
  * runs (full-tier vacuum/compaction at scale). There is deliberately no
  * background heartbeat thread; instead every swap COMMIT point calls
  * [[renewAndVerify]], which re-reads the lease, aborts loudly if it was
  * broken/taken over (a writer stalled past TTL must not install its
  * rewrite concurrently with the usurper's), and otherwise stamps a
  * token-bound HEARTBEAT sidecar — so a long mutation's TTL clock
  * restarts at each commit it makes, and the TTL needs only to cover the
  * longest span BETWEEN commits, not the whole operation. The lease file
  * itself is written once per hold and never rewritten (see [[hbPath]]
  * for why in-place renewal would be unsound). */
final class WriterLease(fs: FileSystem, root: Path, ttlMs: Long,
    leaseName: String = "_writer.lease") {

  // default: a `_`-prefixed file INSIDE the root dir (hidden from Spark's
  // file index). Swapped dirs (saved HNSW indexes) pass a custom name and
  // a parent root instead — a lease inside a dir that swap RENAMES would
  // travel with the rename and stop guarding the path.
  val leasePath = new Path(root, leaseName)
  /** Renewal heartbeat sidecar: `token\nts`, rewritten at each commit
    * point. The LEASE file is immutable for the duration of a hold —
    * rewriting it in place would open repeated truncate-then-write
    * windows in which a concurrent [[acquire]] reads an empty lease,
    * concludes crash debris, and breaks a LIVE writer. The sidecar's own
    * transient emptiness endangers nothing: staleness falls back to the
    * lease's base timestamp, and the breaker re-reads a present-but-
    * unreadable heartbeat before acting (same bounded-re-read rule as
    * the lease itself). */
  private val hbPath = new Path(root, leaseName + ".hb")
  private val token = java.util.UUID.randomUUID().toString
  private var depth = 0
  // the conf-gated functional FS probe runs at most once per handle (it
  // costs real FS round-trips); guarded by the handle's own synchronized
  private var probed = false

  private def ownerString: String =
    s"${ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}"

  def withLease[T](body: => T): T = synchronized {
    if (depth > 0) { depth += 1; try body finally depth -= 1 }
    else {
      // every mutation passes here exactly once (outermost acquire) —
      // the one chokepoint where a non-atomic-rename filesystem must
      // refuse loudly instead of degrading the lease to advisory. The
      // r13 open-time form also runs the conf-gated FUNCTIONAL probe
      // (exclusive-create + rename-visibility in a scratch dir under the
      // root) the first time this handle acquires, so an unknown scheme
      // that LIES about its primitives is refused too, not just the
      // statically/conf-listed ones.
      if (!probed) {
        FsCapabilities.assertAtomicRenameAtOpen(fs, root,
          "acquiring the writer lease")
        probed = true
      } else FsCapabilities.assertAtomicRename(fs, "acquiring the writer lease")
      acquire()
      depth = 1
      try body finally { depth = 0; release() }
    }
  }

  /** (owner, token, acquiredMs) of the current lease file, if readable. */
  def readLease(): Option[(String, String, Long)] =
    try {
      val in = fs.open(leasePath)
      val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
      // fixed 3-line format written by tryCreate — no JSON parser needed.
      // The nonEmpty guard matters: a torn read of a mid-flush lease
      // ("owner\ntoken\n") matches the 3-element pattern with ts = "" and
      // toLong would throw NumberFormatException PAST the IOException
      // catch; torn = transiently unreadable, the same None as any other
      // debris
      txt.split("\n", -1) match {
        case Array(o, t, ts, _*) if ts.trim.nonEmpty &&
            ts.trim.forall(_.isDigit) => Some((o, t, ts.trim.toLong))
        case _ => None
      }
    } catch { case _: java.io.IOException => None }

  /** Mid-mutation ownership re-assertion + heartbeat, called at each
    * FsSwap.commit point: if this handle's token is still on the lease,
    * write a fresh timestamp to the HEARTBEAT sidecar (the TTL window
    * restarts — a legal long mutation keeps its exclusivity as long as it
    * keeps committing); if the lease was broken and taken over (this
    * writer stalled past TTL), throw BEFORE the caller installs a rewrite
    * that would race the usurper's. The lease FILE itself is never
    * rewritten mid-hold — see [[hbPath]]. */
  def renewAndVerify(): Unit = synchronized {
    require(depth > 0, "renewAndVerify outside withLease")
    readLease() match {
      case Some((_, tok, _)) if tok == token =>
        val out = fs.create(hbPath, true)
        try out.write(s"$token\n${System.currentTimeMillis()}\n".getBytes(UTF_8))
        finally out.close()
      case other =>
        throw new WriterLease.ConcurrentWriterException(
          s"writer lease $leasePath was ${other.fold("removed")(o =>
            s"taken over by ${o._1}")} mid-mutation (this writer stalled " +
            "past the TTL?); aborting before installing a rewrite that " +
            "would race the new lease holder")
    }
  }

  /** (token, ts) of the heartbeat sidecar, if readable. */
  private def readHeartbeat(): Option[(String, Long)] =
    try {
      val in = fs.open(hbPath)
      val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
      txt.split("\n", -1) match {
        case Array(t, ts, _*) if ts.trim.nonEmpty &&
            ts.trim.forall(_.isDigit) => Some((t, ts.trim.toLong))
        case _ => None
      }
    } catch { case _: java.io.IOException => None }

  /** The lease's effective timestamp: its base acquire time, advanced by
    * any token-matching heartbeat. A heartbeat that is PRESENT but
    * momentarily unreadable (a renewer mid truncate-write) gets the same
    * bounded re-read as the lease in [[acquire]] — a live, renewing
    * writer must never read as stale through that window. */
  private def effectiveTs(leaseTok: String, baseTs: Long,
      retry: Boolean = true): Long = {
    var hb = readHeartbeat()
    var tries = 0
    while (retry && hb.isEmpty && tries < 3 &&
        (try fs.exists(hbPath) catch { case _: java.io.IOException => false })) {
      Thread.sleep(50); hb = readHeartbeat(); tries += 1
    }
    hb match {
      case Some((t, ts)) if t == leaseTok => math.max(baseTs, ts)
      case _ => baseTs // absent, unreadable, or a previous holder's
    }
  }

  /** (owner, token, effectiveMs) — the lease with any renewal heartbeat
    * folded in, for observability surfaces. Single NON-retrying heartbeat
    * read: a health probe must never sleep out a renewer's write window —
    * only a BREAKER (acquire) needs the bounded re-read, because only a
    * breaker acts on staleness. Worst case here is a momentarily
    * conservative (base-ts) age reading. */
  def effectiveLease(): Option[(String, String, Long)] =
    readLease().map { case (o, t, ts) => (o, t, effectiveTs(t, ts, retry = false)) }

  /** A lease held by a process other than this handle, still inside TTL. */
  def heldByOther(): Boolean = readLease() match {
    case Some((_, tok, ts)) =>
      tok != token && System.currentTimeMillis() - effectiveTs(tok, ts) <= ttlMs
    case None => false
  }

  private def tryCreate(): Boolean =
    try {
      val out = fs.create(leasePath, false) // exclusive: fails if it exists
      try out.write(s"$ownerString\n$token\n${System.currentTimeMillis()}\n"
        .getBytes(UTF_8))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  private def acquire(): Unit = {
    if (tryCreate()) return
    // exclusive create + body write are two steps: a racer's lease may be
    // momentarily empty/unreadable — re-read briefly before concluding
    // it's crash debris, so a LIVE writer's fresh lease is never broken
    var lease = readLease()
    var tries = 0
    while (lease.isEmpty && tries < 3 && fs.exists(leasePath)) {
      Thread.sleep(50); lease = readLease(); tries += 1
    }
    lease match {
      case Some((owner, tok, ts)) if tok != token => // compute eff ONCE
        val age = System.currentTimeMillis() - effectiveTs(tok, ts)
        if (age <= ttlMs) throw new WriterLease.ConcurrentWriterException(
          s"store at '$root' is locked by writer $owner " +
            s"(lease ${leasePath}, effective age $age ms, " +
            s"ttl $ttlMs ms); concurrent writers are not allowed — retry " +
            "after the other writer finishes, or delete the lease file if " +
            "that process is known dead")
        // stale beyond TTL (base and heartbeat): break below
        fs.delete(hbPath, false)
        fs.delete(leasePath, false)
        if (!breakAndVerify()) acquire()
      case _ =>
        // stale beyond TTL (base AND heartbeat), or persistently
        // unreadable crash debris — the debris includes the heartbeat
        fs.delete(hbPath, false)
        fs.delete(leasePath, false)
        if (!breakAndVerify()) acquire() // lost the race: re-evaluate
    }
  }

  /** Break-path create with read-back verification. Stale-break is
    * delete-then-create — NOT atomic across processes: a second breaker
    * that also judged the lease stale can delete THIS breaker's freshly
    * created lease (it looks like the same stale path to it) and create
    * its own, leaving two handles each believing they hold the lease
    * until the next [[renewAndVerify]] commit point. Re-reading after the
    * exclusive create and confirming the token is OURS (same bounded
    * re-read as [[acquire]]'s debris check, tolerating our own write's
    * visibility lag) narrows the double-hold window to the read-back
    * instant; a mismatch means another breaker usurped us — report
    * failure so the caller re-evaluates against the NEW lease. */
  private def breakAndVerify(): Boolean = {
    if (!tryCreate()) return false
    var lease = readLease()
    var tries = 0
    while (tries < 3 && !lease.exists(_._2 == token) &&
        (try fs.exists(leasePath) catch { case _: java.io.IOException => false })) {
      Thread.sleep(50); lease = readLease(); tries += 1
    }
    lease.exists(_._2 == token)
  }

  private def release(): Unit = readLease() match {
    case Some((_, tok, _)) if tok == token =>
      fs.delete(hbPath, false)
      fs.delete(leasePath, false)
    case _ => // lease broken/taken while we ran (stalled past TTL) — not ours to delete
  }
}

object WriterLease {
  class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)
}
