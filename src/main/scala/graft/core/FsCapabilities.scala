package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Loud startup/mutation guard for filesystems without atomic
  * rename/exclusive-create semantics.
  *
  * [[WriterLease]] (exclusive `create(overwrite = false)`) and [[FsSwap]]
  * (rename-into-place commit) are sound on filesystems where those
  * primitives are atomic — local FS, HDFS, and HDFS-semantics stores. On
  * object stores ("rename" = server-side copy + delete, create is
  * read-after-write at best) both degrade to ADVISORY: two writers can
  * both believe they hold the lease, and a swap can be observed half-
  * installed. That degradation used to live only in scaladoc; this guard
  * makes it a MECHANISM — mutations against a known non-atomic scheme
  * refuse loudly at the first lease acquire / swap commit unless the
  * operator explicitly accepts advisory-only locking via the Hadoop conf
  * flag [[AllowNonAtomicKey]] (set
  * `spark.hadoop.graft.fs.allow-non-atomic-rename=true` on the session,
  * appropriate when an external scheduler already guarantees one writer).
  *
  * Reads and crash RECOVERY are never refused: recovery of pre-existing
  * swap state must stay possible on any filesystem the data already
  * lives on, and readers take no locks at all.
  *
  * The scheme list is a conservative blocklist of stores documented to
  * lack atomic directory rename; notably `abfs`/`abfss` (ADLS Gen2 with a
  * hierarchical namespace) and `hdfs` DO rename atomically and are not
  * listed. Unknown schemes are presumed safe — the guard exists to catch
  * the well-known object-store foot-gun, not to allowlist the world. Two
  * r13 escape hatches close the presumed-safe gap for operators who know
  * better than the static list:
  *
  *  - [[ExtraNonAtomicKey]] EXTENDS the blocklist from conf, no rebuild
  *    (`spark.hadoop.graft.fs.non-atomic-rename-schemes=myfs,otherfs`);
  *  - [[ProbeKey]] opts in to a FUNCTIONAL probe at store open
  *    ([[probeAtomicRename]]): exclusive-create + rename-visibility
  *    exercised in a scratch dir under the store path — a filesystem
  *    whose primitives fail the probe is refused with the same message
  *    as a blocklisted scheme, regardless of what its scheme claims.
  *    Off by default (a handful of FS round-trips per open, and some
  *    perfectly-atomic filesystems sit behind flaky perimeters where a
  *    transient error would block a legitimate open — the operator
  *    decides).
  */
object FsCapabilities {

  /** Schemes whose rename is a non-atomic copy+delete. */
  val NonAtomicRenameSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "swift", "oss", "cos")

  /** Hadoop conf key opting in to advisory-only locking on non-atomic
    * schemes (reachable as `spark.hadoop.` + this key on a SparkSession). */
  val AllowNonAtomicKey = "graft.fs.allow-non-atomic-rename"

  /** Hadoop conf key holding EXTRA comma-separated schemes to treat as
    * non-atomic, extending [[NonAtomicRenameSchemes]] without a rebuild. */
  val ExtraNonAtomicKey = "graft.fs.non-atomic-rename-schemes"

  /** Hadoop conf key opting in to the functional [[probeAtomicRename]]
    * at store open (see class doc). */
  val ProbeKey = "graft.fs.probe-atomic-rename"

  /** True when `fs`'s scheme provides (or is presumed to provide) atomic
    * rename + exclusive create, per the static blocklist plus any
    * [[ExtraNonAtomicKey]] conf extension. */
  def atomicRename(fs: FileSystem): Boolean = {
    val scheme = Option(fs.getUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("file")
    val extra = Option(fs.getConf.getTrimmedStrings(ExtraNonAtomicKey))
      .getOrElse(Array.empty[String])
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    !NonAtomicRenameSchemes.contains(scheme) && !extra.contains(scheme)
  }

  /** Throw unless `fs` renames atomically or the operator opted in. */
  def assertAtomicRename(fs: FileSystem, what: String): Unit =
    if (!atomicRename(fs) && !allowed(fs))
      throw refusal(fs, what,
        s"scheme '${fs.getUri.getScheme}' is a (statically or conf-) " +
          "listed non-atomic object store")

  /** Functional capability probe: exercise the two primitives the lease
    * and swap rest on, in `scratchDir` —
    *
    *  1. exclusive create: `create(p, overwrite = false)` must succeed
    *     once and FAIL on the second call (an FS that lets both succeed
    *     cannot host a writer lease);
    *  2. atomic rename visibility: after `rename(a, b)` succeeds, `a`
    *     must be gone and `b` present (a copy+delete "rename" observed
    *     mid-flight breaks the swap's reader guarantees; this probe
    *     catches the cruder failure of a rename that lies about its
    *     result or leaves both paths visible).
    *
    * Returns true iff both hold. Best-effort cleanup; a probe that cannot
    * even create its scratch files returns FALSE (conservative: the
    * mutation path would fail there too). NOTE this is a point-in-time
    * functional check, not a proof of atomicity under concurrency — it
    * exists to catch misconfigured/unknown filesystems at open time, not
    * to certify object stores as safe. */
  def probeAtomicRename(fs: FileSystem, scratchDir: Path): Boolean = {
    // per-invocation unique names: two concurrent probers of one store
    // (two handles' first lease acquire racing) must not touch each
    // other's probe files — with shared names, prober B's pre-clean
    // delete would make prober A's second create(overwrite=false)
    // spuriously SUCCEED and falsely refuse a healthy filesystem. Each
    // prober cleans only its own files; the scratch dir itself is only
    // removed when empty (non-recursive), never out from under a peer.
    val tag = java.util.UUID.randomUUID().toString
    val a = new Path(scratchDir, s"atomic_probe_${tag}_a")
    val b = new Path(scratchDir, s"atomic_probe_${tag}_b")
    try {
      fs.mkdirs(scratchDir)
      val first =
        try { fs.create(a, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!first) return false
      // reclaim a CRASHED prober's leftovers (unique names mean nobody
      // else ever deletes them): a probe file more than an hour older
      // than OUR OWN just-created file belongs to no live probe — a
      // probe is a handful of FS calls — keeping the scratch dir from
      // accumulating debris across kill -9'd opens. Ages are compared
      // in the STORE's clock (our fresh file's reported mtime is "now"),
      // so local-vs-store clock skew cannot make a peer's fresh probe
      // look stale; and the age test requires a REAL mtime — a store
      // that doesn't track modification time reports 0 (Hadoop's
      // default), which would read as infinitely old and let this sweep
      // delete a LIVE peer's fresh probe, recreating the exact race the
      // unique names prevent — so mtime <= 0 files (and stores whose
      // own "now" reads 0) are left alone: debris there waits for an
      // operator; wrongly refusing a healthy FS would be worse.
      // Best-effort, like the rest of the cleanup. Residual: a prober
      // SUSPENDED for over an hour between its two creates (VM
      // migration, laptop sleep) can have its file swept by a peer, in
      // which case its own probe concludes false and the open is
      // REFUSED with the broken-primitives message — spurious, but an
      // hour-long stall inside a five-call probe is an operator-visible
      // anomaly in its own right, and the refusal's remediation (re-run
      // the open) self-corrects it.
      try {
        val listed = fs.listStatus(scratchDir)
        // the store's own clock: our just-created file's reported mtime
        // (read from the listing the sweep needs anyway — no extra
        // round trip)
        val storeNow = listed.collectFirst {
          case s if s.getPath.getName == a.getName => s.getModificationTime
        }.getOrElse(0L)
        if (storeNow > 0L) {
          val cutoff = storeNow - 3600_000L
          listed.foreach { s =>
            val nm = s.getPath.getName
            if (nm.startsWith("atomic_probe_") && !nm.contains(tag) &&
                s.getModificationTime > 0 && s.getModificationTime < cutoff)
              fs.delete(s.getPath, false)
          }
        }
      } catch { case _: java.io.IOException => () }
      val second =
        try { fs.create(a, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (second) return false // exclusive create is not exclusive
      val renamed =
        try fs.rename(a, b)
        catch { case _: java.io.IOException => false }
      renamed && !fs.exists(a) && fs.exists(b)
    } catch {
      case _: java.io.IOException => false
    } finally {
      // each delete individually best-effort: chained in one try, the
      // first transient failure would skip the rest and strand files
      // that only a future prober's age sweep (if any) reclaims
      def quietDelete(p: Path): Unit =
        try fs.delete(p, false) catch { case _: java.io.IOException => () }
      quietDelete(a); quietDelete(b); quietDelete(scratchDir)
    }
  }

  /** Store-open guard combining both checks: the static/conf scheme list
    * always applies; the functional probe additionally runs when the
    * operator set [[ProbeKey]] (it writes to a scratch dir under
    * `storePath`, so it is only called from writable-open paths). Either
    * failure refuses with the same remediation message, unless
    * [[AllowNonAtomicKey]] opted in. */
  def assertAtomicRenameAtOpen(fs: FileSystem, storePath: Path,
      what: String): Unit = {
    assertAtomicRename(fs, what)
    if (fs.getConf.getBoolean(ProbeKey, false) && !allowed(fs) &&
        !probeAtomicRename(fs, new Path(storePath, ".fs_capability_probe")))
      throw refusal(fs, what,
        s"the functional probe ($ProbeKey) found exclusive-create or " +
          "rename-visibility broken on this filesystem")
  }

  private def allowed(fs: FileSystem): Boolean =
    fs.getConf.getBoolean(AllowNonAtomicKey, false)

  private def refusal(fs: FileSystem, what: String,
      why: String): IllegalStateException =
    new IllegalStateException(
      s"$what requires atomic rename/exclusive-create, but $why — " +
        "the writer lease and swap commit would silently degrade to " +
        "advisory. Run against HDFS/local/an HDFS-semantics store, or " +
        s"accept advisory-only locking by setting $AllowNonAtomicKey=true " +
        "in the Hadoop conf (spark.hadoop. prefix on the session) when " +
        "an external scheduler already guarantees a single writer")
}
