package graft.core

import org.apache.hadoop.fs.FileSystem

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
  * the well-known object-store foot-gun, not to allowlist the world. */
object FsCapabilities {

  /** Schemes whose rename is a non-atomic copy+delete. */
  val NonAtomicRenameSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "swift", "oss", "cos")

  /** Hadoop conf key opting in to advisory-only locking on the schemes
    * above (reachable as `spark.hadoop.` + this key on a SparkSession). */
  val AllowNonAtomicKey = "graft.fs.allow-non-atomic-rename"

  /** True when `fs`'s scheme provides (or is presumed to provide) atomic
    * rename + exclusive create. */
  def atomicRename(fs: FileSystem): Boolean = {
    val scheme = Option(fs.getUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("file")
    !NonAtomicRenameSchemes.contains(scheme)
  }

  /** Throw unless `fs` renames atomically or the operator opted in. */
  def assertAtomicRename(fs: FileSystem, what: String): Unit =
    if (!atomicRename(fs) && !fs.getConf.getBoolean(AllowNonAtomicKey, false))
      throw new IllegalStateException(
        s"$what requires atomic rename/exclusive-create, but filesystem " +
          s"scheme '${fs.getUri.getScheme}' is a non-atomic object store — " +
          "the writer lease and swap commit would silently degrade to " +
          "advisory. Run against HDFS/local/an HDFS-semantics store, or " +
          s"accept advisory-only locking by setting $AllowNonAtomicKey=true " +
          "in the Hadoop conf (spark.hadoop. prefix on the session) when " +
          "an external scheduler already guarantees a single writer")
}
