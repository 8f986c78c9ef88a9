package graft.core

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** An unknown-scheme FileSystem backed by local disk whose
  * `create(overwrite = false)` is NOT exclusive — it silently overwrites,
  * the way eventual-consistency object stores without a CAS primitive
  * behave. Lets the functional capability probe be exercised without a
  * real broken store. Top-level — Hadoop instantiates it reflectively. */
class NonExclusiveCreateFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("badfs:///")
  // RawLocalFileSystem implements exclusivity in more than one create
  // overload depending on the entry point — force overwrite in both
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)
  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
}

/** An unknown-scheme FileSystem with perfectly good primitives — for the
  * conf-extended blocklist leg (the static list presumes unknown schemes
  * safe; the conf key must be able to overrule that without a rebuild). */
class WeirdSchemeFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("weirdfs:///")
}

/** The two r13 escape hatches around the static non-atomic-scheme
  * blocklist: extending the list from conf, and the conf-gated functional
  * probe that refuses an unknown scheme whose primitives are broken. */
class FsCapabilitiesSpec extends SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  test("conf key extends the non-atomic blocklist without a rebuild") {
    hconf.setClass("fs.weirdfs.impl", classOf[WeirdSchemeFileSystem],
      classOf[org.apache.hadoop.fs.FileSystem])
    hconf.setBoolean("fs.weirdfs.impl.disable.cache", true)
    try {
      val fs = new Path("weirdfs:///tmp/x").getFileSystem(hconf)
      // unknown scheme: presumed safe by the static list
      assert(FsCapabilities.atomicRename(fs))
      FsCapabilities.assertAtomicRename(fs, "spec mutation")
      // operator knows better: one conf key, no rebuild
      hconf.set(FsCapabilities.ExtraNonAtomicKey, "otherfs, WEIRDFS")
      assert(!FsCapabilities.atomicRename(fs),
        "conf-listed scheme (case-insensitive, trimmed) not refused")
      val e = intercept[IllegalStateException] {
        FsCapabilities.assertAtomicRename(fs, "spec mutation")
      }
      assert(e.getMessage.contains("conf-"))
      // the advisory opt-in still overrides, same as the static list
      hconf.setBoolean(FsCapabilities.AllowNonAtomicKey, true)
      FsCapabilities.assertAtomicRename(fs, "spec mutation")
    } finally {
      hconf.unset("fs.weirdfs.impl")
      hconf.unset("fs.weirdfs.impl.disable.cache")
      hconf.unset(FsCapabilities.ExtraNonAtomicKey)
      hconf.unset(FsCapabilities.AllowNonAtomicKey)
    }
  }

  test("functional probe: broken exclusive-create fails it; local FS passes") {
    hconf.setClass("fs.badfs.impl", classOf[NonExclusiveCreateFileSystem],
      classOf[org.apache.hadoop.fs.FileSystem])
    hconf.setBoolean("fs.badfs.impl.disable.cache", true)
    try {
      val scratchRoot = Files.createTempDirectory("graft_probe_").toString
      val bad = new Path("badfs://" + scratchRoot).getFileSystem(hconf)
      assert(!FsCapabilities.probeAtomicRename(bad,
        new Path(scratchRoot, "probe_bad")))
      val local = new Path(scratchRoot).getFileSystem(hconf)
      assert(FsCapabilities.probeAtomicRename(local,
        new Path(scratchRoot, "probe_local")))
      // probe artifacts are cleaned up
      assert(!local.exists(new Path(scratchRoot, "probe_local")))
    } finally {
      hconf.unset("fs.badfs.impl")
      hconf.unset("fs.badfs.impl.disable.cache")
    }
  }

  test("probe sweep reclaims stale leftovers, retains mtime-0 and fresh peers") {
    val scratchRoot = Files.createTempDirectory("graft_probe_sweep_").toString
    val scratch = new Path(scratchRoot, "probe_scratch")
    val local = new Path(scratchRoot).getFileSystem(hconf)
    local.mkdirs(scratch)
    // a crashed prober's leftover, backdated past the 1h window
    val stale = java.nio.file.Paths.get(scratch.toString, "atomic_probe_dead_a")
    java.nio.file.Files.writeString(stale, "")
    java.nio.file.Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * 3600_000L))
    // an mtime-0 file: "infinitely old" by local arithmetic, but 0 means
    // the store doesn't track mtime — the sweep must NOT touch it
    val zero = java.nio.file.Paths.get(scratch.toString, "atomic_probe_zero_a")
    java.nio.file.Files.writeString(zero, "")
    java.nio.file.Files.setLastModifiedTime(zero,
      java.nio.file.attribute.FileTime.fromMillis(0))
    // a LIVE peer's fresh probe file — must survive the sweep
    val fresh = java.nio.file.Paths.get(scratch.toString, "atomic_probe_live_a")
    java.nio.file.Files.writeString(fresh, "")
    assert(FsCapabilities.probeAtomicRename(local, scratch))
    assert(!java.nio.file.Files.exists(stale), "stale leftover not reclaimed")
    assert(java.nio.file.Files.exists(zero),
      "mtime-0 file swept — an mtime-less store would lose live probes")
    assert(java.nio.file.Files.exists(fresh), "live peer's fresh probe swept")
  }

  test("conf-gated probe runs at streaming ingest entry, before any checkpoint WAL") {
    // r14: both streaming folds guard their state dir with the FULL
    // open-time check — without this, an unknown scheme with broken
    // primitives passed the blocklist-only entry guard even with the
    // probe opted in, and failed only at the first batch's FsSwap.commit,
    // AFTER the checkpoint WAL was laid down (the exact async-kill the
    // entry-chokepoint rule exists to prevent)
    hconf.setClass("fs.badfs.impl", classOf[NonExclusiveCreateFileSystem],
      classOf[org.apache.hadoop.fs.FileSystem])
    hconf.setBoolean("fs.badfs.impl.disable.cache", true)
    hconf.setBoolean(FsCapabilities.ProbeKey, true)
    try {
      val src = Files.createTempDirectory("graft_probe_ing_src_").toString
      val stateDir = Files.createTempDirectory("graft_probe_ing_st_").toString
      val ckpt = Files.createTempDirectory("graft_probe_ing_ck_")
        .toString + "/chk"
      val eFlat = intercept[IllegalStateException] {
        graft.streaming.StreamingHeavyHitters.ingest(spark, src,
          "badfs://" + stateDir, ckpt, denominator = 10L, sketchK = 16)
      }
      assert(eFlat.getMessage.contains("functional probe"), eFlat.getMessage)
      val eGrouped = intercept[IllegalStateException] {
        graft.streaming.StreamingGroupedHeavyHitters.ingest(spark, src,
          "badfs://" + stateDir, ckpt, denominator = 10L, sketchK = 16)
      }
      assert(eGrouped.getMessage.contains("functional probe"))
      // refusal happened at ENTRY: no stream started, no checkpoint WAL
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt)),
        "checkpoint WAL written despite the entry refusal")
    } finally {
      hconf.unset("fs.badfs.impl")
      hconf.unset("fs.badfs.impl.disable.cache")
      hconf.unset(FsCapabilities.ProbeKey)
    }
  }

  test("conf-gated probe at store open refuses a lying unknown scheme") {
    hconf.setClass("fs.badfs.impl", classOf[NonExclusiveCreateFileSystem],
      classOf[org.apache.hadoop.fs.FileSystem])
    hconf.setBoolean("fs.badfs.impl.disable.cache", true)
    try {
      val dir = Files.createTempDirectory("graft_probe_store_").toString
      // without the probe key: badfs is an unknown scheme, presumed safe —
      // the static guard alone lets the mutation through (the documented
      // gap the probe exists to close)
      val st0 = new graft.store.VectorStore(spark, "badfs://" + dir)
      st0.vacuum() // mutation proceeds: lease acquired on the fake FS
      // with the probe: the same open-time chokepoint refuses BEFORE any
      // write, because create(overwrite=false) is not exclusive there
      hconf.setBoolean(FsCapabilities.ProbeKey, true)
      val dir2 = Files.createTempDirectory("graft_probe_store2_").toString
      val st = new graft.store.VectorStore(spark, "badfs://" + dir2)
      val e = intercept[IllegalStateException] { st.vacuum() }
      assert(e.getMessage.contains("functional probe")
        && e.getMessage.contains(FsCapabilities.AllowNonAtomicKey))
      // reads are never refused
      assert(st.stats().recentCount == 0L)
      // the advisory opt-in overrides the probe verdict too
      hconf.setBoolean(FsCapabilities.AllowNonAtomicKey, true)
      val st2 = new graft.store.VectorStore(spark, "badfs://" + dir2)
      st2.vacuum()
    } finally {
      hconf.unset("fs.badfs.impl")
      hconf.unset("fs.badfs.impl.disable.cache")
      hconf.unset(FsCapabilities.ProbeKey)
      hconf.unset(FsCapabilities.AllowNonAtomicKey)
    }
  }
}
