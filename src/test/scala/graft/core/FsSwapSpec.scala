package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}

/** The swap protocol's crash/race matrix, driven state-by-state — the
  * destructive delete-then-rename recovery regression (two concurrent
  * recoveries losing the live dir) is pinned here for good. */
class FsSwapSpec extends SparkSpec {

  private def fsFor(p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkDir(fs: FileSystem, p: Path, tag: String): Unit = {
    fs.mkdirs(p)
    val out = fs.create(new Path(p, "data.txt"), true)
    try out.write(tag.getBytes("UTF-8")) finally out.close()
  }

  private def tagOf(fs: FileSystem, p: Path): String = {
    val in = fs.open(new Path(p, "data.txt"))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def freshRoot(): (FileSystem, Path, Path, Path) = {
    val root = java.nio.file.Files.createTempDirectory("graft_fsswap_").toString
    val fs = fsFor(root)
    (fs, new Path(root, "live"), new Path(root, "live_tmp"),
      new Path(root, "swap.marker"))
  }

  test("commit replaces live with tmp and cleans marker + aside") {
    val (fs, live, tmp, marker) = freshRoot()
    mkDir(fs, live, "old"); mkDir(fs, tmp, "new")
    FsSwap.commit(fs, live, tmp, marker)
    assert(tagOf(fs, live) == "new")
    assert(!fs.exists(tmp) && !fs.exists(marker))
    assert(!fs.exists(new Path(live.getParent, "live_old")))
  }

  test("recover finishes a marker-evidenced swap from every crash state") {
    // state A: crashed right after writing the marker (live+tmp intact)
    val (fs, live, tmp, marker) = freshRoot()
    mkDir(fs, live, "old"); mkDir(fs, tmp, "new")
    fs.create(marker, true).close()
    FsSwap.recover(fs, live, tmp, marker)
    assert(tagOf(fs, live) == "new" && !fs.exists(tmp) && !fs.exists(marker))

    // state B: crashed after moving live aside (aside present, live gone)
    val (fs2, live2, tmp2, marker2) = freshRoot()
    mkDir(fs2, new Path(live2.getParent, "live_old"), "old")
    mkDir(fs2, tmp2, "new")
    fs2.create(marker2, true).close()
    FsSwap.recover(fs2, live2, tmp2, marker2)
    assert(tagOf(fs2, live2) == "new")
    assert(!fs2.exists(tmp2) && !fs2.exists(marker2))
    assert(!fs2.exists(new Path(live2.getParent, "live_old")))

    // state C: crashed after the rename into place (only cleanup remains)
    val (fs3, live3, tmp3, marker3) = freshRoot()
    mkDir(fs3, live3, "new")
    mkDir(fs3, new Path(live3.getParent, "live_old"), "old")
    fs3.create(marker3, true).close()
    FsSwap.recover(fs3, live3, tmp3, marker3)
    assert(tagOf(fs3, live3) == "new" && !fs3.exists(marker3))
    assert(!fs3.exists(new Path(live3.getParent, "live_old")))
  }

  test("recovery NEVER deletes the live dir: a recover storm converges") {
    // the r9 regression: recover() did delete(live); rename(tmp, live) with
    // unchecked returns, so two racers could leave live MISSING (one
    // renames tmp in, the other deletes the result). Race N threads over
    // the same marker-evidenced swap and require: live exists, holds the
    // NEW data, and the marker is gone — on every one of 20 rounds.
    for (round <- 0 until 20) {
      val (fs, live, tmp, marker) = freshRoot()
      mkDir(fs, live, "old"); mkDir(fs, tmp, "new")
      fs.create(marker, true).close()
      val threads = (0 until 8).map { _ =>
        new Thread(() => FsSwap.recover(fs, live, tmp, marker))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(fs.exists(live), s"round $round: live dir lost — destructive race")
      assert(tagOf(fs, live) == "new", s"round $round: live holds stale data")
      assert(!fs.exists(tmp), s"round $round: tmp not consumed")
      // marker may need one more sweep if a loser backed off mid-race —
      // but a single follow-up recover (the next open) must clear it
      FsSwap.recover(fs, live, tmp, marker)
      assert(!fs.exists(marker), s"round $round: marker stuck")
    }
  }

  test("markerless tmp beside an intact live dir is left untouched") {
    val (fs, live, tmp, marker) = freshRoot()
    mkDir(fs, live, "old"); mkDir(fs, tmp, "concurrent-writer-wip")
    FsSwap.recover(fs, live, tmp, marker)
    assert(tagOf(fs, live) == "old" && fs.exists(tmp))
  }

  test("commit throws loudly when the swap cannot be completed") {
    // the silent-deferral regression: a live writer whose swap cannot
    // finish must NOT return success (its counters would describe a
    // rewrite that was never installed, and in-process readers would
    // serve the stale live dir until the next open). The unfinishable
    // state here: tmp vanished before commit (neither tmp, live, nor
    // aside exists), so finishSwap can never complete the swap.
    val (fs, live, tmp, marker) = freshRoot()
    val e = intercept[IllegalStateException](FsSwap.commit(fs, live, tmp, marker))
    assert(e.getMessage.contains("LOST"))
    // the marker stays behind as recovery evidence
    assert(fs.exists(marker))
  }

  test("commit on a tmp-lost state restores the aside and throws — never retries into false success") {
    // the poisoned-retry regression: live renamed aside, tmp consumed
    // WITHOUT an install (the degraded-rename failure mode). A retrying
    // commit used to restore the aside, then misread the restored OLD
    // data as an installed swap on the next attempt, drop the marker,
    // and report success for a rewrite that never landed.
    val (fs, live, tmp, marker) = freshRoot()
    val aside = new Path(live.getParent, live.getName + "_old")
    fs.mkdirs(aside)
    val o = fs.create(new Path(aside, "old.txt"), true)
    o.write("pre-swap".getBytes("UTF-8")); o.close()
    // state: no live, no tmp, pre-swap data stranded in the aside
    val e = intercept[IllegalStateException](FsSwap.commit(fs, live, tmp, marker))
    assert(e.getMessage.contains("LOST"), e.getMessage)
    // the path was restored for serveability and the marker retained
    assert(fs.exists(new Path(live, "old.txt")), "aside must be restored")
    assert(fs.exists(marker), "marker must remain as evidence")
  }

  test("renewAndVerify: heartbeat on own lease, loud abort on takeover") {
    val root = java.nio.file.Files.createTempDirectory("graft_lease_rv_").toString
    val fs = fsFor(root)
    val a = new WriterLease(fs, new Path(root), ttlMs = 60000)
    // outside withLease: a programming error, not a lease race
    intercept[IllegalArgumentException](a.renewAndVerify())
    a.withLease {
      val ts0 = a.readLease().get._3
      Thread.sleep(5) // ensure a strictly-later clock reading
      a.renewAndVerify() // own token: heartbeat succeeds
      // the renewal lands in the SIDECAR — the lease file itself is never
      // rewritten mid-hold (an in-place rewrite's truncate window would
      // let a concurrent acquire read an empty lease and break a LIVE
      // writer); the effective timestamp advances, the base one does not
      assert(a.readLease().get._3 == ts0,
        "the lease file must not be rewritten mid-hold")
      val eff1 = a.effectiveLease().get._3
      assert(eff1 > ts0, "renewAndVerify must advance the effective timestamp")
      // simulate a breaker taking over (this writer stalled past TTL):
      // the next commit point must abort, not install a racing rewrite
      fs.delete(a.leasePath, false)
      val o = fs.create(a.leasePath, true)
      o.write(s"usurper@host\nusurper-token\n${System.currentTimeMillis()}\n"
        .getBytes("UTF-8"))
      o.close()
      val e = intercept[WriterLease.ConcurrentWriterException](a.renewAndVerify())
      assert(e.getMessage.contains("taken over"))
    }
    fs.delete(a.leasePath, false)
  }

  test("heartbeat keeps a long mutation's lease alive past its base TTL") {
    val root = java.nio.file.Files.createTempDirectory("graft_lease_hb_").toString
    val fs = fsFor(root)
    // TTL chosen >> any plausible scheduler stall between the renewal and
    // the assertions below — a tight TTL here would make the test itself
    // racy under parallel-suite load
    val a = new WriterLease(fs, new Path(root), ttlMs = 3000)
    val b = new WriterLease(fs, new Path(root), ttlMs = 3000)
    a.withLease {
      Thread.sleep(3200) // base acquire timestamp is now past TTL
      a.renewAndVerify() // ...but the heartbeat restarts the clock
      // a second writer must still see the lease as HELD (effective ts),
      // and must not break it on acquire
      assert(b.heldByOther(), "renewed lease must read as held")
      intercept[WriterLease.ConcurrentWriterException](b.withLease(()))
      // without further renewal the heartbeat itself goes stale and the
      // lease becomes legitimately breakable again
      Thread.sleep(3200)
      assert(!b.heldByOther())
      b.withLease(()) // stale-break succeeds
    }
  }

  test("writer lease: exclusive, reentrant, stale-breakable, token-guarded release") {
    val root = java.nio.file.Files.createTempDirectory("graft_lease_").toString
    val fs = fsFor(root)
    val a = new WriterLease(fs, new Path(root), ttlMs = 60000)
    val b = new WriterLease(fs, new Path(root), ttlMs = 60000)
    // b cannot mutate while a holds the lease — loud, typed failure
    a.withLease {
      assert(b.heldByOther())
      val e = intercept[WriterLease.ConcurrentWriterException](b.withLease(()))
      assert(e.getMessage.contains("locked by writer"))
      // a itself nests freely (compound ops: migrate -> rebalance)
      a.withLease { a.withLease(()) }
    }
    // released: lease file gone, b acquires normally
    assert(!fs.exists(a.leasePath))
    b.withLease { assert(a.heldByOther()) }

    // stale lease (beyond TTL) is broken and taken over
    val out = fs.create(a.leasePath, true)
    out.write(s"deadpid@nowhere\ndead-token\n${System.currentTimeMillis() - 3600000}\n".getBytes("UTF-8"))
    out.close()
    var ran = false
    new WriterLease(fs, new Path(root), ttlMs = 1000).withLease { ran = true }
    assert(ran && !fs.exists(a.leasePath))

    // token-guarded release: a lease taken over mid-run (stalled writer)
    // is NOT deleted by the stale owner's finally
    val slow = new WriterLease(fs, new Path(root), ttlMs = 60000)
    slow.withLease {
      // simulate a breaker replacing the lease while `slow` runs
      fs.delete(slow.leasePath, false)
      val o2 = fs.create(slow.leasePath, true)
      o2.write(s"breaker@host\nbreaker-token\n${System.currentTimeMillis()}\n".getBytes("UTF-8"))
      o2.close()
    }
    assert(fs.exists(slow.leasePath), "stale owner deleted the breaker's lease")
    fs.delete(slow.leasePath, false)
  }
}
