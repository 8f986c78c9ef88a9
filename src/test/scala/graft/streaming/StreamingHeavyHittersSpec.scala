package graft.streaming

import graft.SparkSpec
import graft.operators.HeavyHitters
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming Misra–Gries fold: bounded state over many micro-batches,
  * exactly-once batch application, the driver-side merge's bound, and the
  * headline equivalence — the stream's folded state recounts to the SAME
  * answer as the batch HeavyHitters.exact on the same corpus. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic skewed batch: every doc carries the global heavy
    * tokens plus per-(batch, doc) noise nothing else shares. */
  private def batchDf(batchId: Int, docs: Int = 4) = {
    val rows = (0 until docs).map { d =>
      val noise = (1 to 12).map(j => s"n${batchId}_${d}_$j").mkString(" ")
      (batchId * 100L + d, s"alpha beta alpha $noise")
    }
    rows.toDF("doc_id", "text")
  }

  test("many-batch stream: state stays <= k; recount equals batch exact()") {
    val src = Files.createTempDirectory("graft_shh_src_").toString
    val ckpt = Files.createTempDirectory("graft_shh_ckpt_").toString
    val stateDir = Files.createTempDirectory("graft_shh_state_").toString
    val denom = 20L
    val k = 64
    (0 until 30).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q = StreamingHeavyHitters.ingest(spark, src, stateDir, ckpt,
      denominator = denom, sketchK = k, maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingHeavyHitters.readState(spark, stateDir)
    assert(st.counts.size <= k, s"state grew past k: ${st.counts.size}")
    assert(st.lastBatchId == 29L, s"expected 30 micro-batches, got ${st.lastBatchId + 1}")
    val corpus = spark.read.parquet(src)
    val toks = corpus.select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    assert(st.n == toks.count(), "state mass tracking drifted from the corpus")
    val fromStream = StreamingHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks, "token", denom)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fromBatch = HeavyHitters.exact(toks, "token", denom, sketchK = k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fromStream == fromBatch && fromStream.nonEmpty,
      s"stream=$fromStream batch=$fromBatch")

    // restart with NEW arrivals: the same checkpoint resumes, the state
    // keeps folding, and the equivalence holds over the grown corpus
    (30 until 40).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q2 = StreamingHeavyHitters.ingest(spark, src, stateDir, ckpt,
      denominator = denom, sketchK = k, maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingHeavyHitters.readState(spark, stateDir)
    assert(st2.counts.size <= k && st2.lastBatchId == 39L)
    val toks2 = spark.read.parquet(src).select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val fromStream2 = StreamingHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks2, "token", denom)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fromBatch2 = HeavyHitters.exact(toks2, "token", denom, sketchK = k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fromStream2 == fromBatch2 && fromStream2.nonEmpty)
  }

  test("a replayed micro-batch is skipped, not double-counted") {
    val stateDir = Files.createTempDirectory("graft_shh_replay_").toString
    val b = batchDf(0)
    val s1 = StreamingHeavyHitters.applyBatch(spark, stateDir, 64, "ck", b, 0L)
    // crash window: state installed but checkpoint not committed — the
    // stream replays batch 0 against the already-updated state
    val s2 = StreamingHeavyHitters.applyBatch(spark, stateDir, 64, "ck", b, 0L)
    assert(s2 == s1, "replay mutated the state")
    assert(StreamingHeavyHitters.readState(spark, stateDir).n == s1.n)
    // the NEXT batch applies normally
    val s3 = StreamingHeavyHitters.applyBatch(spark, stateDir, 64, "ck",
      batchDf(1), 1L)
    assert(s3.n == 2 * s1.n && s3.lastBatchId == 1L)
  }

  test("state binds to its checkpoint and its k; recount validates k") {
    val stateDir = Files.createTempDirectory("graft_shh_bind_").toString
    StreamingHeavyHitters.applyBatch(spark, stateDir, 64, "ck1", batchDf(0), 0L)
    // a state dir outliving its checkpoint: batch ids restart at 0 under
    // a fresh checkpoint, so continuing would skip NEW data as replays —
    // the fold must refuse loudly instead
    val eCk = intercept[IllegalStateException] {
      StreamingHeavyHitters.applyBatch(spark, stateDir, 64, "ck2", batchDf(1), 0L)
    }
    assert(eCk.getMessage.contains("different checkpoint")
      || eCk.getMessage.contains("folded under checkpoint"))
    // changing k mid-state would weaken the composed bound — refuse
    val eK = intercept[IllegalStateException] {
      StreamingHeavyHitters.applyBatch(spark, stateDir, 32, "ck1", batchDf(1), 1L)
    }
    assert(eK.getMessage.contains("k="))
    // the recount's exactness is relative to the folded k: a finer
    // threshold than the state covers must fail loudly, not return a
    // silently incomplete "exact" answer
    val toks = batchDf(0).select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val eDen = intercept[IllegalArgumentException] {
      StreamingHeavyHitters.heavyHittersFromState(
        spark, stateDir, toks, "token", denominator = 500L).collect()
    }
    assert(eDen.getMessage.contains("does not cover"))
    // a non-positive denominator inverts the threshold arithmetic
    // (negative: minCount < 0 returns every candidate; zero: Infinity
    // would sail past the k-coverage check) — refuse before either
    val eZero = intercept[IllegalArgumentException] {
      StreamingHeavyHitters.heavyHittersFromState(
        spark, stateDir, toks, "token", denominator = 0L)
    }
    assert(eZero.getMessage.contains("positive"))
    // the mirror guard: a FRESH state under an already-advanced
    // checkpoint means committed batches will never be re-delivered —
    // folding from a non-zero first batch must refuse loudly
    val fresh = Files.createTempDirectory("graft_shh_fresh_").toString
    val eFresh = intercept[IllegalStateException] {
      StreamingHeavyHitters.applyBatch(spark, fresh, 64, "ck1", batchDf(1), 7L)
    }
    assert(eFresh.getMessage.contains("will not be re-delivered"))
    // a pre-binding-format state file is a loud format error, not an NPE
    // or a silent empty read
    val old = Files.createTempDirectory("graft_shh_oldfmt_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(old, "mg_state.json"),
      """{"batch_id": 3, "n": 100, "counts": {"a": 5}}""")
    val eFmt = intercept[IllegalStateException] {
      StreamingHeavyHitters.readState(spark, old)
    }
    assert(eFmt.getMessage.contains("pre-binding format"))
    // ingest() applies the binding guards SYNCHRONOUSLY at entry — a
    // mismatched stream must refuse before .start(), not die async in
    // the first micro-batch after laying down checkpoint WAL state
    val src = Files.createTempDirectory("graft_shh_bsrc_").toString + "/files"
    batchDf(0).coalesce(1).write.parquet(src)
    val eEntry = intercept[IllegalStateException] {
      StreamingHeavyHitters.ingest(spark, src, stateDir,
        Files.createTempDirectory("graft_shh_bck_").toString,
        denominator = 20L, sketchK = 64)
    }
    assert(eEntry.getMessage.contains("folded under checkpoint"))
    // a stale pre-commit tmp with NO marker and NO state file is a
    // provably-uncommitted writeState crash remnant: reads must treat it
    // as the empty stream, not a wedged swap (the availability trap)
    val lone = Files.createTempDirectory("graft_shh_lonetmp_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(lone, "mg_state.json_tmp"), """{"half": true""")
    val st0 = StreamingHeavyHitters.readState(spark, lone)
    assert(st0.lastBatchId == -1L && st0.n == 0L)
    // the opposite trap: a swap marker that survives recovery (a commit
    // crashed with its tmp lost — finishSwap can clear nothing) must be
    // a LOUD wedged-swap error, never the empty snapshot a restarted
    // ingest would clobber the evidence over
    val wedged = Files.createTempDirectory("graft_shh_wedged_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wedged, "mg_state.swap.inprogress"), "{}")
    val eWedge = intercept[IllegalStateException] {
      StreamingHeavyHitters.readState(spark, wedged)
    }
    assert(eWedge.getMessage.contains("persists after recovery")
      && eWedge.getMessage.contains("do NOT fold"))
  }

  test("readStateLocked: linearizable under a continuously-committing writer") {
    val stateDir = Files.createTempDirectory("graft_shh_locked_").toString
    val nBatches = 25
    val b = batchDf(0).collect() // materialize once; re-wrap per batch
    val schema = batchDf(0).schema
    val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try {
        var i = 0
        while (i < nBatches) {
          val df = spark.createDataFrame(
            java.util.Arrays.asList(b: _*), schema)
          StreamingHeavyHitters.applyBatch(
            spark, stateDir, 64, "ck", df, i.toLong)
          i += 1
        }
      } catch { case t: Throwable => writerErr.set(t) }
    })
    writer.start()
    // poll with the LOCKED read the whole time the writer commits: every
    // read must SUCCEED (the lock-free read is loud-by-design under this
    // contention — that error is exactly what this variant removes) and
    // the sequence of snapshots must be consistent: n and lastBatchId
    // monotonically non-decreasing, counts <= k, binding fields intact
    var lastN = -1L
    var lastBatch = -2L
    var reads = 0
    while (writer.isAlive) {
      val st = StreamingHeavyHitters.readStateLocked(spark, stateDir)
      if (st.lastBatchId >= 0L) {
        assert(st.k == 64 && st.checkpoint == "ck")
        assert(st.counts.size <= 64)
        assert(st.n >= lastN && st.lastBatchId >= lastBatch,
          s"snapshot went backwards: n $lastN->${st.n} batch $lastBatch->${st.lastBatchId}")
        lastN = st.n; lastBatch = st.lastBatchId
      }
      reads += 1
    }
    writer.join()
    assert(writerErr.get() == null,
      s"writer failed under concurrent locked reads: ${writerErr.get()}")
    assert(reads > 0)
    val fin = StreamingHeavyHitters.readStateLocked(spark, stateDir)
    assert(fin.lastBatchId == nBatches - 1L)
    // the locked read surfaces a genuinely wedged swap (marker with no
    // tmp/live) as the same loud error as the lock-free path, never empty
    val wedged = Files.createTempDirectory("graft_shh_lockwedge_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wedged, "mg_state.swap.inprogress"), "{}")
    val eW = intercept[IllegalStateException] {
      StreamingHeavyHitters.readStateLocked(spark, wedged)
    }
    assert(eW.getMessage.contains("do NOT fold"))
  }

  test("lock-free readState under a continuously-committing writer: consistent or loud, never phantom-empty") {
    // the staged-state specs pin each crash shape; this pins the LIVE
    // protocol end-to-end: while a writer commits continuously, every
    // lock-free read must either return a consistent snapshot (monotone
    // n/batch id, never an empty snapshot once a commit has landed — the
    // phantom-empty class) or throw the curated contention error, never
    // a bare FNF or a silently stale/empty result
    val stateDir = Files.createTempDirectory("graft_shh_lfread_").toString
    val nBatches = 20
    val b = batchDf(0).collect()
    val schema = batchDf(0).schema
    val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try {
        var i = 0
        while (i < nBatches) {
          val df = spark.createDataFrame(
            java.util.Arrays.asList(b: _*), schema)
          StreamingHeavyHitters.applyBatch(
            spark, stateDir, 64, "ck", df, i.toLong)
          i += 1
        }
      } catch { case t: Throwable => writerErr.set(t) }
    })
    writer.start()
    var lastN = -1L
    var sawNonEmpty = false
    var contended = 0
    var reads = 0
    while (writer.isAlive) {
      try {
        val st = StreamingHeavyHitters.readState(spark, stateDir)
        if (st.lastBatchId >= 0L) {
          sawNonEmpty = true
          assert(st.n >= lastN, s"snapshot went backwards: $lastN -> ${st.n}")
          lastN = st.n
        } else assert(!sawNonEmpty,
          "PHANTOM-EMPTY: an empty snapshot after a committed state was read")
      } catch {
        case e: IllegalStateException =>
          assert(e.getMessage.contains("read contention")
            || e.getMessage.contains("persists after recovery"), e.getMessage)
          contended += 1
      }
      reads += 1
    }
    writer.join()
    assert(writerErr.get() == null,
      s"writer failed under concurrent lock-free reads: ${writerErr.get()}")
    assert(reads > 0)
    val fin = StreamingHeavyHitters.readState(spark, stateDir)
    assert(fin.lastBatchId == nBatches - 1L)
    info(s"$reads reads, $contended loud-contention exits")
  }

  test("driver-side mergeMg preserves the composed MG bound") {
    // fold per-chunk aggregate summaries through mergeMg (exactly what the
    // stream does) and check Agarwal et al.'s composed bound against the
    // ground truth — a wrong cut rank or dropped positive breaks this
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val kk = Seq(8, 32, 64)(seed % 3)
      val stream = Seq.fill(3000) {
        val r = math.pow(rnd.nextDouble(), 1.0 + (seed % 3))
        s"w${(r * 300).toInt}"
      }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.size.toLong
      var folded = Map.empty[String, Long]
      stream.grouped(600).foreach { chunk =>
        val summary = spark.createDataset(chunk).toDF("item")
          .agg(HeavyHitters.mgCandidates(kk)(col("item")).as("c"))
          .head().getSeq[org.apache.spark.sql.Row](0)
          .map(r => (r.getString(0), r.getLong(1)))
        folded = StreamingHeavyHitters.mergeMg(kk, folded, summary)
      }
      assert(folded.size <= kk)
      val bound = n.toDouble / (kk + 1)
      folded.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t && est >= t - bound - 1,
          s"seed=$seed item=$item est=$est truth=$t bound=$bound")
      }
      truth.foreach { case (item, t) =>
        if (t > bound) assert(folded.contains(item),
          s"seed=$seed: heavy item $item (count $t > $bound) evicted")
      }
    }
  }
}
