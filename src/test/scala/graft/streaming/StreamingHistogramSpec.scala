package graft.streaming

import graft.SparkSpec
import graft.operators.HistogramSketch
import graft.operators.HistogramSketch.HistogramSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming exact-histogram fold: the state after any number of
  * micro-batches EQUALS the batch histogram of the whole corpus (exact
  * counts, not an estimate), exactly-once batch application, binding
  * guards, and the interpolation arithmetic hand-checked. */
class StreamingHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val hs = HistogramSpec(0.0, 1000.0, 100)

  /** Deterministic value batch: a hash-spread over [-50, 1050) so every
    * batch carries in-range, underflow, AND overflow mass. */
  private def batchVals(batchId: Int, rows: Int = 400): Seq[Double] =
    (0 until rows).map { j =>
      val h = (batchId * rows + j) * 2654435761L % 10007L
      math.abs(h).toDouble / 10007.0 * 1100.0 - 50.0
    }

  private def batchDf(batchId: Int, rows: Int = 400) =
    batchVals(batchId, rows).toDF("value")

  private def batchCounts(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
    HistogramSketch.counts(df, "value", hs).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("many-batch stream: folded state EQUALS the batch histogram; n exact") {
    val src = Files.createTempDirectory("graft_hist_src_").toString
    val ckpt = Files.createTempDirectory("graft_hist_ckpt_").toString
    val stateDir = Files.createTempDirectory("graft_hist_state_").toString
    (0 until 30).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q = StreamingHistogram.ingest(spark, src, stateDir, ckpt, hs,
      maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingHistogram.readState(spark, stateDir)
    assert(st.lastBatchId == 29L,
      s"expected 30 micro-batches, got ${st.lastBatchId + 1}")
    val corpus = spark.read.parquet(src)
    assert(st.n == corpus.count(),
      s"state count ${st.n} != corpus — a batch was dropped or doubled")
    // the headline: the folded state IS the batch histogram, exactly
    assert(st.bins == batchCounts(corpus),
      "folded bins diverged from the one-shot batch histogram")
    assert(st.underflow > 0L && st.overflow > 0L,
      "fixture must exercise both out-of-range sides")
    // quantiles from the state = quantiles from the batch counts (same
    // counts, same arithmetic — trivially, but pins the plumbing)
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    assert(StreamingHistogram.quantilesFromState(spark, stateDir, probs)
      == HistogramSketch.quantiles(hs, batchCounts(corpus), probs))
    // estimates are rank-exact within one bin width for in-range probs;
    // a prob whose target rank falls in the overflow mass (~top 4.5% of
    // this fixture) clamps to hi — the honest out-of-range answer
    val sorted = (0 until 30).flatMap(batchVals(_)).sorted.toArray
    StreamingHistogram.quantilesFromState(spark, stateDir,
      Seq(0.1, 0.5, 0.9)).foreach { case (p, est) =>
        val t = 1.0 + (sorted.length - 1) * p
        val trueV = sorted(math.ceil(t).toInt - 1)
        assert(math.abs(est - trueV) <= hs.width + 1e-9,
          s"p=$p est=$est true=$trueV off by more than one bin width")
      }
    val clamped = StreamingHistogram
      .quantilesFromState(spark, stateDir, Seq(0.999)).head._2
    assert(clamped == hs.hi, s"overflow-mass quantile must clamp to hi")

    // restart with NEW arrivals: same checkpoint resumes, equality holds
    (30 until 40).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q2 = StreamingHistogram.ingest(spark, src, stateDir, ckpt, hs,
      maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingHistogram.readState(spark, stateDir)
    val corpus2 = spark.read.parquet(src)
    assert(st2.lastBatchId == 39L && st2.n == corpus2.count())
    assert(st2.bins == batchCounts(corpus2))
  }

  test("quantile interpolation arithmetic, hand-checked") {
    val s = HistogramSpec(0.0, 10.0, 10)
    // 4 values in bin 2, 6 in bin 7 -> n=10
    val bins = Map(2 -> 4L, 7 -> 6L)
    // p=0: t=1, bin 2, frac=1/4 -> 2 + 1*0.25 = 2.25
    // p=1: t=10, bin 7, frac=(10-4)/6=1 -> 7+1 = 8.0
    // p=0.5: t=5.5, bin 7 (cum 4 < 5.5 <= 10), frac=1.5/6 -> 7.25
    val got = HistogramSketch.quantiles(s, bins, Seq(0.0, 0.5, 1.0)).toMap
    assert(math.abs(got(0.0) - 2.25) < 1e-12)
    assert(math.abs(got(0.5) - 7.25) < 1e-12)
    assert(math.abs(got(1.0) - 8.0) < 1e-12)
    // t inside underflow mass clamps to lo; inside overflow mass to hi
    val oob = HistogramSketch.quantiles(s,
      Map(-1 -> 5L, 4 -> 2L, 10 -> 5L), Seq(0.1, 0.5, 0.95)).toMap
    assert(oob(0.1) == 0.0, "underflow-mass quantile must clamp to lo")
    assert(oob(0.95) == 10.0, "overflow-mass quantile must clamp to hi")
    // t=6.5 -> bin 4, frac=1.5/2 -> 4.75
    assert(math.abs(oob(0.5) - 4.75) < 1e-12)
    // empty + validation
    assert(HistogramSketch.quantiles(s, Map.empty, Seq(0.5)).isEmpty)
    intercept[IllegalArgumentException] {
      HistogramSketch.quantiles(s, bins, Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      HistogramSketch.quantiles(s, Map(11 -> 1L), Seq(0.5))
    }
    intercept[IllegalArgumentException] { HistogramSpec(0.0, 0.0, 10) }
    intercept[IllegalArgumentException] { HistogramSpec(0.0, 1.0, 0) }
  }

  test("fromSample derives bounds covering >= coverage of a planted distribution") {
    // planted: bulk uniform over [100, 200) plus far outliers both sides
    val bulk = (0 until 2000).map { i =>
      100.0 + (i * 2654435761L % 9973L).toDouble / 9973.0 * 100.0
    }
    val planted = (bulk ++ Seq(-1e6, -5e4, 1e5, 9e7)).toDF("value")
    val spec = HistogramSketch.fromSample(planted, "value", nBins = 20,
      coverage = 0.99, sampleSize = 5000)
    // the derived range must cover >= 99% of the distribution (here the
    // whole bulk: outliers are < 0.2% of mass and sit in the tails)
    val c = HistogramSketch.counts(planted, "value", spec).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = c.valuesIterator.sum
    val oor = c.getOrElse(-1, 0L) + c.getOrElse(spec.nBins, 0L)
    assert(n == 2004L)
    assert((n - oor).toDouble / n >= 0.99,
      s"in-range ${(n - oor)} of $n under [${spec.lo}, ${spec.hi})")
    // ...and must NOT be stretched by the outliers: a naive min/max
    // binning would spread [−1e6, 9e7] over 20 bins and park the whole
    // bulk in one — the derived width must resolve the bulk
    assert(spec.lo >= 50.0 && spec.hi <= 300.0,
      s"bounds [${spec.lo}, ${spec.hi}) stretched by tail outliers")
    // NaN AND ±Infinity excluded from the sample, not a crash (an Inf at
    // a quantile index would fail the spec's finiteness contract); at
    // fold time they land in the explicit out-of-range bins instead
    val withNan = (Seq(Double.NaN, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity) ++ bulk).toDF("value")
    val s2 = HistogramSketch.fromSample(withNan, "value", nBins = 10,
      coverage = 1.0)
    assert(java.lang.Double.isFinite(s2.lo) && java.lang.Double.isFinite(s2.hi))
    val c2 = HistogramSketch.counts(withNan, "value", s2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(c2.getOrElse(10, 0L) == 3L, s"NaN + +Inf must overflow: $c2")
    assert(c2.getOrElse(-1, 0L) == 1L, s"-Inf must underflow: $c2")
    val flat = Seq(7.0, 7.0, 7.0).toDF("value")
    val s3 = HistogramSketch.fromSample(flat, "value", nBins = 4)
    assert(s3.lo == 7.0 && s3.hi == 8.0)
    // binExpr over the derived spec puts all mass in range
    val c3 = HistogramSketch.counts(flat, "value", s3).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(c3 == Map(0 -> 3L))
    // loud contract errors
    intercept[IllegalArgumentException](
      HistogramSketch.fromSample(flat, "value", 4, coverage = 0.0))
    intercept[IllegalArgumentException](
      HistogramSketch.fromSample(
        Seq.empty[Double].toDF("value"), "value", 4))
  }

  test("countsPerGroup matches per-group flat counts; null groups excluded") {
    val df = Seq(("a", 5.0), ("a", 15.0), ("a", 205.0), ("b", 5.0),
      ("b", -3.0), (null.asInstanceOf[String], 7.0)).toDF("g", "value")
    val s = HistogramSpec(0.0, 100.0, 10)
    val got = HistogramSketch.countsPerGroup(df, "g", "value", s).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", 0) -> 1L, ("a", 1) -> 1L, ("a", 10) -> 1L,
      ("b", 0) -> 1L, ("b", -1) -> 1L))
    // parity with the flat counts restricted to one group
    val flatA = HistogramSketch.counts(
      df.filter(col("g") === "a"), "value", s).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(flatA == got.collect { case (("a", b), c) => b -> c })
  }

  test("bin assignment: boundaries, out-of-range, NULL, driver/plan parity") {
    val s = HistogramSpec(0.0, 100.0, 10)
    assert(s.binOf(0.0) == 0 && s.binOf(9.999) == 0 && s.binOf(10.0) == 1)
    assert(s.binOf(99.999) == 9)
    assert(s.binOf(100.0) == 10 && s.binOf(250.0) == 10) // overflow
    assert(s.binOf(-0.001) == -1) // underflow
    val df = Seq[Option[Double]](Some(0.0), Some(10.0), Some(99.9),
      Some(100.0), Some(-5.0), None).toDF("value")
    val got = HistogramSketch.counts(df, "value", s).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 1L, 1 -> 1L, 9 -> 1L, 10 -> 1L, -1 -> 1L),
      s"got $got") // NULL skipped
    // a non-numeric string column fails LOUDLY (ANSI cast), never a
    // silent garbage bin; numeric strings cast and bin, nulls skip. The
    // cast-then-filter order also guards non-ANSI sessions, where the
    // malformed cast yields NULL instead — a NULL slipping into binExpr
    // would pass both range branches and then least()'s null-skipping
    // into the top in-range bin
    val eStr = intercept[Throwable] {
      HistogramSketch.counts(Seq("12.5", "n/a").toDF("value"),
        "value", s).collect()
    }
    assert(eStr.toString.contains("CAST_INVALID_INPUT"), eStr.toString)
    val gotStr = HistogramSketch.counts(
      Seq("12.5", null.asInstanceOf[String]).toDF("value"),
      "value", s).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotStr == Map(1 -> 1L), s"got $gotStr")
    // NaN routes to the OVERFLOW bin in every face: Spark's nan-safe
    // compare and DuckDB's total order both put NaN above hi, and binOf
    // matches them explicitly (Java primitive compares would otherwise
    // floor NaN into bin 0)
    assert(s.binOf(Double.NaN) == 10)
    val nanBin = Seq(Double.NaN).toDF("value")
      .select(s.binExpr(col("value")).as("b")).head().getInt(0)
    assert(nanBin == 10, s"plan-side NaN bin $nanBin")
    // plan-side assignment equals the driver-side kernel on a spread
    val vals = batchVals(0, 200) :+ Double.NaN
    val planBins = vals.toDF("value")
      .select(s.binExpr(col("value")).as("b")).collect().map(_.getInt(0))
    assert(planBins.toSeq == vals.map(s.binOf),
      "binExpr diverged from binOf")
  }

  test("a replayed micro-batch is skipped, not double-counted") {
    val stateDir = Files.createTempDirectory("graft_hist_replay_").toString
    val b = batchDf(0)
    val s1 = StreamingHistogram.applyBatch(spark, stateDir, hs, "ck",
      b, "value", 0L)
    val s2 = StreamingHistogram.applyBatch(spark, stateDir, hs, "ck",
      b, "value", 0L)
    assert(s2.bins == s1.bins && s2.n == s1.n, "replay mutated the state")
    assert(StreamingHistogram.readState(spark, stateDir).n == s1.n)
    val s3 = StreamingHistogram.applyBatch(spark, stateDir, hs, "ck",
      batchDf(1), "value", 1L)
    assert(s3.n == 2 * s1.n && s3.lastBatchId == 1L)
  }

  test("state binds to its checkpoint and its binning; guards fire at entry") {
    val stateDir = Files.createTempDirectory("graft_hist_bind_").toString
    StreamingHistogram.applyBatch(spark, stateDir, hs, "ck1",
      batchDf(0), "value", 0L)
    val eCk = intercept[IllegalStateException] {
      StreamingHistogram.applyBatch(spark, stateDir, hs, "ck2",
        batchDf(1), "value", 0L)
    }
    assert(eCk.getMessage.contains("folded under checkpoint"))
    val eBin = intercept[IllegalStateException] {
      StreamingHistogram.applyBatch(spark, stateDir,
        HistogramSpec(0.0, 1000.0, 200), "ck1", batchDf(1), "value", 1L)
    }
    assert(eBin.getMessage.contains("binning"))
    val fresh = Files.createTempDirectory("graft_hist_fresh_").toString
    val eFresh = intercept[IllegalStateException] {
      StreamingHistogram.applyBatch(spark, fresh, hs, "ck1",
        batchDf(1), "value", 7L)
    }
    assert(eFresh.getMessage.contains("will not be re-delivered"))
    val old = Files.createTempDirectory("graft_hist_oldfmt_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(old, "hist_state.json"),
      """{"batch_id": 3, "n": 100, "bins": {"0": 100}}""")
    val eFmt = intercept[IllegalStateException] {
      StreamingHistogram.readState(spark, old)
    }
    assert(eFmt.getMessage.contains("binding fields"))
    val src = Files.createTempDirectory("graft_hist_bsrc_").toString + "/files"
    batchDf(0).coalesce(1).write.parquet(src)
    val eEntry = intercept[IllegalStateException] {
      StreamingHistogram.ingest(spark, src, stateDir,
        Files.createTempDirectory("graft_hist_bck_").toString, hs)
    }
    assert(eEntry.getMessage.contains("folded under checkpoint"))
    // stale pre-commit tmp with no marker and no state = empty stream
    val lone = Files.createTempDirectory("graft_hist_lonetmp_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(lone, "hist_state.json_tmp"), """{"half":""")
    val st0 = StreamingHistogram.readState(spark, lone)
    assert(st0.lastBatchId == -1L && st0.n == 0L)
    assert(StreamingHistogram.quantilesFromState(spark, lone, Seq(0.5)).isEmpty)
    // a marker surviving recovery is a LOUD wedged-swap error
    val wedged = Files.createTempDirectory("graft_hist_wedged_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wedged, "hist_state.swap.inprogress"), "{}")
    val eWedge = intercept[IllegalStateException] {
      StreamingHistogram.readState(spark, wedged)
    }
    assert(eWedge.getMessage.contains("persists after recovery"))
  }

  test("ingestAutoBinned: bins derive from the standing sample; " +
      "binding guard still refuses drift") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_hist_ab_").toString
    // 1. a standing sample fold over the corpus's value column
    (0L until 200L).map(i => (i, 10.0 + i)).toDF("doc_id", "value")
      .coalesce(1).write.parquet(s"$tmp/src")
    val sq = StreamingSample.ingest(spark, s"$tmp/src", s"$tmp/sample",
      s"$tmp/sck", k = 64, valueCol = Some("value"))
    sq.processAllAvailable(); sq.stop()
    // 2. one call: derive bins from the sample, start the fold
    val (q, spec) = StreamingHistogram.ingestAutoBinned(spark,
      s"$tmp/src", s"$tmp/hist", s"$tmp/hck", s"$tmp/sample",
      nBins = 8, coverage = 1.0)
    q.processAllAvailable(); q.stop()
    // 3. the spec in the STATE equals an offline fromSample over the
    // same standing sample (the one-arithmetic rule)
    val sample = StreamingSample.readState(spark, s"$tmp/sample")
    val offline = graft.operators.HistogramSketch.fromSample(
      StreamingSample.toDF(spark, sample), "value", 8, coverage = 1.0)
    val hst = StreamingHistogram.readState(spark, s"$tmp/hist")
    assert(hst.spec == offline, s"state ${hst.spec} vs offline $offline")
    assert(hst.spec == spec)
    assert(hst.n == 200L)
    // coverage 1.0 over a uniform sample: the folded mass lands in range
    // except values outside the SAMPLE's min/max span
    val oor = hst.bins.getOrElse(-1, 0L) + hst.bins.getOrElse(8, 0L)
    assert(oor.toDouble / hst.n < 0.2, s"out-of-range $oor of ${hst.n}")
    // 4. the binding guard: re-deriving against the same state dir with
    // a DIFFERENT coverage (different bounds) refuses loudly
    val e = intercept[IllegalStateException] {
      StreamingHistogram.ingestAutoBinned(spark, s"$tmp/src",
        s"$tmp/hist", s"$tmp/hck", s"$tmp/sample",
        nBins = 8, coverage = 0.5)
    }
    assert(e.getMessage.contains("binning"), e.getMessage)
    // 5. loud refusals: no sample state / no carried values
    val eNone = intercept[IllegalStateException] {
      StreamingHistogram.ingestAutoBinned(spark, s"$tmp/src",
        s"$tmp/h2", s"$tmp/hck3",
        Files.createTempDirectory("graft_hist_ab_none_").toString, 8)
    }
    assert(eNone.getMessage.contains("no folded sample state"))
    val nv = Files.createTempDirectory("graft_hist_ab_nv_").toString
    (0L until 20L).toDF("doc_id").coalesce(1).write.parquet(s"$nv/src")
    val sq2 = StreamingSample.ingest(spark, s"$nv/src", s"$nv/sample",
      s"$nv/sck", k = 8)
    sq2.processAllAvailable(); sq2.stop()
    val eNoVal = intercept[IllegalStateException] {
      StreamingHistogram.ingestAutoBinned(spark, s"$tmp/src",
        s"$tmp/h3", s"$tmp/hck4", s"$nv/sample", 8)
    }
    assert(eNoVal.getMessage.contains("no finite values"), eNoVal.getMessage)
  }
}
