package graft.streaming

import graft.SparkSpec
import graft.operators.HistogramSketch
import graft.operators.HistogramSketch.HistogramSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Per-group streaming exact-histogram fold: each group's state EQUALS
  * that group's batch histogram, null group keys are excluded-but-counted,
  * the group cap refuses loudly, and quantiles stay per-group. */
class StreamingGroupedHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val hs = HistogramSpec(0.0, 100.0, 20)

  /** Deterministic batch: 5 groups x 60 hash-spread values over [-5, 105)
    * (every group carries in-range + out-of-range mass, each group a
    * different offset so their histograms differ), plus 2 null-group rows
    * and 1 null-value row per batch. */
  private def batchDf(batchId: Int) = {
    val rows = for {
      g <- 0 until 5
      j <- 0 until 60
    } yield {
      val h = ((batchId * 5 + g) * 60 + j) * 2654435761L % 9973L
      (s"g$g", Some(math.abs(h).toDouble / 9973.0 * 110.0 - 5.0 + g))
    }
    (rows ++ Seq((null.asInstanceOf[String], Some(1.0)),
      (null.asInstanceOf[String], None), ("g0", None)))
      .toDF("event_type", "value")
  }

  private def groupCounts(df: org.apache.spark.sql.DataFrame): Map[String, Map[Int, Long]] =
    df.filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), hs.binExpr(col("value")).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        g -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
      }

  test("many-batch stream: per-group state EQUALS the batch histograms; nulls counted") {
    val src = Files.createTempDirectory("graft_ghist_src_").toString
    val ckpt = Files.createTempDirectory("graft_ghist_ckpt_").toString
    val stateDir = Files.createTempDirectory("graft_ghist_state_").toString
    (0 until 12).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q = StreamingGroupedHistogram.ingest(spark, src, stateDir, ckpt,
      hs, maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingGroupedHistogram.readState(spark, stateDir)
    assert(st.lastBatchId == 11L,
      s"expected 12 micro-batches, got ${st.lastBatchId + 1}")
    val corpus = spark.read.parquet(src)
    // the headline: every group's folded bins ARE that group's batch
    // histogram, exactly — and no phantom groups
    val truth = groupCounts(corpus)
    assert(st.groups.keySet == truth.keySet)
    truth.foreach { case (g, bins) =>
      assert(st.groups(g).bins == bins, s"group $g bins diverged")
      assert(st.groups(g).n == bins.valuesIterator.sum)
    }
    // the operator behind the REST verify face reproduces the same cells:
    // folded ≡ HistogramSketch.countsPerGroup over the staged corpus
    val recount = HistogramSketch
      .countsPerGroup(corpus, "event_type", "value", hs).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        g -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }
    assert(recount == st.groups.view.mapValues(_.bins).toMap,
      "countsPerGroup must equal the folded state cell-for-cell")
    // 2 null-group rows per batch (null value on one of them still
    // counts: the GROUP rotted, that is the observability signal)
    assert(st.excludedNullRows == 24L,
      s"excluded ${st.excludedNullRows}, expected 2 x 12")
    // per-group quantiles: group-pointwise equal to the flat arithmetic
    // over that group's counts, ordered (group asc, prob asc)
    val qs = StreamingGroupedHistogram.quantilesFromSnapshot(st,
      Seq(0.5, 0.9))
    assert(qs.map(_._1) == qs.map(_._1).sorted)
    qs.foreach { case (g, p, est) =>
      val expect = HistogramSketch.quantiles(hs, st.groups(g).bins,
        Seq(p)).head._2
      assert(est == expect, s"group $g p=$p")
    }
    // groups genuinely differ and never mix (the offset fixture): all
    // five medians are pairwise distinct
    val p50 = qs.filter(_._2 == 0.5).map(_._3)
    assert(p50.distinct.size == 5, s"per-group medians should differ: $p50")

    // resume with new arrivals under the same checkpoint
    (12 until 16).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q2 = StreamingGroupedHistogram.ingest(spark, src, stateDir, ckpt,
      hs, maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingGroupedHistogram.readState(spark, stateDir)
    val truth2 = groupCounts(spark.read.parquet(src))
    assert(st2.lastBatchId == 15L && st2.excludedNullRows == 32L)
    truth2.foreach { case (g, bins) =>
      assert(st2.groups(g).bins == bins, s"group $g bins diverged after resume")
    }
  }

  test("a replayed micro-batch is skipped, not double-counted") {
    val stateDir = Files.createTempDirectory("graft_ghist_replay_").toString
    val b = batchDf(0)
    val s1 = StreamingGroupedHistogram.applyBatch(spark, stateDir, hs,
      100, "ck", b, "event_type", "value", 0L)
    val s2 = StreamingGroupedHistogram.applyBatch(spark, stateDir, hs,
      100, "ck", b, "event_type", "value", 0L)
    assert(s2.groups == s1.groups
      && s2.excludedNullRows == s1.excludedNullRows,
      "replay mutated the state")
    val s3 = StreamingGroupedHistogram.applyBatch(spark, stateDir, hs,
      100, "ck", batchDf(1), "event_type", "value", 1L)
    // every batch gives each group exactly 60 non-null values
    assert(s1.groups("g0").n == 60L && s3.groups("g0").n == 120L)
    assert(s3.lastBatchId == 1L)
    assert(s3.excludedNullRows == 2 * s1.excludedNullRows)
  }

  test("bindings, the group cap, and wedged-state loudness") {
    val stateDir = Files.createTempDirectory("graft_ghist_bind_").toString
    StreamingGroupedHistogram.applyBatch(spark, stateDir, hs, 100, "ck1",
      batchDf(0), "event_type", "value", 0L)
    val eCk = intercept[IllegalStateException] {
      StreamingGroupedHistogram.applyBatch(spark, stateDir, hs, 100,
        "ck2", batchDf(1), "event_type", "value", 0L)
    }
    assert(eCk.getMessage.contains("folded under checkpoint"))
    val eBin = intercept[IllegalStateException] {
      StreamingGroupedHistogram.applyBatch(spark, stateDir,
        HistogramSpec(0.0, 100.0, 40), 100, "ck1", batchDf(1),
        "event_type", "value", 1L)
    }
    assert(eBin.getMessage.contains("binning"))
    // the group cap: a 5-group batch into maxGroups=3 refuses loudly and
    // does NOT apply; the wide-batch probe reports a lower bound
    val capped = Files.createTempDirectory("graft_ghist_cap_").toString
    val eCap = intercept[IllegalStateException] {
      StreamingGroupedHistogram.applyBatch(spark, capped, hs, 3, "ck",
        batchDf(0), "event_type", "value", 0L)
    }
    assert(eCap.getMessage.contains("past maxGroups=3")
      && eCap.getMessage.contains("at least"), eCap.getMessage)
    assert(StreamingGroupedHistogram.readState(spark, capped)
      .lastBatchId == -1L, "refused batch must not be applied")
    // a cap that fits exactly is fine
    StreamingGroupedHistogram.applyBatch(spark, capped, hs, 5, "ck",
      batchDf(0), "event_type", "value", 0L)
    assert(StreamingGroupedHistogram.readState(spark, capped)
      .groups.size == 5)
    // ingest refuses a mismatched stream synchronously at entry
    val src = Files.createTempDirectory("graft_ghist_bsrc_").toString + "/f"
    batchDf(0).coalesce(1).write.parquet(src)
    val eEntry = intercept[IllegalStateException] {
      StreamingGroupedHistogram.ingest(spark, src, stateDir,
        Files.createTempDirectory("graft_ghist_bck_").toString, hs)
    }
    assert(eEntry.getMessage.contains("folded under checkpoint"))
    // binding-less file is a loud format error; wedged marker is loud
    val old = Files.createTempDirectory("graft_ghist_oldfmt_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(old, "hist_grouped_state.json"),
      """{"batch_id": 3, "groups": {}}""")
    val eFmt = intercept[IllegalStateException] {
      StreamingGroupedHistogram.readState(spark, old)
    }
    assert(eFmt.getMessage.contains("binding fields"))
    val wedged = Files.createTempDirectory("graft_ghist_wedged_").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wedged,
      "hist_grouped_state.swap.inprogress"), "{}")
    val eWedge = intercept[IllegalStateException] {
      StreamingGroupedHistogram.readState(spark, wedged)
    }
    assert(eWedge.getMessage.contains("persists after recovery"))
  }
}
