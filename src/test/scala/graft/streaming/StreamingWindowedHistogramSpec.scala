package graft.streaming

import graft.SparkSpec
import graft.operators.HistogramSketch
import graft.operators.HistogramSketch.HistogramSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Sliding-window exact histogram: the window aggregate (bins, n,
  * under/overflow, interpolated quantiles) EQUALS the one-shot batch
  * histogram over exactly the newest `window` batches' rows; ring
  * eviction; replay idempotence; binding guards (checkpoint, binning,
  * AND window width). The ring-order mechanics shared with the moments
  * face are pinned in [[StreamingWindowedMomentsSpec]]. */
class StreamingWindowedHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val spec = HistogramSpec(0.0, 100.0, 20)

  test("window aggregate and quantiles EQUAL the newest-N one-shot") {
    val tmp = Files.createTempDirectory("graft_swhist_").toString
    val ck = "file:swhist-ckpt"
    // 7 batches whose value ranges shift upward; batch 0 also plants
    // out-of-range mass that must be EVICTED from the window
    val batches: Seq[Seq[Double]] =
      Seq(Seq(-5.0, 250.0, 1.0)) ++
        (1 until 7).map(b => (0 until 30).map(j => (b * 10 + j % 25).toDouble): Seq[Double])
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingWindowedHistogram.applyBatch(spark, tmp, spec, 3, ck,
        b.toDF("value"), "value", i.toLong)
    }
    val st = StreamingWindowedHistogram.readState(spark, tmp)
    assert(st.ring.map(_._1) == Seq(4L, 5L, 6L))
    val agg = st.aggregate
    // the evicted batch-0 out-of-range mass is gone from the window
    assert(agg.underflow == 0L && agg.n == 90L)
    // bin-for-bin against the one-shot count over the newest 3 batches
    val want = batches.takeRight(3).flatten.toDF("value")
    val twinBins = HistogramSketch.counts(want, "value", spec)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(agg.bins == twinBins, "window bins diverged from the one-shot")
    // quantiles ride the same aggregate: compare against the flat
    // face's interpolation over the twin bins
    val twinQ = HistogramSketch.quantiles(spec, twinBins, Seq(0.5, 0.9))
    assert(StreamingWindowedHistogram.quantilesFromSnapshot(
      st, Seq(0.5, 0.9)) == twinQ)
    // replay idempotence
    val stR = StreamingWindowedHistogram.applyBatch(spark, tmp, spec, 3,
      ck, Seq(1.0).toDF("value"), "value", 6L)
    assert(stR == st)
    // bindings: wrong binning / wrong window / wrong checkpoint refuse
    intercept[IllegalStateException](StreamingWindowedHistogram.applyBatch(
      spark, tmp, HistogramSpec(0.0, 100.0, 10), 3, ck,
      Seq(1.0).toDF("value"), "value", 7L))
    val eW = intercept[IllegalStateException](StreamingWindowedHistogram
      .applyBatch(spark, tmp, spec, 4, ck, Seq(1.0).toDF("value"),
        "value", 7L))
    assert(eW.getMessage.contains("window=3") &&
      eW.getMessage.contains("window=4"))
    intercept[IllegalStateException](StreamingWindowedHistogram.applyBatch(
      spark, tmp, spec, 3, "file:other", Seq(1.0).toDF("value"),
      "value", 7L))
    // state round-trips through the swap file (ring order + exact cells)
    val rt = StreamingWindowedHistogram.readState(spark, tmp)
    assert(rt == st)
  }
}
