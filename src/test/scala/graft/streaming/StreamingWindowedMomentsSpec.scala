package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Sliding-window exact moments: the window aggregate EQUALS the
  * one-shot batch moments over exactly the newest `window` batches'
  * rows (eviction correct even when the evicted batch held the
  * extremum — the non-invertibility trap a running-total design falls
  * into), ring eviction, replay idempotence, and binding guards
  * (checkpoint, value column, AND the window width). */
class StreamingWindowedMomentsSpec extends SparkSpec {
  import spark.implicits._

  /** The ONE ordered-staging definition ([[graft.queries.QueryShapes
    * .stageOrderedBatches]]) — the window's semantics depend on batch
    * ORDER, unlike every other fold in the family. */
  private def stageOrdered(src: String, batches: Seq[Seq[Long]],
      base: Long = 1600000000000L): Unit =
    graft.queries.QueryShapes.stageOrderedBatches(
      batches.map(_.toDF("value")), src, base)

  test("window aggregate EQUALS the batch moments of the newest N batches") {
    val tmp = Files.createTempDirectory("graft_swmom_").toString
    // batch 0 holds the GLOBAL max (9999) and batch 1 the global min
    // (-50): with window=3 over 8 batches both must be evicted — the
    // exact trap for a running-total-minus-evicted design
    val batches: Seq[Seq[Long]] =
      Seq(Seq(1L, 9999L), Seq(-50L, 2L)) ++
        (2 until 8).map(b => (0 until 20).map(j => b * 100L + j): Seq[Long])
    stageOrdered(s"$tmp/src", batches)
    val q = StreamingWindowedMoments.ingest(spark, s"$tmp/src",
      s"$tmp/state", s"$tmp/chk", window = 3, maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingWindowedMoments.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 7L && st.window == 3)
    assert(st.ring.map(_._1) == Seq(5L, 6L, 7L), "ring holds newest 3")
    val want = batches.takeRight(3).flatten
    val twin = StreamingMoments.batchMoments(want.toDF("value"), "value")
    assert(st.aggregate == twin,
      "window aggregate diverged from the batch moments of the last 3 batches")
    // the evicted global extrema must NOT survive in the window
    assert(st.aggregate.min == 500L && st.aggregate.max == 719L)
    // toDF serves the aggregate through the shared moments schema
    val r = StreamingWindowedMoments.toDF(spark, st).head()
    assert(r.getLong(0) == 60L && r.getLong(3) == 500L)

    // resume under the same checkpoint: new arrivals slide the window
    // (a LATER base, so the new stamps exceed every first-leg one)
    val more = Seq(Seq(7L, 8L, 9L))
    stageOrdered(s"$tmp/src", more, base = 1600000100000L)
    val q2 = StreamingWindowedMoments.ingest(spark, s"$tmp/src",
      s"$tmp/state", s"$tmp/chk", window = 3, maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingWindowedMoments.readState(spark, s"$tmp/state")
    assert(st2.ring.map(_._1) == Seq(6L, 7L, 8L))
    val want2 = (batches ++ more).takeRight(3).flatten
    assert(st2.aggregate ==
      StreamingMoments.batchMoments(want2.toDF("value"), "value"),
      "post-resume window diverged")
  }

  test("replay idempotence and binding guards (checkpoint, column, window)") {
    val tmp = Files.createTempDirectory("graft_swmom_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq(1L, 2L, 3L).toDF("value")
    val st1 = StreamingWindowedMoments.applyBatch(spark, tmp, 3, ck, b0,
      "value", 0L)
    assert(st1.ring.size == 1 && st1.aggregate.sum == BigInt(6))
    // replayed batch id: skipped, state unchanged
    val st1b = StreamingWindowedMoments.applyBatch(spark, tmp, 3, ck,
      Seq(99L).toDF("value"), "value", 0L)
    assert(st1b == st1)
    // wrong checkpoint / value column / WINDOW: loud refusals
    intercept[IllegalStateException](StreamingWindowedMoments.applyBatch(
      spark, tmp, 3, "file:ckpt-B", b0, "value", 1L))
    intercept[IllegalStateException](StreamingWindowedMoments.applyBatch(
      spark, tmp, 3, ck, Seq(1L).toDF("other"), "other", 1L))
    val eW = intercept[IllegalStateException](StreamingWindowedMoments
      .applyBatch(spark, tmp, 5, ck, b0, "value", 1L))
    assert(eW.getMessage.contains("window=3") &&
      eW.getMessage.contains("window=5"))
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_swmom_f_").toString
    intercept[IllegalStateException](StreamingWindowedMoments.applyBatch(
      spark, fresh, 3, ck, b0, "value", 5L))
    // an EMPTY batch occupies a window slot (the window counts ingest
    // time, not rows — a quiet interval shrinking n IS the signal)
    val st2 = StreamingWindowedMoments.applyBatch(spark, tmp, 3, ck,
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        new org.apache.spark.sql.types.StructType()
          .add("value", org.apache.spark.sql.types.LongType)),
      "value", 1L)
    assert(st2.ring.size == 2 && st2.ring.last._2.nRows == 0L)
    assert(st2.aggregate == st1.aggregate,
      "an empty slot must not change the aggregate")
  }
}
