package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Sliding-window heavy hitters (the ring design's fourth
  * instantiation): the composed MG bound over exactly the window —
  * every true window heavy hitter survives the ring merge (coverage),
  * the recount over the window's rows equals the batch exact() over
  * those rows, eviction really FORGETS a token that dominated only
  * evicted batches, replay idempotence, and binding guards
  * (checkpoint, k, window). */
class StreamingWindowedHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def stageOrdered(src: String,
      batches: Seq[Seq[(Long, String)]],
      base: Long = 1600000000000L): Unit =
    graft.queries.QueryShapes.stageOrderedBatches(
      batches.map(_.toDF("doc_id", "text")), src, base)

  test("window candidates cover the window's true heavy hitters; " +
      "recount equals batch exact over the window; eviction forgets") {
    val tmp = Files.createTempDirectory("graft_swhh_").toString
    // batch 0 and 1 are DOMINATED by "olddominant" (never seen again);
    // batches 2..5 are dominated by "hot" plus per-batch tails. At
    // window=3 over 6 batches the old dominant must vanish from the
    // windowed candidates' recount (it has ZERO window occurrences),
    // while "hot" must be covered — the exact trap for an all-time
    // summary serving as a trending list.
    val batches: Seq[Seq[(Long, String)]] =
      (0 until 2).map(b => (0 until 40).map(i =>
        ((b * 100 + i).toLong, "olddominant olddominant filler")): Seq[(Long, String)]) ++
      (2 until 6).map(b => (0 until 30).map(i =>
        ((b * 100 + i).toLong,
          if (i % 2 == 0) "hot hot common" else s"tail${b}_$i rare")): Seq[(Long, String)])
    stageOrdered(s"$tmp/src", batches)
    val q = StreamingWindowedHeavyHitters.ingest(spark, s"$tmp/src",
      s"$tmp/state", s"$tmp/chk", denominator = 10L, window = 3,
      sketchK = 64, maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingWindowedHeavyHitters.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 5L && st.window == 3 && st.k == 64)
    assert(st.ring.map(_._1) == Seq(3L, 4L, 5L), "ring holds newest 3")
    // the window's exact mass from the ring — and the recount threshold
    val windowRows = batches.takeRight(3).flatten
    val windowToks = windowRows.toDF("doc_id", "text")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
    assert(st.n == windowToks.count(), "window mass != window token count")
    // recount of the window candidates over the window's rows EQUALS
    // the batch exact() over the same rows (coverage: no true window
    // heavy hitter was evicted from any slot or lost in the ring merge)
    val got = StreamingWindowedHeavyHitters.heavyHittersFromSnapshot(
      st, tmp, windowToks, "token", denominator = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = graft.operators.HeavyHitters.exact(windowToks, "token",
      denominator = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact, s"windowed recount $got != batch exact $exact")
    assert(exact.exists(_._1 == "hot"), "the planted trend must be a HH")
    // eviction forgets: the old dominant has no window occurrences, so
    // it cannot appear in the recount even if a stale candidate slipped
    assert(!got.exists(_._1 == "olddominant"),
      "a token dominating only EVICTED batches survived the window")
    // MG lower-bound property with the composed bound over the window
    val trueCounts = windowToks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val agg = st.aggregateCounts
    assert(agg.nonEmpty && agg.size <= st.k)
    agg.foreach { case (tok, c) =>
      val t = trueCounts.getOrElse(tok, 0L)
      assert(c <= t, s"MG count for $tok overshoots: $c > $t")
      assert(t - c <= st.n / (st.k + 1) + 1,
        s"composed bound violated for $tok: true $t folded $c")
    }
  }

  test("replay idempotence, binding guards, state roundtrip, merge refusal") {
    val tmp = Files.createTempDirectory("graft_swhh_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val st1 = StreamingWindowedHeavyHitters.applyBatch(spark, tmp, 8, 3,
      ck, b0, 0L)
    assert(st1.ring.size == 1 && st1.n == 5L)
    assert(st1.aggregateCounts("a") == 3L)
    // replayed batch id: skipped, state unchanged
    val st1b = StreamingWindowedHeavyHitters.applyBatch(spark, tmp, 8, 3,
      ck, Seq((9L, "zz")).toDF("doc_id", "text"), 0L)
    assert(st1b == st1)
    // state roundtrip through the promoted scaffold
    assert(StreamingWindowedHeavyHitters.readState(spark, tmp) == st1)
    // wrong checkpoint / k / WINDOW: loud refusals
    intercept[IllegalStateException](StreamingWindowedHeavyHitters
      .applyBatch(spark, tmp, 8, 3, "file:ckpt-B", b0, 1L))
    val eK = intercept[IllegalStateException](StreamingWindowedHeavyHitters
      .applyBatch(spark, tmp, 16, 3, ck, b0, 1L))
    assert(eK.getMessage.contains("k=8") && eK.getMessage.contains("k=16"))
    val eW = intercept[IllegalStateException](StreamingWindowedHeavyHitters
      .applyBatch(spark, tmp, 8, 5, ck, b0, 1L))
    assert(eW.getMessage.contains("window=3") &&
      eW.getMessage.contains("window=5"))
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_swhh_f_").toString
    intercept[IllegalStateException](StreamingWindowedHeavyHitters
      .applyBatch(spark, fresh, 8, 3, ck, b0, 5L))
    // the denominator coverage guard on the recount
    val eD = intercept[IllegalArgumentException](
      StreamingWindowedHeavyHitters.heavyHittersFromSnapshot(st1, tmp,
        b0.select(lit("a").as("token")), "token", denominator = 99L))
    assert(eD.getMessage.contains("k=8"))
    // ring merge refusal (flat-into-ring direction)
    intercept[UnsupportedOperationException](
      StreamingWindowedHeavyHitters.mergeStates(spark,
        Seq(s"$tmp/x", s"$tmp/y"), s"$tmp/m"))
    // and ring-into-flat through the all-time face's guard: the windowed
    // state file is named in the refusal
    val e2 = intercept[IllegalStateException](StreamingHeavyHitters
      .mergeStates(spark, Seq(tmp, s"$tmp/other"), s"$tmp/m2"))
    assert(e2.getMessage.contains("WINDOWED ring state"))
  }
}
