package graft.streaming

import graft.SparkSpec
import graft.operators.HeavyHitters
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Per-group streaming Misra–Gries fold: state bounded by groups × k over
  * many micro-batches, exactly-once batch application, the group-cap
  * refusal, the binding guards shared with the flat fold, and the headline
  * equivalence — the stream's folded state recounts to the SAME answer as
  * the batch HeavyHitters.exactPerGroup on the same corpus. */
class StreamingGroupedHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic skewed batch over three sources: each source carries
    * its own heavy tokens (disjoint across sources, so per-group
    * thresholds genuinely differ) plus per-(batch, doc) noise. Source c
    * has ~3x the mass of source a. */
  private def batchDf(batchId: Int) = {
    val rows = for {
      (src, reps) <- Seq(("a", 1), ("b", 2), ("c", 3))
      d <- 0 until reps
    } yield {
      val noise = (1 to 10).map(j => s"n${src}_${batchId}_${d}_$j").mkString(" ")
      (batchId * 100L + d, src, s"h_$src h_$src common $noise")
    }
    rows.toDF("doc_id", "source", "text")
  }

  test("many-batch stream: state bounded by groups x k; recount equals exactPerGroup") {
    val src = Files.createTempDirectory("graft_gshh_src_").toString
    val ckpt = Files.createTempDirectory("graft_gshh_ckpt_").toString
    val stateDir = Files.createTempDirectory("graft_gshh_state_").toString
    val denom = 20L
    val k = 64
    (0 until 25).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q = StreamingGroupedHeavyHitters.ingest(spark, src, stateDir, ckpt,
      denominator = denom, sketchK = k, maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingGroupedHeavyHitters.readState(spark, stateDir)
    assert(st.groups.keySet == Set("a", "b", "c"))
    st.groups.foreach { case (g, gs) =>
      assert(gs.counts.size <= k, s"group $g grew past k: ${gs.counts.size}")
    }
    assert(st.lastBatchId == 24L)
    val corpus = spark.read.parquet(src)
    val toks = corpus.select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    // per-group mass tracking must match the corpus exactly
    val massByGroup = toks.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    st.groups.foreach { case (g, gs) =>
      assert(gs.n == massByGroup(g), s"group $g mass drifted")
    }
    val fromStream = StreamingGroupedHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks, "source", "token", denom)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val fromBatch = HeavyHitters
      .exactPerGroup(toks, "source", "token", denom, sketchK = k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(fromStream == fromBatch && fromStream.nonEmpty,
      s"stream=$fromStream batch=$fromBatch")
    // per-group thresholds genuinely differ: source c's heavy token must
    // clear a ~3x higher absolute bar than source a's
    assert(fromStream.exists(_._1 == "a") && fromStream.exists(_._1 == "c"))

    // restart with NEW arrivals on the same checkpoint: the state keeps
    // folding and the equivalence holds over the grown corpus
    (25 until 35).foreach(i => batchDf(i).coalesce(1)
      .write.mode("append").parquet(src))
    val q2 = StreamingGroupedHeavyHitters.ingest(spark, src, stateDir, ckpt,
      denominator = denom, sketchK = k, maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingGroupedHeavyHitters.readState(spark, stateDir)
    assert(st2.lastBatchId == 34L)
    val toks2 = spark.read.parquet(src).select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val s2 = StreamingGroupedHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks2, "source", "token", denom)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val b2 = HeavyHitters
      .exactPerGroup(toks2, "source", "token", denom, sketchK = k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(s2 == b2 && s2.nonEmpty)
  }

  test("replayed micro-batch is skipped; bindings and fresh-state guard hold") {
    val stateDir = Files.createTempDirectory("graft_gshh_replay_").toString
    val b = batchDf(0)
    val s1 = StreamingGroupedHeavyHitters
      .applyBatch(spark, stateDir, 64, 100, "ck", b, 0L)
    val s2 = StreamingGroupedHeavyHitters
      .applyBatch(spark, stateDir, 64, 100, "ck", b, 0L)
    assert(s2 == s1, "replay mutated the state")
    val s3 = StreamingGroupedHeavyHitters
      .applyBatch(spark, stateDir, 64, 100, "ck", batchDf(1), 1L)
    assert(s3.lastBatchId == 1L)
    assert(s3.groups("a").n == 2 * s1.groups("a").n)
    // shared binding guards (one implementation with the flat fold)
    val eCk = intercept[IllegalStateException] {
      StreamingGroupedHeavyHitters
        .applyBatch(spark, stateDir, 64, 100, "ck2", batchDf(2), 2L)
    }
    assert(eCk.getMessage.contains("folded under checkpoint"))
    val eK = intercept[IllegalStateException] {
      StreamingGroupedHeavyHitters
        .applyBatch(spark, stateDir, 32, 100, "ck", batchDf(2), 2L)
    }
    assert(eK.getMessage.contains("k="))
    val fresh = Files.createTempDirectory("graft_gshh_fresh_").toString
    val eFresh = intercept[IllegalStateException] {
      StreamingGroupedHeavyHitters
        .applyBatch(spark, fresh, 64, 100, "ck", batchDf(1), 7L)
    }
    assert(eFresh.getMessage.contains("will not be re-delivered"))
    // recount validates the folded k against the asked threshold
    val toks = batchDf(0).select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val eDen = intercept[IllegalArgumentException] {
      StreamingGroupedHeavyHitters.heavyHittersFromState(
        spark, stateDir, toks, "source", "token", denominator = 500L).collect()
    }
    assert(eDen.getMessage.contains("does not cover"))
    // a non-positive denominator inverts the threshold arithmetic
    // (negative: every candidate "qualifies"; zero: Infinity) — loud
    val eZero = intercept[IllegalArgumentException] {
      StreamingGroupedHeavyHitters.heavyHittersFromState(
        spark, stateDir, toks, "source", "token", denominator = 0L)
    }
    assert(eZero.getMessage.contains("positive"))
  }

  test("null source rows are excluded from the fold, matching the batch recount") {
    // a null group key would NPE the state serialization mid-batch and
    // wedge the stream in a replay-crash loop; the batch operator's
    // recount drops null groups anyway (inner join never matches null),
    // so exclusion keeps stream == batch exact
    val stateDir = Files.createTempDirectory("graft_gshh_null_").toString
    val b = Seq(
      (1L, "a", "x x x y"),
      (2L, null.asInstanceOf[String], "x x x z"),
      (3L, "b", "x w")).toDF("doc_id", "source", "text")
    val st = StreamingGroupedHeavyHitters
      .applyBatch(spark, stateDir, 8, 100, "ck", b, 0L)
    assert(st.groups.keySet == Set("a", "b"),
      s"null group leaked into state: ${st.groups.keySet}")
    assert(st.groups("a").n == 4L && st.groups("b").n == 2L)
    // excluded nulls are COUNTED (observability): per ROW, not per token
    assert(st.excludedNullRows == 1L)
    val toks = b.select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val fromStream = StreamingGroupedHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks, "source", "token", 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val fromBatch = HeavyHitters
      .exactPerGroup(toks, "source", "token", 2L, sketchK = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(fromStream == fromBatch && fromStream.nonEmpty)
    // the counter is RUNNING across batches and persisted with the state
    val b2 = Seq(
      (4L, null.asInstanceOf[String], "p q"),
      (5L, null.asInstanceOf[String], "r"),
      (6L, "a", "x")).toDF("doc_id", "source", "text")
    val st2 = StreamingGroupedHeavyHitters
      .applyBatch(spark, stateDir, 8, 100, "ck", b2, 1L)
    assert(st2.excludedNullRows == 3L,
      s"running null-row count drifted: ${st2.excludedNullRows}")
    // a null-free batch leaves it unchanged; it round-trips the state file
    val st3 = StreamingGroupedHeavyHitters.applyBatch(spark, stateDir, 8,
      100, "ck", Seq((7L, "b", "w")).toDF("doc_id", "source", "text"), 2L)
    assert(st3.excludedNullRows == 3L)
    assert(StreamingGroupedHeavyHitters.readState(spark, stateDir)
      .excludedNullRows == 3L)
  }

  test("pre-r14 state file (no excluded_null_rows field) reads as 0, no refusal") {
    // observability field, not a binding one: an old state file simply
    // hasn't counted yet — it must keep folding, never demand migration
    val stateDir = Files.createTempDirectory("graft_gshh_oldfmt_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stateDir, "mg_grouped_state.json"),
      """{"k":8,"checkpoint":"ck","batch_id":0,
        |"groups":{"a":{"n":4,"counts":{"x":3,"y":1}}}}""".stripMargin)
    val st = StreamingGroupedHeavyHitters.readState(spark, stateDir)
    assert(st.excludedNullRows == 0L && st.groups("a").n == 4L)
    // and the next fold starts counting from 0 on top of the old state
    val st2 = StreamingGroupedHeavyHitters.applyBatch(spark, stateDir, 8,
      100, "ck", Seq((9L, null.asInstanceOf[String], "z"), (10L, "a", "x"))
        .toDF("doc_id", "source", "text"), 1L)
    assert(st2.excludedNullRows == 1L && st2.groups("a").n == 5L)
  }

  test("group cap: a fold past maxGroups refuses loudly, batch NOT applied") {
    val stateDir = Files.createTempDirectory("graft_gshh_cap_").toString
    val s1 = StreamingGroupedHeavyHitters
      .applyBatch(spark, stateDir, 64, 2, "ck",
        Seq((1L, "a", "x y"), (2L, "b", "x z")).toDF("doc_id", "source", "text"), 0L)
    assert(s1.groups.size == 2)
    val e = intercept[IllegalStateException] {
      StreamingGroupedHeavyHitters.applyBatch(spark, stateDir, 64, 2, "ck",
        Seq((3L, "c", "x w")).toDF("doc_id", "source", "text"), 1L)
    }
    assert(e.getMessage.contains("maxGroups=2")
      && e.getMessage.contains("Batch NOT applied"))
    // a small overflow is reported EXACTLY (no "at least" hedge) ...
    assert(!e.getMessage.contains("at least"), e.getMessage)
    // the refused batch must not have touched the state
    val st = StreamingGroupedHeavyHitters.readState(spark, stateDir)
    assert(st.lastBatchId == 0L && st.groups.size == 2)
    // ... but when the bounded head probe truncated the batch's group
    // relation, the count is phrased as a LOWER BOUND — a 1M-group batch
    // must not report "~cap+1 groups" and mislead an operator sizing a
    // raised cap
    val wide = Files.createTempDirectory("graft_gshh_wide_").toString
    val eW = intercept[IllegalStateException] {
      StreamingGroupedHeavyHitters.applyBatch(spark, wide, 64, 2, "ck",
        (0 until 9).map(i => (i.toLong, s"g$i", "x"))
          .toDF("doc_id", "source", "text"), 0L)
    }
    assert(eW.getMessage.contains("at least 4 groups"), eW.getMessage)
  }

  test("empty state recounts to an empty frame; locked read sees it") {
    val stateDir = Files.createTempDirectory("graft_gshh_empty_").toString
    val toks = batchDf(0).select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    assert(StreamingGroupedHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks, "source", "token", 20L)
      .count() == 0L)
    val st = StreamingGroupedHeavyHitters.readStateLocked(spark, stateDir)
    assert(st.lastBatchId == -1L && st.groups.isEmpty)
  }
}
