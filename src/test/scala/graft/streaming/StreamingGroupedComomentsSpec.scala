package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Grouped streaming exact co-moments fold: per-group fold ≡ the
  * one-shot batch comomentsPerGroup, null group/value accounting (per
  * axis), the loud maxGroups cap (with lower-bound phrasing off the
  * truncating probe), replay idempotence, and binding guards including
  * the ordered-pair identity. */
class StreamingGroupedComomentsSpec extends SparkSpec {
  import spark.implicits._

  test("many-batch grouped fold EQUALS comomentsPerGroup; nulls counted") {
    val tmp = Files.createTempDirectory("graft_gcomom_").toString
    // 6 batches over 3 sources; src2 carries null X values (the y side
    // stays present — per-axis accounting), and every batch carries one
    // null-GROUP row (excluded from the fold, counted)
    (0 until 6).foreach { b =>
      val rows = (0 until 30).map { j =>
        val src = s"src${j % 3}"
        val x: java.lang.Long =
          if (j % 3 == 2 && j % 2 == 0) null else Long.box(b * 100L + j)
        val y: java.lang.Long = Long.box(2L * j + b)
        (src, x, y)
      } :+ ((null: String, Long.box(777L), Long.box(777L)))
      rows.toDF("source", "x", "y").coalesce(1)
        .write.mode("append").parquet(s"$tmp/src")
    }
    val q = StreamingGroupedComoments.ingest(spark, s"$tmp/src",
      s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingGroupedComoments.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 5L)
    assert(st.groups.keySet == Set("src0", "src1", "src2"))
    assert(st.excludedNullRows == 6L, "one null-group row per batch")
    // null X values ride the owning group's exact per-axis n_null_x;
    // the pair sample shrinks with them (pairwise-complete)
    assert(st.groups("src2").nNullX == 30L &&
      st.groups("src2").nNullY == 0L &&
      st.groups("src2").nRows == 60L && st.groups("src2").n == 30L)
    assert(st.groups("src0").nNullX == 0L && st.groups("src0").n == 60L)
    // the headline equality: every group's fold ≡ the batch face's row
    val corpus = spark.read.parquet(s"$tmp/src")
    val foldDf = StreamingGroupedComoments.toDF(spark, st)
    val batchDf = Profile.comomentsPerGroup(corpus, "source", "x", "y")
    assert(foldDf.collect().toSeq == batchDf.collect().toSeq,
      "grouped fold diverged from comomentsPerGroup")
  }

  test("replay idempotence, bindings, and the loud maxGroups cap") {
    val tmp = Files.createTempDirectory("graft_gcomom_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq(("a", 1L, 10L), ("b", 2L, 20L), ("a", 3L, 30L))
      .toDF("source", "x", "y")
    val st1 = StreamingGroupedComoments.applyBatch(spark, tmp,
      maxGroups = 10, ck, b0, "source", "x", "y", 0L)
    assert(st1.groups("a").xSum == BigInt(4) &&
      st1.groups("a").xySum == BigInt(100) && st1.groups("b").n == 1L)
    // replayed batch id: skipped
    val st1b = StreamingGroupedComoments.applyBatch(spark, tmp,
      maxGroups = 10, ck, Seq(("z", 9L, 9L)).toDF("source", "x", "y"),
      "source", "x", "y", 0L)
    assert(st1b == st1)
    // bindings: wrong checkpoint / pair / swapped pair refuse loudly
    intercept[IllegalStateException](StreamingGroupedComoments.applyBatch(
      spark, tmp, 10, "file:ckpt-B", b0, "source", "x", "y", 1L))
    intercept[IllegalStateException](StreamingGroupedComoments.applyBatch(
      spark, tmp, 10, ck, Seq(("a", 1L, 2L)).toDF("source", "a", "y"),
      "source", "a", "y", 1L))
    intercept[IllegalStateException](StreamingGroupedComoments.applyBatch(
      spark, tmp, 10, ck, b0.select(col("source"), col("y"), col("x")),
      "source", "y", "x", 1L))
    // the cap: a batch pushing the merged group count past maxGroups
    // refuses loudly, does NOT apply, and phrases a truncated probe as a
    // lower bound
    val wide = (0 until 40).map(i => (s"g$i", i.toLong, 2L * i))
      .toDF("source", "x", "y")
    val e = intercept[IllegalStateException](
      StreamingGroupedComoments.applyBatch(spark, tmp, maxGroups = 10, ck,
        wide, "source", "x", "y", 1L))
    assert(e.getMessage.contains("at least") &&
      e.getMessage.contains("maxGroups=10"))
    assert(StreamingGroupedComoments.readState(spark, tmp) == st1,
      "refused batch must not mutate the state")
    // a fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_gcomom_f_").toString
    intercept[IllegalStateException](StreamingGroupedComoments.applyBatch(
      spark, fresh, 10, ck, b0, "source", "x", "y", 5L))
  }
}
