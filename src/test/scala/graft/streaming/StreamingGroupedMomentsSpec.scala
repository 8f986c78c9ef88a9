package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Grouped streaming exact-moments fold: per-group fold ≡ the one-shot
  * batch momentsPerGroup, null group/value accounting, the loud maxGroups
  * cap (with lower-bound phrasing off the truncating probe), replay
  * idempotence, and binding guards. */
class StreamingGroupedMomentsSpec extends SparkSpec {
  import spark.implicits._

  test("many-batch grouped fold EQUALS momentsPerGroup; nulls counted") {
    val tmp = Files.createTempDirectory("graft_gmom_").toString
    // 6 batches over 3 sources; src2 carries null VALUES, and every batch
    // carries one null-GROUP row (excluded from the fold, counted)
    (0 until 6).foreach { b =>
      val rows = (0 until 30).map { j =>
        val src = s"src${j % 3}"
        val v: java.lang.Long =
          if (j % 3 == 2 && j % 2 == 0) null else Long.box(b * 100L + j)
        (src, v)
      } :+ ((null: String, Long.box(777L)))
      rows.toDF("source", "value").coalesce(1)
        .write.mode("append").parquet(s"$tmp/src")
    }
    val q = StreamingGroupedMoments.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingGroupedMoments.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 5L)
    assert(st.groups.keySet == Set("src0", "src1", "src2"))
    assert(st.excludedNullRows == 6L, "one null-group row per batch")
    // null VALUES ride the owning group's exact n_null
    assert(st.groups("src2").nNull == 30L && st.groups("src2").nRows == 60L)
    assert(st.groups("src0").nNull == 0L)
    // the headline equality: every group's fold ≡ the batch face's row
    val corpus = spark.read.parquet(s"$tmp/src")
    val foldDf = StreamingGroupedMoments.toDF(spark, st)
    val batchDf = Profile.momentsPerGroup(corpus, "source", "value")
    assert(foldDf.collect().toSeq == batchDf.collect().toSeq,
      "grouped fold diverged from momentsPerGroup")
  }

  test("replay idempotence, bindings, and the loud maxGroups cap") {
    val tmp = Files.createTempDirectory("graft_gmom_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("source", "value")
    val st1 = StreamingGroupedMoments.applyBatch(spark, tmp,
      maxGroups = 10, ck, b0, "source", "value", 0L)
    assert(st1.groups("a").sum == BigInt(4) && st1.groups("b").n == 1L)
    // replayed batch id: skipped
    val st1b = StreamingGroupedMoments.applyBatch(spark, tmp,
      maxGroups = 10, ck, Seq(("z", 9L)).toDF("source", "value"),
      "source", "value", 0L)
    assert(st1b == st1)
    // bindings: wrong checkpoint / value column refuse loudly
    intercept[IllegalStateException](StreamingGroupedMoments.applyBatch(
      spark, tmp, 10, "file:ckpt-B", b0, "source", "value", 1L))
    intercept[IllegalStateException](StreamingGroupedMoments.applyBatch(
      spark, tmp, 10, ck, Seq(("a", 1L)).toDF("source", "other"),
      "source", "other", 1L))
    // the cap: a batch pushing the merged group count past maxGroups
    // refuses loudly, does NOT apply, and phrases a truncated probe as a
    // lower bound
    val wide = (0 until 40).map(i => (s"g$i", i.toLong))
      .toDF("source", "value")
    val e = intercept[IllegalStateException](
      StreamingGroupedMoments.applyBatch(spark, tmp, maxGroups = 10, ck,
        wide, "source", "value", 1L))
    assert(e.getMessage.contains("at least") &&
      e.getMessage.contains("maxGroups=10"))
    assert(StreamingGroupedMoments.readState(spark, tmp) == st1,
      "refused batch must not mutate the state")
    // a fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_gmom_f_").toString
    intercept[IllegalStateException](StreamingGroupedMoments.applyBatch(
      spark, fresh, 10, ck, b0, "source", "value", 5L))
  }
}
