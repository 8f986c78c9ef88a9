package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Grouped streaming distinct-count fold: per-group estimates exact at
  * sparse cardinality and equal to the per-group batch truth, null
  * group/value accounting, the loud maxGroups cap, replay idempotence,
  * and binding guards. */
class StreamingGroupedDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("many-batch grouped fold: per-group exact estimates; nulls counted") {
    val tmp = Files.createTempDirectory("graft_gdis_").toString
    // 6 batches over 3 sources with cross-batch duplication; src2
    // carries null VALUES; every batch carries one null-GROUP row
    (0 until 6).foreach { b =>
      val rows = (0 until 30).map { j =>
        val src = s"src${j % 3}"
        val v: String =
          if (j % 3 == 2 && j % 2 == 0) null
          else s"${j % 3}_item${(b * 11 + j) % 40}"
        (src, v)
      } :+ ((null: String, "orphan"))
      rows.toDF("source", "value").coalesce(1)
        .write.mode("append").parquet(s"$tmp/src")
    }
    val q = StreamingGroupedDistinct.ingest(spark, s"$tmp/src",
      s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingGroupedDistinct.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 5L)
    assert(st.groups.keySet == Set("src0", "src1", "src2"))
    assert(st.excludedNullRows == 6L, "one null-group row per batch")
    assert(st.groups("src2").nNull == 30L && st.groups("src2").nRows == 60L)
    assert(st.groups("src0").nNull == 0L)
    // every group's estimate equals ITS exact distinct count (sparse)
    val truth = spark.read.parquet(s"$tmp/src")
      .filter(col("source").isNotNull)
      .groupBy("source").agg(countDistinct(col("value")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (g, exact) =>
      assert(st.groups(g).estimate.map(math.round).contains(exact),
        s"group $g: ${st.groups(g).estimate} != $exact")
    }
  }

  test("replay idempotence, bindings, and the loud maxGroups cap") {
    val tmp = Files.createTempDirectory("graft_gdis_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq(("a", "x"), ("b", "y"), ("a", "x")).toDF("source", "value")
    val st1 = StreamingGroupedDistinct.applyBatch(spark, tmp, 12,
      maxGroups = 10, ck, b0, "source", "value", 0L)
    assert(st1.groups("a").estimate.map(math.round).contains(1L))
    assert(st1.groups("a").nRows == 2L)
    // replayed batch id: skipped
    val st1b = StreamingGroupedDistinct.applyBatch(spark, tmp, 12, 10, ck,
      Seq(("z", "q")).toDF("source", "value"), "source", "value", 0L)
    assert(st1b == st1)
    // bindings refuse loudly
    intercept[IllegalStateException](StreamingGroupedDistinct.applyBatch(
      spark, tmp, 12, 10, "file:ckpt-B", b0, "source", "value", 1L))
    intercept[IllegalStateException](StreamingGroupedDistinct.applyBatch(
      spark, tmp, 13, 10, ck, b0, "source", "value", 1L))
    // the cap refuses loudly, does NOT apply, lower-bound phrasing
    val wide = (0 until 40).map(i => (s"g$i", s"v$i"))
      .toDF("source", "value")
    val e = intercept[IllegalStateException](
      StreamingGroupedDistinct.applyBatch(spark, tmp, 12, maxGroups = 10,
        ck, wide, "source", "value", 1L))
    assert(e.getMessage.contains("at least") &&
      e.getMessage.contains("maxGroups=10"))
    assert(StreamingGroupedDistinct.readState(spark, tmp) == st1,
      "refused batch must not mutate the state")
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_gdis_f_").toString
    intercept[IllegalStateException](StreamingGroupedDistinct.applyBatch(
      spark, fresh, 12, 10, ck, b0, "source", "value", 5L))
  }
}
