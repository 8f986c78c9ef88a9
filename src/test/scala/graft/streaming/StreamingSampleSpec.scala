package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming bottom-k sample fold: after any number of micro-batches the
  * state EQUALS the one-shot batch bottom-k over the whole corpus (a
  * semilattice merge has no error term to compose), replay idempotence,
  * duplicate-id dedup, binding guards, and the fromSample feed. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  private def stage(src: String, batches: Seq[Seq[(Long, Double)]]): Unit =
    batches.foreach(b => b.toDF("doc_id", "value").coalesce(1)
      .write.mode("append").parquet(src))

  test("many-batch fold EQUALS the batch bottom-k; values carried; resume works") {
    val tmp = Files.createTempDirectory("graft_ssample_").toString
    // 10 batches x 40 ids, disjoint id ranges, value = f(id)
    val batches = (0 until 10).map(b =>
      (0 until 40).map(j => (b * 40L + j, (b * 40 + j) * 1.5)))
    stage(s"$tmp/src", batches)
    val q = StreamingSample.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", k = 32, valueCol = Some("value"), maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingSample.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 9L && st.nSeen == 400L)
    assert(st.entries.size == 32)
    // the headline equality: folded ≡ one-shot batch bottom-k, entry for
    // entry (keys, ids, AND carried values)
    val corpus = spark.read.parquet(s"$tmp/src")
    val expect = StreamingSample.batchBottomK(corpus, k = 32,
      valueCol = Some("value"))
    assert(st.entries == expect, "folded sample diverged from batch bottom-k")
    // values rode along: value = id * 1.5 for every sampled id
    st.entries.foreach(e => assert(e.value.contains(e.id * 1.5)))
    // entries are sorted by (key, id) and keys are the salted hash
    assert(st.entries == st.entries.sortBy(e => (e.key, e.id)))

    // resume under the same checkpoint with new arrivals
    stage(s"$tmp/src", Seq((400 until 440).map(j => (j.toLong, j * 1.5))))
    val q2 = StreamingSample.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", k = 32, valueCol = Some("value"), maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingSample.readState(spark, s"$tmp/state")
    assert(st2.nSeen == 440L)
    val expect2 = StreamingSample.batchBottomK(
      spark.read.parquet(s"$tmp/src"), k = 32, valueCol = Some("value"))
    assert(st2.entries == expect2, "post-resume fold diverged")

    // the fromSample feed: toDF round-trips (id, value) locally
    val df = StreamingSample.toDF(spark, st2)
    assert(df.count() == 32)
    val spec = graft.operators.HistogramSketch.fromSample(df, "value",
      nBins = 8, coverage = 1.0)
    assert(spec.lo <= st2.entries.flatMap(_.value).min &&
      spec.hi > st2.entries.flatMap(_.value).max)
  }

  test("replay idempotence, duplicate ids, and binding guards") {
    val tmp = Files.createTempDirectory("graft_ssample_g_").toString
    val ck = "file:ckpt-a"
    // duplicate ids WITHIN a batch and ACROSS batches must not double-
    // occupy slots or change the sample
    val b0 = Seq((1L, 1.0), (1L, 1.0), (2L, 2.0), (3L, 3.0))
    val st1 = StreamingSample.applyBatch(spark, tmp, k = 2, salt = "sample",
      checkpoint = ck, batch = b0.toDF("doc_id", "value"),
      idCol = "doc_id", valueCol = Some("value"), batchId = 0L)
    assert(st1.entries.size == 2 && st1.nSeen == 4L)
    // replayed batch id: skipped, state unchanged
    val st1b = StreamingSample.applyBatch(spark, tmp, k = 2, salt = "sample",
      checkpoint = ck, batch = Seq((9L, 9.0)).toDF("doc_id", "value"),
      idCol = "doc_id", valueCol = Some("value"), batchId = 0L)
    assert(st1b == st1)
    // a re-ingested id in a later batch dedups against the state
    val st2 = StreamingSample.applyBatch(spark, tmp, k = 2, salt = "sample",
      checkpoint = ck, batch = Seq((1L, 1.0), (4L, 4.0)).toDF("doc_id", "value"),
      idCol = "doc_id", valueCol = Some("value"), batchId = 1L)
    assert(st2.entries.map(_.id).distinct.size == st2.entries.size)
    assert(st2.entries == StreamingSample.batchBottomK(
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("doc_id", "value"),
      k = 2, valueCol = Some("value")))
    // bindings: wrong checkpoint / k / salt all refuse loudly
    intercept[IllegalStateException](StreamingSample.applyBatch(spark, tmp,
      k = 2, salt = "sample", checkpoint = "file:ckpt-B",
      batch = b0.toDF("doc_id", "value"), idCol = "doc_id",
      valueCol = Some("value"), batchId = 2L))
    intercept[IllegalStateException](StreamingSample.applyBatch(spark, tmp,
      k = 3, salt = "sample", checkpoint = ck,
      batch = b0.toDF("doc_id", "value"), idCol = "doc_id",
      valueCol = Some("value"), batchId = 2L))
    intercept[IllegalStateException](StreamingSample.applyBatch(spark, tmp,
      k = 2, salt = "other", checkpoint = ck,
      batch = b0.toDF("doc_id", "value"), idCol = "doc_id",
      valueCol = Some("value"), batchId = 2L))
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_ssample_f_").toString
    intercept[IllegalStateException](StreamingSample.applyBatch(spark,
      fresh, k = 2, salt = "sample", checkpoint = ck,
      batch = b0.toDF("doc_id", "value"), idCol = "doc_id",
      valueCol = Some("value"), batchId = 5L))
    // merge is a pure semilattice: associativity + idempotence on raw seqs
    import StreamingSample.{mergeBottomK, SampleEntry}
    val a = Seq(SampleEntry(5L, 50L, None), SampleEntry(9L, 90L, None))
    val b = Seq(SampleEntry(3L, 30L, None), SampleEntry(7L, 70L, None))
    val c = Seq(SampleEntry(1L, 10L, None))
    assert(mergeBottomK(3, mergeBottomK(3, a, b), c) ==
      mergeBottomK(3, a, mergeBottomK(3, b, c)))
    assert(mergeBottomK(3, a, a) == mergeBottomK(3, a, Seq.empty))
  }

  test("null ids are excluded by both the fold and the batch twin") {
    // a null id has no identity to sample; without exclusion its NULL
    // priority would sort FIRST and permanently occupy a bottom slot
    // (and the state write would crash on the missing long)
    val tmp = Files.createTempDirectory("graft_ssample_ni_").toString
    val ck = "file:ckpt-ni"
    val df = Seq[(Option[Long], Double)](
      (Some(1L), 1.0), (None, 9.0), (Some(2L), 2.0), (None, 8.0))
      .map { case (id, v) => (id.map(Long.box).orNull, v) }
      .toDF("doc_id", "value")
    val st = StreamingSample.applyBatch(spark, tmp, k = 3, salt = "sample",
      checkpoint = ck, batch = df, idCol = "doc_id",
      valueCol = Some("value"), batchId = 0L)
    assert(st.entries.map(_.id).sorted == Seq(1L, 2L))
    assert(st.nSeen == 4L, "null-id rows still count toward nSeen")
    assert(st.entries == StreamingSample.batchBottomK(df, k = 3,
      valueCol = Some("value")))
  }

  test("sample without a value column carries None") {
    val tmp = Files.createTempDirectory("graft_ssample_nv_").toString
    (0L until 50L).toDF("doc_id").coalesce(1).write.parquet(s"$tmp/src")
    val q = StreamingSample.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", k = 8)
    q.processAllAvailable(); q.stop()
    val st = StreamingSample.readState(spark, s"$tmp/state")
    assert(st.entries.size == 8 && st.entries.forall(_.value.isEmpty))
    assert(st.entries == StreamingSample.batchBottomK(
      spark.read.parquet(s"$tmp/src"), k = 8))
  }
}
