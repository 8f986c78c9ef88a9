package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Grouped streaming bottom-k sample: after any number of micro-batches
  * every group's folded state EQUALS the one-shot per-group batch bottom-k
  * (window-rank twin — an independent formulation), duplicate dedup inside
  * the imperative aggregate, null-group exclusion counting, the loud
  * maxGroups cap with lower-bound phrasing, replay idempotence, and the
  * binding guards. */
class StreamingGroupedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def stage(src: String,
      batches: Seq[Seq[(String, Long, Double)]]): Unit =
    batches.foreach(b => b.toDF("source", "doc_id", "value").coalesce(1)
      .write.mode("append").parquet(src))

  test("many-batch grouped fold EQUALS the per-group batch bottom-k") {
    val tmp = Files.createTempDirectory("graft_gsample_").toString
    // 6 batches x 60 ids spread over 5 sources; value = f(id)
    val batches = (0 until 6).map(b =>
      (0 until 60).map { j =>
        val id = b * 60L + j
        (s"src${id % 5}", id, id * 0.5)
      })
    stage(s"$tmp/src", batches)
    val q = StreamingGroupedSample.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", k = 8, valueCol = Some("value"), maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingGroupedSample.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 5L && st.groups.size == 5)
    assert(st.groups.valuesIterator.map(_.nSeen).sum == 360L)
    st.groups.values.foreach(g => assert(g.entries.size == 8))
    // the headline equality, group-pointwise: folded ≡ window-rank twin
    val corpus = spark.read.parquet(s"$tmp/src")
    val expect = StreamingGroupedSample.batchBottomKPerGroup(corpus, k = 8,
        valueCol = Some("value"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        g -> rs.map(r => StreamingSample.SampleEntry(r.getLong(1),
            r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
          .sortBy(e => (e.key, e.id)).toSeq
      }
    assert(st.groups.keySet == expect.keySet)
    st.groups.foreach { case (g, gs) =>
      assert(gs.entries == expect(g), s"group $g diverged from batch twin")
      // values rode along and entries are sorted by (key, id)
      gs.entries.foreach(e => assert(e.value.contains(e.id * 0.5)))
      assert(gs.entries == gs.entries.sortBy(e => (e.key, e.id)))
    }

    // resume under the same checkpoint with new arrivals
    stage(s"$tmp/src", Seq((360 until 420).map { j =>
      (s"src${j % 5}", j.toLong, j * 0.5) }))
    val q2 = StreamingGroupedSample.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", k = 8, valueCol = Some("value"), maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingGroupedSample.readState(spark, s"$tmp/state")
    assert(st2.groups.valuesIterator.map(_.nSeen).sum == 420L)
    val expect2 = StreamingGroupedSample.batchBottomKPerGroup(
        spark.read.parquet(s"$tmp/src"), k = 8, valueCol = Some("value"))
      .collect().groupBy(_.getString(0))
    st2.groups.foreach { case (g, gs) =>
      assert(gs.entries.map(_.id).toSet ==
        expect2(g).map(_.getLong(2)).toSet, s"post-resume $g diverged")
    }

    // the stratified fromSample feed: toDF slices per group
    val df = StreamingGroupedSample.toDF(spark, st2)
    assert(df.count() == 40) // 5 groups x 8
    val spec = graft.operators.HistogramSketch.fromSample(
      df.filter(col("group") === "src0"), "value", nBins = 4, coverage = 1.0)
    val src0Vals = st2.groups("src0").entries.flatMap(_.value)
    assert(spec.lo <= src0Vals.min && spec.hi > src0Vals.max)
  }

  test("duplicates, null groups, replay, bindings, and the group cap") {
    val tmp = Files.createTempDirectory("graft_gsample_b_").toString
    val ck = "file:ckpt-a"
    def df(rows: Seq[(Option[String], Long, Double)]) =
      rows.map { case (g, i, v) => (g.orNull, i, v) }
        .toDF("source", "doc_id", "value")
    // null ids excluded by fold AND twin (the aggregate skips them; the
    // window twin filters them — a null priority would rank first)
    val nullIdDf = Seq(("a", Long.box(1L), 1.0), ("a", null: java.lang.Long, 9.0))
      .toDF("source", "doc_id", "value")
    val stNi = StreamingGroupedSample.applyBatch(spark,
      Files.createTempDirectory("graft_gsample_ni_").toString, k = 2,
      salt = "sample", maxGroups = 10, checkpoint = ck, batch = nullIdDf,
      groupCol = "source", idCol = "doc_id", valueCol = Some("value"),
      batchId = 0L)
    assert(stNi.groups("a").entries.map(_.id) == Seq(1L))
    assert(StreamingGroupedSample.batchBottomKPerGroup(nullIdDf, k = 2,
      valueCol = Some("value")).collect().map(_.getLong(2)).toSeq == Seq(1L))
    // duplicate ids within a batch dedup INSIDE the aggregate (same
    // group), and null-group rows are excluded but counted
    val b0 = Seq((Some("a"), 1L, 1.0), (Some("a"), 1L, 1.0),
      (Some("a"), 2L, 2.0), (Some("b"), 3L, 3.0),
      (None, 9L, 9.0), (None, 10L, 10.0))
    val st1 = StreamingGroupedSample.applyBatch(spark, tmp, k = 2,
      salt = "sample", maxGroups = 10, checkpoint = ck, batch = df(b0),
      groupCol = "source", idCol = "doc_id", valueCol = Some("value"),
      batchId = 0L)
    assert(st1.groups.keySet == Set("a", "b"))
    assert(st1.groups("a").entries.map(_.id).sorted == Seq(1L, 2L))
    assert(st1.groups("a").nSeen == 3L && st1.groups("b").nSeen == 1L)
    assert(st1.excludedNullRows == 2L)
    // replayed batch id: skipped, state unchanged
    val st1b = StreamingGroupedSample.applyBatch(spark, tmp, k = 2,
      salt = "sample", maxGroups = 10, checkpoint = ck,
      batch = df(Seq((Some("zz"), 99L, 9.0))), groupCol = "source",
      idCol = "doc_id", valueCol = Some("value"), batchId = 0L)
    assert(st1b == st1)
    // a re-ingested id dedups against the group's state; a NEW group in a
    // later batch folds in
    val st2 = StreamingGroupedSample.applyBatch(spark, tmp, k = 2,
      salt = "sample", maxGroups = 10, checkpoint = ck,
      batch = df(Seq((Some("a"), 1L, 1.0), (Some("c"), 4L, 4.0))),
      groupCol = "source", idCol = "doc_id", valueCol = Some("value"),
      batchId = 1L)
    assert(st2.groups("a").entries.map(_.id).distinct.size ==
      st2.groups("a").entries.size)
    assert(st2.groups.keySet == Set("a", "b", "c"))
    // bindings: wrong checkpoint / k / salt refuse loudly
    intercept[IllegalStateException](StreamingGroupedSample.applyBatch(
      spark, tmp, k = 2, salt = "sample", maxGroups = 10,
      checkpoint = "file:ckpt-B", batch = df(b0), groupCol = "source",
      idCol = "doc_id", valueCol = Some("value"), batchId = 2L))
    intercept[IllegalStateException](StreamingGroupedSample.applyBatch(
      spark, tmp, k = 3, salt = "sample", maxGroups = 10, checkpoint = ck,
      batch = df(b0), groupCol = "source", idCol = "doc_id",
      valueCol = Some("value"), batchId = 2L))
    intercept[IllegalStateException](StreamingGroupedSample.applyBatch(
      spark, tmp, k = 2, salt = "other", maxGroups = 10, checkpoint = ck,
      batch = df(b0), groupCol = "source", idCol = "doc_id",
      valueCol = Some("value"), batchId = 2L))
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_gsample_f_").toString
    intercept[IllegalStateException](StreamingGroupedSample.applyBatch(
      spark, fresh, k = 2, salt = "sample", maxGroups = 10,
      checkpoint = ck, batch = df(b0), groupCol = "source",
      idCol = "doc_id", valueCol = Some("value"), batchId = 5L))
    // the group cap: a batch pushing past maxGroups refuses LOUDLY and
    // does NOT apply; an over-wide batch reports a lower bound
    val wide = (0 until 30).map(i => (Some(s"g$i"), 100L + i, 1.0))
    val e = intercept[IllegalStateException](
      StreamingGroupedSample.applyBatch(spark, tmp, k = 2,
        salt = "sample", maxGroups = 10, checkpoint = ck,
        batch = df(wide), groupCol = "source", idCol = "doc_id",
        valueCol = Some("value"), batchId = 2L))
    assert(e.getMessage.contains("at least") &&
      e.getMessage.contains("maxGroups=10"), e.getMessage)
    val after = StreamingGroupedSample.readState(spark, tmp)
    assert(after.lastBatchId == 1L, "refused batch must not advance state")
  }

  test("bottom-k sample aggregate: property check vs a Scala reference") {
    // deterministic scalacheck sampling (the VectorKernelSpec idiom — no
    // scalatestplus in the offline cache): random multisets of
    // (group, id) rows with heavy duplication, key a pure hash of id,
    // value = f(id); the aggregate must equal take-k over distinct ids
    // sorted by (key, id), per group, for every k
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[T](gen: Gen[T], n: Int): Seq[T] =
      (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))
    val rowGen = Gen.listOfN(300, for {
      g <- Gen.choose(0, 3)
      id <- Gen.choose(0L, 40L)
    } yield (s"g$g", id))
    def keyOf(id: Long): Long = (id * 2654435761L) % 1000003L
    for ((rows, k) <- samples(rowGen, 3).zip(Seq(1, 5, 17))) {
      val df = rows.map { case (g, id) => (g, keyOf(id), id, id * 0.25) }
        .toDF("g", "key", "id", "value")
      val got = df.groupBy("g")
        .agg(graft.operators.TopKImperative.bottomKSample(k)(
          col("key"), col("id"), col("value")).as("bk"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getLong(1), e.getDouble(2))))
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(_._2).distinct.map(id => (keyOf(id), id, id * 0.25))
          .sortBy(e => (e._1, e._2)).take(k)
      }
      assert(got.keySet == want.keySet)
      got.foreach { case (g, es) =>
        assert(es == want(g), s"k=$k group $g: $es vs ${want(g)}")
      }
    }
  }

  test("bottom-k sample aggregate: dedup under compaction pressure") {
    // force many compactions: k=2 (cap=64), 500 rows over 10 ids with
    // heavy duplication — the aggregate must still land on the exact
    // 2 smallest (key, id) over DISTINCT ids
    val rows = (0 until 500).map { i =>
      val id = (i % 10).toLong
      (id, id * 7L + 3L, id * 1.5) // key = pure function of id
    }
    val out = rows.toDF("id", "key", "value")
      .agg(graft.operators.TopKImperative.bottomKSample(2)(
        col("key"), col("id"), col("value")).as("bk"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(out.size == 2)
    assert(out.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((3L, 0L), (10L, 1L)))
    assert(out.map(_.getDouble(2)) == Seq(0.0, 1.5))
  }
}
