package graft.streaming

import graft.SparkSpec
import graft.operators.{HistogramSketch, Profile}
import graft.operators.HistogramSketch.HistogramSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Cross-cluster state merge — every profiling face's `mergeStates`:
  * regional folds (each under its OWN checkpoint) merged centrally must
  * EQUAL the single-cluster fold over everything (exactly for the exact
  * faces, register-identically for HLL, bound-compositionally for MG),
  * under the shared merge contract: ≥ 2 inputs, all folded, matching
  * bindings, a synthetic `merged:` checkpoint that trips the ingest
  * binding, and no clobbering. */
class StateMergeSpec extends SparkSpec {
  import spark.implicits._

  /** Fold `values` through a REAL stream (own source/checkpoint/state
    * under `base/name`), return the state dir. */
  private def foldMoments(base: String, name: String,
      values: Seq[Long]): String = {
    val src = s"$base/$name/src"
    values.grouped(math.max(1, values.size / 2)).foreach(b =>
      b.toDF("value").coalesce(1).write.mode("append").parquet(src))
    val q = StreamingMoments.ingest(spark, src, s"$base/$name/state",
      s"$base/$name/chk", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    s"$base/$name/state"
  }

  test("moments merge EQUALS the single-cluster fold; contract guards") {
    val tmp = Files.createTempDirectory("graft_merge_mom_").toString
    val regionA = (0L until 100L).toSeq
    val regionB = (100L until 250L).toSeq
    val a = foldMoments(tmp, "a", regionA)
    val b = foldMoments(tmp, "b", regionB)
    val out = s"$tmp/merged"
    val merged = StreamingMoments.mergeStates(spark, Seq(a, b), out)
    // the headline equality: merged ≡ one cluster folding everything
    val all = (regionA ++ regionB).toDF("value")
    assert(merged.moments == StreamingMoments.batchMoments(all, "value"),
      "merged state diverged from the single-cluster fold")
    // persisted and served through the normal read path
    val rt = StreamingMoments.readState(spark, out)
    assert(rt.moments == merged.moments && rt.checkpoint.startsWith("merged:"))
    // the merged artifact REFUSES further ingest (checkpoint binding)
    intercept[IllegalStateException](StreamingMoments.applyBatch(spark,
      out, "file:some-ckpt", Seq(1L).toDF("value"), "value", 99L))
    // no clobbering: merging onto an existing folded state refuses
    intercept[IllegalStateException](
      StreamingMoments.mergeStates(spark, Seq(a, b), out))
    // an empty region refuses loudly
    val empty = Files.createTempDirectory("graft_merge_mom_e_").toString
    val eEmpty = intercept[IllegalStateException](
      StreamingMoments.mergeStates(spark, Seq(a, empty), s"$tmp/m2"))
    assert(eEmpty.getMessage.contains("no folded batches"))
    // mixed value columns refuse loudly
    val c = s"$tmp/c/state"
    StreamingMoments.applyBatch(spark, c, "file:ckpt-c",
      Seq(5L).toDF("other"), "other", 0L)
    val eCol = intercept[IllegalStateException](
      StreamingMoments.mergeStates(spark, Seq(a, c), s"$tmp/m3"))
    assert(eCol.getMessage.contains("different value columns"))
    // arity and self-output guards
    intercept[IllegalArgumentException](
      StreamingMoments.mergeStates(spark, Seq(a), s"$tmp/m4"))
    intercept[IllegalArgumentException](
      StreamingMoments.mergeStates(spark, Seq(a, b), a))
    // self-output under an ALTERNATE SPELLING of the same path: the
    // qualified-path compare must catch it with the self-output
    // remediation, not fall through to the generic no-clobber message
    val eSelf = intercept[IllegalArgumentException](
      StreamingMoments.mergeStates(spark, Seq(a, b), a + "/"))
    assert(eSelf.getMessage.contains("must not be one of the inputs"))
    // a duplicated INPUT dir (same path twice) refuses — it would
    // double-count that region on every additive statistic
    val eDup = intercept[IllegalArgumentException](
      StreamingMoments.mergeStates(spark, Seq(a, a + "/"), s"$tmp/m5"))
    assert(eDup.getMessage.contains("listed more than once"))
    // two DIFFERENT dirs holding copies of the same regional fold (same
    // checkpoint binding) are the same stream's state twice — refused
    // on the checkpoint identity
    val aCopy = s"$tmp/a_copy"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(a), new java.io.File(aCopy))
    val eCk = intercept[IllegalStateException](
      StreamingMoments.mergeStates(spark, Seq(a, aCopy), s"$tmp/m6"))
    assert(eCk.getMessage.contains("same checkpoint binding") &&
      eCk.getMessage.contains("double-count"))
  }

  test("ring states refuse merging in BOTH directions, with the real reason") {
    val tmp = Files.createTempDirectory("graft_merge_ring_").toString
    // a windowed (ring) state dir
    val ringDir = s"$tmp/ring"
    StreamingWindowedMoments.applyBatch(spark, ringDir, 3, "file:ckpt-r",
      Seq(1L, 2L).toDF("value"), "value", 0L)
    // and a real flat regional fold
    val flat = foldMoments(tmp, "flat", 0L until 50L)
    // ring-into-flat: an all-time merge handed a ring dir must name the
    // REAL mistake (non-aligned windows), not "holds no folded batches"
    val e1 = intercept[IllegalStateException](StreamingMoments
      .mergeStates(spark, Seq(flat, ringDir), s"$tmp/m1"))
    assert(e1.getMessage.contains("WINDOWED ring state") &&
      e1.getMessage.contains("not well-defined") &&
      !e1.getMessage.contains("holds no folded batches"))
    // the same misdirection through ANY all-time face's merge
    val e1d = intercept[IllegalStateException](StreamingDistinct
      .mergeStates(spark, Seq(flat, ringDir), s"$tmp/m1d"))
    assert(e1d.getMessage.contains("WINDOWED ring state"))
    // flat-into-ring: the windowed faces' own mergeStates refuses
    // up front — every ring face, one shared message
    val e2 = intercept[UnsupportedOperationException](
      StreamingWindowedMoments.mergeStates(spark,
        Seq(s"$tmp/x", s"$tmp/y"), s"$tmp/m2"))
    assert(e2.getMessage.contains("non-aligned batch windows") &&
      e2.getMessage.contains("Merge the all-time faces"))
    intercept[UnsupportedOperationException](
      StreamingWindowedHistogram.mergeStates(spark,
        Seq(s"$tmp/x", s"$tmp/y"), s"$tmp/m3"))
    intercept[UnsupportedOperationException](
      StreamingWindowedDistinct.mergeStates(spark,
        Seq(s"$tmp/x", s"$tmp/y"), s"$tmp/m4"))
  }

  test("grouped moments merge: pointwise, disjoint+colliding groups, cap") {
    val tmp = Files.createTempDirectory("graft_merge_gmom_").toString
    // region A holds s0+s1, region B holds s1+s2: s1 collides (merged
    // exactly), s0/s2 pass through
    def fold(name: String, rows: Seq[(String, Long)]): String = {
      val src = s"$tmp/$name/src"
      rows.toDF("source", "value").coalesce(1).write.parquet(src)
      val q = StreamingGroupedMoments.ingest(spark, src,
        s"$tmp/$name/state", s"$tmp/$name/chk")
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/state"
    }
    val rowsA = (0 until 40).map(i => (s"s${i % 2}", i.toLong))
    val rowsB = (0 until 60).map(i => (s"s${i % 2 + 1}", 100L + i))
    val a = fold("a", rowsA)
    val b = fold("b", rowsB)
    val merged = StreamingGroupedMoments.mergeStates(spark, Seq(a, b),
      s"$tmp/merged")
    assert(merged.groups.keySet == Set("s0", "s1", "s2"))
    // every group's merged moments ≡ the batch face over the union
    val union = (rowsA ++ rowsB).toDF("source", "value")
    val twin = Profile.momentsPerGroup(union, "source", "value").collect()
      .map(r => r.getString(0) ->
        StreamingMoments.momentsFromRow(r, 1, "twin")).toMap
    merged.groups.foreach { case (g, m) =>
      assert(m == twin(g), s"group $g diverged")
    }
    // the union cap: two regions of disjoint groups exceeding maxGroups
    val e = intercept[IllegalStateException](
      StreamingGroupedMoments.mergeStates(spark, Seq(a, b), s"$tmp/m2",
        maxGroups = 2))
    assert(e.getMessage.contains("maxGroups=2"))
  }

  test("comoments merge (flat + grouped) EQUALS the single-cluster fold") {
    val tmp = Files.createTempDirectory("graft_merge_com_").toString
    def fold(name: String, rows: Seq[(Long, Long)]): String = {
      val src = s"$tmp/$name/src"
      rows.toDF("x", "y").coalesce(1).write.parquet(src)
      val q = StreamingComoments.ingest(spark, src, s"$tmp/$name/state",
        s"$tmp/$name/chk")
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/state"
    }
    val rowsA = (0 until 80).map(i => (i.toLong, 3L * i + i % 5))
    val rowsB = (0 until 50).map(i => (200L + i, 7L * i))
    val a = fold("a", rowsA)
    val b = fold("b", rowsB)
    val merged = StreamingComoments.mergeStates(spark, Seq(a, b),
      s"$tmp/merged")
    assert(merged.comoments == StreamingComoments.batchComoments(
      (rowsA ++ rowsB).toDF("x", "y"), "x", "y"))
    // a swapped-pair region refuses
    val c = s"$tmp/c/state"
    StreamingComoments.applyBatch(spark, c, "file:ckpt-c",
      Seq((1L, 2L)).toDF("y", "x").select(col("y"), col("x")), "y", "x", 0L)
    val e = intercept[IllegalStateException](
      StreamingComoments.mergeStates(spark, Seq(a, c), s"$tmp/m2"))
    assert(e.getMessage.contains("ordered column pairs"))
    // grouped: colliding group merged exactly against the batch twin
    def gfold(name: String, rows: Seq[(String, Long, Long)]): String = {
      val src = s"$tmp/$name/gsrc"
      rows.toDF("source", "x", "y").coalesce(1).write.parquet(src)
      val q = StreamingGroupedComoments.ingest(spark, src,
        s"$tmp/$name/gstate", s"$tmp/$name/gchk")
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/gstate"
    }
    val gRowsA = (0 until 30).map(i => (s"g${i % 2}", i.toLong, 2L * i))
    val gRowsB = (0 until 30).map(i => (s"g${i % 2 + 1}", 50L + i, i.toLong))
    val ga = gfold("ga", gRowsA)
    val gb = gfold("gb", gRowsB)
    val gm = StreamingGroupedComoments.mergeStates(spark, Seq(ga, gb),
      s"$tmp/gmerged")
    val gtwin = Profile.comomentsPerGroup(
      (gRowsA ++ gRowsB).toDF("source", "x", "y"), "source", "x", "y")
      .collect().map(r => r.getString(0) ->
        StreamingComoments.comomentsFromRow(r, 1, "twin")).toMap
    assert(gm.groups.keySet == Set("g0", "g1", "g2"))
    gm.groups.foreach { case (g, m) => assert(m == gtwin(g), s"group $g") }
  }

  test("sample merge is BIT-IDENTICAL to the single-cluster bottom-k") {
    val tmp = Files.createTempDirectory("graft_merge_smp_").toString
    def fold(name: String, ids: Seq[Long]): String = {
      val src = s"$tmp/$name/src"
      ids.map(i => (i, i.toDouble)).toDF("doc_id", "value")
        .coalesce(1).write.parquet(src)
      val q = StreamingSample.ingest(spark, src, s"$tmp/$name/state",
        s"$tmp/$name/chk", k = 16, valueCol = Some("value"))
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/state"
    }
    // overlapping regions: the shared ids dedup by identity in the merge
    val a = fold("a", 0L until 300L)
    val b = fold("b", 200L until 600L)
    val merged = StreamingSample.mergeStates(spark, Seq(a, b), s"$tmp/merged")
    // the single-cluster twin over the UNION of distinct ids
    val union = (0L until 600L).map(i => (i, i.toDouble))
      .toDF("doc_id", "value")
    val src = s"$tmp/all/src"
    union.coalesce(1).write.parquet(src)
    val q = StreamingSample.ingest(spark, src, s"$tmp/all/state",
      s"$tmp/all/chk", k = 16, valueCol = Some("value"))
    q.processAllAvailable(); q.stop()
    val twin = StreamingSample.readState(spark, s"$tmp/all/state")
    assert(merged.entries == twin.entries,
      "merged bottom-k diverged from the single-cluster sample")
    assert(merged.nSeen == 300L + 400L, "nSeen counts arrivals per region")
    // a mismatched (k, salt) binding refuses
    val c = s"$tmp/c/src"
    (0L until 10L).map(i => (i, i.toDouble)).toDF("doc_id", "value")
      .coalesce(1).write.parquet(c)
    val qc = StreamingSample.ingest(spark, c, s"$tmp/c/state",
      s"$tmp/c/chk", k = 8, valueCol = Some("value"))
    qc.processAllAvailable(); qc.stop()
    val e = intercept[IllegalStateException](StreamingSample.mergeStates(
      spark, Seq(a, s"$tmp/c/state"), s"$tmp/m2"))
    assert(e.getMessage.contains("(k, salt)"))
  }

  test("distinct merge: registers equal the single-cluster union") {
    val tmp = Files.createTempDirectory("graft_merge_dis_").toString
    def fold(name: String, vals: Seq[String]): String = {
      val src = s"$tmp/$name/src"
      vals.toDF("value").coalesce(1).write.parquet(src)
      val q = StreamingDistinct.ingest(spark, src, s"$tmp/$name/state",
        s"$tmp/$name/chk")
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/state"
    }
    // overlapping value sets: cross-region duplicates count once
    val a = fold("a", (0 until 300).map(i => s"v$i"))
    val b = fold("b", (200 until 700).map(i => s"v$i"))
    val merged = StreamingDistinct.mergeStates(spark, Seq(a, b),
      s"$tmp/merged")
    assert(merged.nRows == 800L && merged.nNull == 0L)
    // 700 distinct is past the sketch's exact sparse regime — the
    // estimate carries the documented ~1.04/sqrt(2^12) relative error;
    // the union must still land within the family's 5% gate (and count
    // cross-region duplicates once: a naive sum would say 800)
    assert(math.abs(merged.estimate.get - 700.0) / 700.0 <= 0.05,
      merged.estimate)
    // the registers of a union depend only on the VALUE SET, not on how
    // it was regioned — but the served estimator differs by build path
    // (a union result serves the composite estimate, a directly-updated
    // sketch serves HIP), so the twin comparison pins estimator-level
    // agreement, not bit equality: both estimates describe the same 700
    // distinct values and must sit within the two estimators' combined
    // band (far tighter than the dedup signal — a double-counted overlap
    // would read ~800)
    val (_, _, twinSketch) = StreamingDistinct.batchSketch(
      (0 until 700).map(i => s"v$i").toDF("value"), "value",
      StreamingDistinct.DefaultLgK)
    val twinEst = org.apache.datasketches.hll.HllSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(twinSketch))
      .getEstimate
    assert(math.abs(merged.estimate.get - twinEst) / 700.0 <= 0.02,
      s"merged ${merged.estimate.get} vs twin $twinEst")
  }

  test("histogram merge: bin-wise exact; divergent binning refuses") {
    val tmp = Files.createTempDirectory("graft_merge_his_").toString
    val spec = HistogramSpec(0.0, 100.0, 10)
    def fold(name: String, vals: Seq[Double], sp: HistogramSpec): String = {
      val src = s"$tmp/$name/src"
      vals.toDF("value").coalesce(1).write.parquet(src)
      val q = StreamingHistogram.ingest(spark, src, s"$tmp/$name/state",
        s"$tmp/$name/chk", sp)
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/state"
    }
    val valsA = (0 until 200).map(i => (i % 120).toDouble - 5.0) // under+over
    val valsB = (0 until 150).map(i => (i % 90).toDouble)
    val a = fold("a", valsA, spec)
    val b = fold("b", valsB, spec)
    val merged = StreamingHistogram.mergeStates(spark, Seq(a, b),
      s"$tmp/merged")
    // bin-for-bin against the one-shot count over the union
    val twin = HistogramSketch.counts(
      (valsA ++ valsB).toDF("value"), "value", spec)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged.bins == twin, "merged bins diverged from the one-shot")
    // a divergent binning refuses loudly
    val c = fold("c", valsB, HistogramSpec(0.0, 100.0, 20))
    val e = intercept[IllegalStateException](
      StreamingHistogram.mergeStates(spark, Seq(a, c), s"$tmp/m2"))
    assert(e.getMessage.contains("different binnings"))
  }

  test("grouped sample/distinct/histogram/MG merges: pointwise vs twins") {
    val tmp = Files.createTempDirectory("graft_merge_g4_").toString
    // grouped SAMPLE: region A holds s0+s1, region B holds s1+s2 with
    // ids overlapping A's in the colliding group
    def sfold(name: String, rows: Seq[(String, Long)]): String = {
      val src = s"$tmp/$name/ssrc"
      rows.map { case (g, i) => (g, i, i.toDouble) }
        .toDF("source", "doc_id", "value").coalesce(1).write.parquet(src)
      val q = StreamingGroupedSample.ingest(spark, src, s"$tmp/$name/sstate",
        s"$tmp/$name/schk", k = 8, valueCol = Some("value"))
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/sstate"
    }
    val sRowsA = (0 until 60).map(i => (s"s${i % 2}", i.toLong))
    val sRowsB = (30 until 120).map(i => (s"s${i % 2 + 1}", i.toLong))
    val sm = StreamingGroupedSample.mergeStates(spark,
      Seq(sfold("a", sRowsA), sfold("b", sRowsB)), s"$tmp/smerged")
    assert(sm.groups.keySet == Set("s0", "s1", "s2"))
    // each group's merged bottom-k is bit-identical to a single-cluster
    // fold over the UNION of that group's distinct ids
    val unionRows = (sRowsA ++ sRowsB).distinct
    val twinDir = sfold("all", unionRows)
    val twin = StreamingGroupedSample.readState(spark, twinDir)
    sm.groups.foreach { case (g, s) =>
      assert(s.entries == twin.groups(g).entries, s"sample group $g") }

    // grouped DISTINCT: overlapping per-group value sets count once
    def dfold(name: String, rows: Seq[(String, String)]): String = {
      val src = s"$tmp/$name/dsrc"
      rows.toDF("source", "value").coalesce(1).write.parquet(src)
      val q = StreamingGroupedDistinct.ingest(spark, src,
        s"$tmp/$name/dstate", s"$tmp/$name/dchk")
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/dstate"
    }
    val dRowsA = (0 until 100).map(i => (s"g${i % 2}", s"v${i % 40}"))
    val dRowsB = (20 until 140).map(i => (s"g${i % 2}", s"v${i % 60}"))
    val dm = StreamingGroupedDistinct.mergeStates(spark,
      Seq(dfold("a", dRowsA), dfold("b", dRowsB)), s"$tmp/dmerged")
    // sparse-regime exactness per group: estimate == exact distinct of
    // the union of that group's values
    val dUnion = (dRowsA ++ dRowsB).groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._2).distinct.size }
    dm.groups.foreach { case (g, d) =>
      assert(math.rint(d.estimate.getOrElse(0.0)).toInt == dUnion(g),
        s"distinct group $g: ${d.estimate} vs ${dUnion(g)}") }
    assert(dm.groups("g0").nRows == 110L, "per-group row counters add")

    // grouped HISTOGRAM: bin-wise exact per group vs one-shot counts
    val spec = HistogramSpec(0.0, 50.0, 5)
    def hfold(name: String, rows: Seq[(String, Double)]): String = {
      val src = s"$tmp/$name/hsrc"
      rows.toDF("source", "value").coalesce(1).write.parquet(src)
      val q = StreamingGroupedHistogram.ingest(spark, src,
        s"$tmp/$name/hstate", s"$tmp/$name/hchk", spec,
        groupCol = "source")
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/hstate"
    }
    val hRowsA = (0 until 80).map(i => (s"e${i % 2}", (i % 60).toDouble))
    val hRowsB = (0 until 70).map(i => (s"e${i % 2 + 1}", (i % 45).toDouble))
    val hm = StreamingGroupedHistogram.mergeStates(spark,
      Seq(hfold("a", hRowsA), hfold("b", hRowsB)), s"$tmp/hmerged")
    assert(hm.groups.keySet == Set("e0", "e1", "e2"))
    val hUnion = (hRowsA ++ hRowsB).toDF("source", "value")
    hm.groups.foreach { case (g, h) =>
      val twinBins = HistogramSketch.counts(
        hUnion.filter(col("source") === g).select("value"), "value", spec)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(h.bins == twinBins, s"histogram group $g") }

    // grouped MG: per-group recount over the union equals exact
    def mgfold(name: String, rows: Seq[(Long, String, String)]): String = {
      val src = s"$tmp/$name/msrc"
      rows.toDF("doc_id", "source", "text").coalesce(1).write.parquet(src)
      val q = StreamingGroupedHeavyHitters.ingest(spark, src,
        s"$tmp/$name/mstate", s"$tmp/$name/mchk", denominator = 5)
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/mstate"
    }
    def mgdocs(pref: String, hot: String, n: Int) = (0 until n).map(i =>
      (i.toLong, s"d${i % 2}",
        if (i % 2 == 0) s"$hot $hot filler" else s"$pref$i tail"))
    val ma = mgfold("a", mgdocs("a", "hot", 60))
    val mb = mgfold("b", mgdocs("b", "hot", 40))
    val mm = StreamingGroupedHeavyHitters.mergeStates(spark, Seq(ma, mb),
      s"$tmp/mmerged")
    val mgUnion = (mgdocs("a", "hot", 60) ++ mgdocs("b", "hot", 40))
      .toDF("doc_id", "source", "text")
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token"))
    val got = StreamingGroupedHeavyHitters.heavyHittersFromSnapshot(mm,
      s"$tmp/mmerged", spark, mgUnion, "source", "token", denominator = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val exact = graft.operators.HeavyHitters.exactPerGroup(mgUnion,
      "source", "token", denominator = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exact, s"grouped MG merged recount $got != exact $exact")
  }

  test("MG merge: composed bound holds — recount over the union is exact") {
    val tmp = Files.createTempDirectory("graft_merge_mg_").toString
    // two regions with one shared dominant token and disjoint tails
    def docs(name: String, hot: String, n: Int): String = {
      val src = s"$tmp/$name/src"
      (0 until n).map(i =>
        (i.toLong, if (i % 3 == 0) s"$hot $hot common" else s"$name$i rare"))
        .toDF("doc_id", "text").coalesce(1).write.parquet(src)
      src
    }
    val srcA = docs("a", "alpha", 120)
    val srcB = docs("b", "alpha", 90)
    def fold(name: String, src: String): String = {
      val q = StreamingHeavyHitters.ingest(spark, src, s"$tmp/$name/state",
        s"$tmp/$name/chk", denominator = 10)
      q.processAllAvailable(); q.stop()
      s"$tmp/$name/state"
    }
    val a = fold("a", srcA)
    val b = fold("b", srcB)
    val merged = StreamingHeavyHitters.mergeStates(spark, Seq(a, b),
      s"$tmp/merged")
    // the recount over the UNION corpus off the merged candidates equals
    // the exact batch operator over the same union — the composed-bound
    // guarantee in action
    val union = spark.read.parquet(srcA).unionByName(spark.read.parquet(srcB))
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
    val got = StreamingHeavyHitters.heavyHittersFromSnapshot(merged,
      s"$tmp/merged", union, "token", denominator = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = graft.operators.HeavyHitters.exact(union, "token",
      denominator = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact, s"merged-state recount $got != exact $exact")
    // mixed k refuses
    val qc = StreamingHeavyHitters.ingest(spark, srcB, s"$tmp/c/state",
      s"$tmp/c/chk", denominator = 10, sketchK = 40)
    qc.processAllAvailable(); qc.stop()
    val e = intercept[IllegalStateException](StreamingHeavyHitters
      .mergeStates(spark, Seq(a, s"$tmp/c/state"), s"$tmp/m2"))
    assert(e.getMessage.contains("different k"))
  }
}
