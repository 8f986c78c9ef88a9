package graft.store

import graft.SparkSpec
import graft.store.VectorStore._
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Serving-index store artifacts: the saved-HNSW recent tier
  * (buildRecentIndex / searchBatch(useRecentIndex)) and the PQ code tier
  * (enablePq / searchBatchPq), including mutation composition (delta scan,
  * tombstones, overlay-aware filters) and maintenance invalidation. */
class StoreIndexSpec extends SparkSpec {

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(j => math.sin(seed * (j + 1)).toFloat)

  private def mkQueries(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, vec(i.toInt))).toDF("query_id", "q_embedding")
  }

  private def hitSet(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(String, Double)]] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, math.rint(x._3 * 1e9) / 1e9)).sortBy(identity).toSeq)
      .toMap

  test("indexed recent-tier search is oracle-equal to the exact path") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_ri_").toString, Config(nClusters = 4))
    st.insert((0 until 60).map(i =>
      VectorRecord(s"r$i", vec(i), Some(s"""{"grp": ${i % 2}}"""))))
    st.buildRecentIndex()
    assert(st.hasRecentIndex)
    val q = mkQueries(3L, 17L)

    // plain: indexed == exact, ids and distances
    val exact = hitSet(st.searchBatch(q, k = 5, metric = "l2"))
    val idx = hitSet(st.searchBatch(q, k = 5, metric = "l2", useRecentIndex = true))
    assert(idx == exact)

    // post-build inserts surface via the delta scan
    st.insert(Seq(VectorRecord("fresh3", vec(3)))) // exact dup of query 3's vector
    val idx2 = hitSet(st.searchBatch(q, k = 2, metric = "l2", useRecentIndex = true))
    assert(idx2(3L).map(_._1).toSet == Set("r3", "fresh3"))

    // post-build deletes are masked by the tombstone allow-list
    st.delete(Seq("r3", "fresh3"))
    val idx3 = hitSet(st.searchBatch(q, k = 3, metric = "l2", useRecentIndex = true))
    val exact3 = hitSet(st.searchBatch(q, k = 3, metric = "l2"))
    assert(!idx3(3L).exists(h => h._1 == "r3" || h._1 == "fresh3"))
    assert(idx3 == exact3)

    // filtered search applies the (overlay-aware) metadata filter
    st.updateMetadata("r17", """{"grp": 0}""") // flip 17 out of grp 1
    val f = Some("""{"grp": 1}""")
    val idxF = hitSet(st.searchBatch(q, k = 4, metric = "l2",
      useRecentIndex = true, filterJson = f))
    val exactF = hitSet(st.searchBatch(q, k = 4, metric = "l2", filterJson = f))
    assert(idxF == exactF)
    assert(!idxF(17L).exists(_._1 == "r17"))

    // metric mismatch fails loudly instead of merging incomparable distances
    val err = intercept[IllegalArgumentException] {
      st.searchBatch(q, k = 2, metric = "cosine", useRecentIndex = true).collect()
    }
    assert(err.getMessage.contains("metric"))
  }

  test("routed recent index: probeBlobs self-retrieval; un-routed ignores it") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_rrt_").toString, Config(nClusters = 4))
    st.insert((0 until 80).map(i => VectorRecord(s"v$i", vec(i))))
    // routed build with no store centroids yet: trains its own routing
    // clusters over the recent tier (numBlobs of them)
    st.buildRecentIndex(numBlobs = 8, routed = true)
    assert(st.recentIndexBuildParams.exists(_._5), "routed flag must persist")
    val q = mkQueries(3L, 17L, 42L)
    // corpus-vector queries: the query's own blob is its nearest routing
    // centroid, so rank-1 self-retrieval survives probeBlobs << #blobs
    val routed = st.searchBatch(q, k = 3, metric = "l2",
      useRecentIndex = true, recentProbeBlobs = 3)
    val top1 = routed.groupBy("query_id")
      .agg(min_by(col("id"), col("distance")).as("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top1 == Map(3L -> "v3", 17L -> "v17", 42L -> "v42"))
    // probeBlobs covering every blob == exact (routing only prunes)
    val full = hitSet(st.searchBatch(q, k = 3, metric = "l2",
      useRecentIndex = true, recentProbeBlobs = 100))
    val exact = hitSet(st.searchBatch(q, k = 3, metric = "l2"))
    assert(full == exact)
    // an UN-routed index silently ignores probeBlobs (its blob centroids
    // all sit near the global mean — routing there would lose recall)
    st.buildRecentIndex(numBlobs = 8)
    val unrouted = hitSet(st.searchBatch(q, k = 3, metric = "l2",
      useRecentIndex = true, recentProbeBlobs = 2))
    assert(unrouted == exact)
    // the scheduler's like-for-like rebuild preserves the routed build
    st.buildRecentIndex(numBlobs = 8, routed = true)
    assert(st.recentIndexBuildParams.contains((100, 16, "l2", 8, true)))
  }

  test("query batches beyond the localize bound fail loudly, not with an OOM") {
    import spark.implicits._
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_qb_").toString, Config(nClusters = 2))
    st.insert((0 until 4).map(i => VectorRecord(s"b$i", vec(i))))
    // a query relation larger than maxQueryBatch must be rejected BEFORE
    // the driver materializes it (the serving paths collect the batch once)
    val big = spark.range(0, 100001L)
      .select(col("id").as("query_id"), typedlit(vec(1).toSeq).as("q_embedding"))
    val e = intercept[IllegalArgumentException](
      st.searchBatch(big, k = 1, metric = "l2").collect())
    assert(e.getMessage.contains("maxQueryBatch"))
  }

  test("maintenance invalidates the recent index (migrate and vacuum)") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_rinv_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 2))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 20).map(i => VectorRecord(s"m$i", vec(i), tsString = Some(oldTs))))
    st.insert((20 until 30).map(i => VectorRecord(s"m$i", vec(i))))
    st.buildRecentIndex()
    assert(st.migrate() == 20)
    assert(!st.hasRecentIndex, "migrate must drop the stale recent index")
    st.buildRecentIndex()
    assert(st.hasRecentIndex)
    st.delete(Seq("m25"))
    st.vacuum()
    assert(!st.hasRecentIndex, "vacuum must drop the stale recent index")
    // and the un-indexed path still serves correctly after maintenance
    val hits = hitSet(st.searchBatch(mkQueries(22L), k = 3, metric = "l2"))
    assert(hits(22L).minBy(_._2)._1 == "m22")
  }

  test("PQ tier round-trips and serves oracle-equal top-k with full probe") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_pqt_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 50).map(i => VectorRecord(s"p$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 50)
    st.insert((50 until 56).map(i => VectorRecord(s"p$i", vec(i))))
    st.enablePq(m = 4, kCodes = 8, trainSize = 50)
    assert(st.hasPq)
    val q = mkQueries(7L, 52L)
    // full probe + shortlist >= corpus => ADC shortlist covers everything,
    // exact rerank makes the result identical to the exact hybrid path
    val pq = hitSet(st.searchBatchPq(q, k = 5, nProbe = 4, shortlist = 100))
    val exact = hitSet(st.searchBatch(q, k = 5, metric = "l2", nProbe = 4))
    assert(pq == exact)

    // tombstones mask encoded rows
    st.delete(Seq("p7"))
    val pq2 = hitSet(st.searchBatchPq(q, k = 5, nProbe = 4, shortlist = 100))
    assert(!pq2(7L).exists(_._1 == "p7"))

    // post-encode migration surfaces via the historical delta scan
    val moreOld = java.time.Instant.now().minusSeconds(7200).toString
    st.insert(Seq(VectorRecord("pLate", vec(7), tsString = Some(moreOld))))
    assert(st.migrate() == 1)
    val pq3 = hitSet(st.searchBatchPq(q, k = 3, nProbe = 4, shortlist = 100))
    assert(pq3(7L).exists(_._1 == "pLate"), "delta row must be searchable pre-re-encode")

    // rebalance / vacuum invalidate codes; retrain=false re-encodes cheaply
    st.vacuum()
    assert(!st.hasPq, "vacuum must drop the stale code table")
    st.enablePq(retrain = false)
    assert(st.hasPq)
    val pq4 = hitSet(st.searchBatchPq(q, k = 3, nProbe = 4, shortlist = 100))
    val exact4 = hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4))
    assert(pq4 == exact4)
  }

  test("residual PQ tier: flag persists, serves oracle-equal l2 and cosine") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_pqr_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 50).map(i => VectorRecord(s"r$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 50)
    st.enablePq(m = 4, kCodes = 8, trainSize = 50, residual = true)
    assert(st.hasPq)
    val q = mkQueries(7L, 52L)
    // full probe + shortlist >= corpus + exact rerank => identical to exact
    val pq = hitSet(st.searchBatchPq(q, k = 5, nProbe = 4, shortlist = 100))
    val exact = hitSet(st.searchBatch(q, k = 5, metric = "l2", nProbe = 4))
    assert(pq == exact)
    // the residual tier serves cosine too (per-query dot + per-cluster
    // norm tables): full probe + shortlist >= corpus + exact rerank must
    // again be identical to the exact path under the same metric
    val pqCos = hitSet(st.searchBatchPq(q, k = 5, nProbe = 4,
      shortlist = 100, metric = "cosine"))
    val exactCos = hitSet(st.searchBatch(q, k = 5, metric = "cosine", nProbe = 4))
    assert(pqCos == exactCos)
    // refresh dispatches the residual encode for the delta
    val moreOld = java.time.Instant.now().minusSeconds(7200).toString
    st.insert(Seq(VectorRecord("rLate", vec(7), tsString = Some(moreOld))))
    assert(st.migrate() == 1)
    assert(st.refreshPq() == 1)
    val pq2 = hitSet(st.searchBatchPq(q, k = 3, nProbe = 4, shortlist = 100))
    assert(pq2(7L).exists(_._1 == "rLate"))
    // the documented post-vacuum recipe reuses the SAVED formulation:
    // enablePq(retrain = false) on a residual store stays residual
    st.enablePq(retrain = false)
    val pq3 = hitSet(st.searchBatchPq(q, k = 3, nProbe = 4, shortlist = 100))
    val exact3 = hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4))
    assert(pq3 == exact3)
    // still residual after the re-encode: cosine keeps serving oracle-equal
    val pq3c = hitSet(st.searchBatchPq(q, k = 3, nProbe = 4, shortlist = 100,
      metric = "cosine"))
    val exact3c = hitSet(st.searchBatch(q, k = 3, metric = "cosine", nProbe = 4))
    assert(pq3c == exact3c)
  }

  test("retrain=false cannot silently switch a plain PQ store to residual") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_pqp_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 30).map(i => VectorRecord(s"q$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 30)
    st.enablePq(m = 4, kCodes = 8, trainSize = 30) // plain
    intercept[IllegalArgumentException](
      st.enablePq(retrain = false, residual = true))
  }

  test("OPQ tier: lifecycle, delta refresh, invalidation, searchMode('opq')") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_opqt_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 50).map(i => VectorRecord(s"o$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 50)
    st.insert((50 until 56).map(i => VectorRecord(s"o$i", vec(i))))
    st.enableOpq(m = 4, kCodes = 8, trainSize = 50, iters = 2)
    assert(st.hasOpq)
    val q = mkQueries(7L, 52L)
    // full probe + shortlist >= corpus + exact raw-space rerank =>
    // identical to the exact hybrid path (the rotation only reorders the
    // ADC shortlist, which covers everything here)
    val opq = hitSet(st.searchBatchOpq(q, k = 5, nProbe = 4, shortlist = 100))
    val exact = hitSet(st.searchBatch(q, k = 5, metric = "l2", nProbe = 4))
    assert(opq == exact)
    // cosine serves too: rotated-dot ADC tables, raw exact rerank
    val opqCos = hitSet(st.searchBatchOpq(q, k = 5, nProbe = 4,
      shortlist = 100, metric = "cosine"))
    val exactCos = hitSet(st.searchBatch(q, k = 5, metric = "cosine", nProbe = 4))
    assert(opqCos == exactCos)

    // tombstones mask encoded rows
    st.delete(Seq("o7"))
    val opq2 = hitSet(st.searchBatchOpq(q, k = 5, nProbe = 4, shortlist = 100))
    assert(!opq2(7L).exists(_._1 == "o7"))

    // post-encode migration surfaces via the historical delta scan, then
    // refreshOpq() folds it into the code table (and no-delta runs are 0)
    val moreOld = java.time.Instant.now().minusSeconds(7200).toString
    st.insert(Seq(VectorRecord("oLate", vec(7), tsString = Some(moreOld))))
    assert(st.migrate() == 1)
    val opq3 = hitSet(st.searchBatchOpq(q, k = 3, nProbe = 4, shortlist = 100))
    assert(opq3(7L).exists(_._1 == "oLate"), "delta row must be searchable pre-refresh")
    assert(st.refreshOpq() == 1)
    assert(st.refreshOpq() == 0, "no-delta refresh must encode nothing")
    val opq4 = hitSet(st.searchBatchOpq(q, k = 3, nProbe = 4, shortlist = 100))
    assert(opq4(7L).exists(_._1 == "oLate"))

    // vacuum invalidates codes but keeps the trained model; the documented
    // post-maintenance recipe re-encodes from it without retraining
    st.vacuum()
    assert(!st.hasOpq, "vacuum must drop the stale code table")
    st.enableOpq(retrain = false)
    assert(st.hasOpq)
    val opq5 = hitSet(st.searchBatchOpq(q, k = 3, nProbe = 4, shortlist = 100))
    val exact5 = hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4))
    assert(opq5 == exact5)

    // the uniform single-query face dispatches the tier
    val sm = st.searchMode(vec(22), k = 1, mode = "opq", metric = "l2",
      oversample = 1)
    assert(sm.select("id").head().getString(0) == "o22")
  }

  test("OPQ rotation staleness probe trips on drift; retrain restores it") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_opqd_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    // distribution A: variance lives in the first two dims
    def vecA(i: Int): Array[Float] = Array.tabulate(8)(j =>
      if (j < 2) math.sin(i * (j + 1)).toFloat else 0.01f * j)
    // distribution B: variance lives in the LAST dims, 10x the scale —
    // a rotation+codebooks learned on A reconstructs it badly
    def vecB(i: Int): Array[Float] = Array.tabulate(8)(j =>
      if (j >= 6) 10f * math.cos(i * (j + 1)).toFloat else 0.01f * j)
    st.insert((0 until 60).map(i =>
      VectorRecord(s"a$i", vecA(i), tsString = Some(oldTs))))
    assert(st.migrate() == 60)
    st.enableOpq(m = 4, kCodes = 8, trainSize = 60, iters = 2)
    // freshly trained: fresh sample IS the training corpus — ratio ~ 1
    val p0 = st.opqRotationDrift().get
    assert(p0.ratio < VectorStore.OpqStaleRatioAlert,
      s"fresh model must not read stale: $p0")
    assert(st.checkIntegrity().opqRotationMseRatio == p0.ratio)

    // drift: B floods the tier; refreshOpq delta-encodes with the SAVED
    // (now stale) rotation — correct code-space behavior, eroding recall
    st.insert((0 until 240).map(i =>
      VectorRecord(s"b$i", vecB(i), tsString = Some(oldTs))))
    assert(st.migrate() == 240)
    assert(st.refreshOpq() == 240)
    val p1 = st.opqRotationDrift().get
    assert(p1.ratio >= VectorStore.OpqStaleRatioAlert,
      s"probe must trip after the corpus drifted: $p1")
    assert(st.checkIntegrity().opqRotationMseRatio >=
      VectorStore.OpqStaleRatioAlert)

    // retrain: new rotation + codebooks on the CURRENT corpus, new
    // baseline — the gate is restored
    st.enableOpq(m = 4, kCodes = 8, trainSize = 300, iters = 2,
      retrain = true)
    val p2 = st.opqRotationDrift().get
    assert(p2.ratio < VectorStore.OpqStaleRatioAlert,
      s"retrain must restore the gate: $p2")

    // no-OPQ store: the -1 "could not verify" sentinel, never a fake 1.0
    val st2 = new VectorStore(spark,
      Files.createTempDirectory("graft_opqd2_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    st2.insert(Seq(VectorRecord("x", vec(1), tsString = Some(oldTs))))
    st2.migrate()
    assert(st2.opqRotationDrift().isEmpty)
    assert(st2.checkIntegrity().opqRotationMseRatio == -1.0)
  }

  test("scheduler drift gate: opt-in policy retrains the stale OPQ tier " +
      "in its own shape") {
    import graft.streaming.{MigrationPolicy, MigrationScheduler}
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_opqsch_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    def vecA(i: Int): Array[Float] = Array.tabulate(8)(j =>
      if (j < 2) math.sin(i * (j + 1)).toFloat else 0.01f * j)
    def vecB(i: Int): Array[Float] = Array.tabulate(8)(j =>
      if (j >= 6) 10f * math.cos(i * (j + 1)).toFloat else 0.01f * j)
    st.insert((0 until 60).map(i =>
      VectorRecord(s"a$i", vecA(i), tsString = Some(oldTs))))
    assert(st.migrate() == 60)
    st.enableOpq(m = 4, kCodes = 8, trainSize = 60, iters = 1)
    // a ratio <= 1.0 would retrain every run: policy refuses it loudly
    intercept[IllegalArgumentException](
      MigrationPolicy(opqRetrainAtRatio = Some(1.0)))
    val sched = new MigrationScheduler(st, MigrationPolicy(
      maxVectorsPerRun = 500,
      opqRetrainAtRatio = Some(VectorStore.OpqStaleRatioAlert)))
    // drift lands as RECENT rows; ONE scheduler run must migrate them,
    // delta-refresh the codes with the (stale) saved rotation, see the
    // drift gate trip, and retrain — the full loop on policy
    st.insert((0 until 240).map(i =>
      VectorRecord(s"b$i", vecB(i), tsString = Some(oldTs))))
    val r = sched.runMigration()
    assert(r.vectorsMigrated == 240L)
    assert(r.opqRetrained, "drift gate must have retrained")
    val p = st.opqRotationDrift().get
    assert(p.ratio < VectorStore.OpqStaleRatioAlert,
      s"retrain must restore the gate: $p")
    // the retrain kept the tier's persisted shape (m=4, 8 codes), never
    // the enableOpq defaults
    val model = graft.operators.Opq.load(spark, st.path + "/opq_model")
    assert(model.pq.m == 4 && model.pq.k == 8)
    // a quiet (undrifted) follow-up run does NOT retrain
    val r2 = sched.runMigration()
    assert(!r2.opqRetrained, "no drift, no retrain")
  }

  test("SQ tier round-trips and serves oracle-equal top-k with full probe") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_sqt_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 50).map(i => VectorRecord(s"s$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 50)
    st.insert((50 until 56).map(i => VectorRecord(s"s$i", vec(i))))
    st.enableSq()
    assert(st.hasSq)
    val q = mkQueries(7L, 52L)
    // full probe + shortlist >= corpus => the dequantized shortlist covers
    // everything, exact rerank makes the result identical to the exact path
    val sq = hitSet(st.searchBatchSq(q, k = 5, nProbe = 4, shortlist = 100))
    val exact = hitSet(st.searchBatch(q, k = 5, metric = "l2", nProbe = 4))
    assert(sq == exact)

    // tombstones mask encoded rows
    st.delete(Seq("s7"))
    val sq2 = hitSet(st.searchBatchSq(q, k = 5, nProbe = 4, shortlist = 100))
    assert(!sq2(7L).exists(_._1 == "s7"))

    // post-encode migration surfaces via the historical delta scan
    val moreOld = java.time.Instant.now().minusSeconds(7200).toString
    st.insert(Seq(VectorRecord("sLate", vec(7), tsString = Some(moreOld))))
    assert(st.migrate() == 1)
    val sq3 = hitSet(st.searchBatchSq(q, k = 3, nProbe = 4, shortlist = 100))
    assert(sq3(7L).exists(_._1 == "sLate"), "delta row must be searchable pre-re-encode")

    // vacuum invalidates codes; model-free re-enable is one map-only pass
    st.vacuum()
    assert(!st.hasSq, "vacuum must drop the stale code table")
    st.enableSq()
    assert(st.hasSq)
    val sq4 = hitSet(st.searchBatchSq(q, k = 3, nProbe = 4, shortlist = 100))
    val exact4 = hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4))
    assert(sq4 == exact4)
  }

  test("refreshPq/refreshSq delta-encode only the post-enable migration batch") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_rfr_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 40).map(i => VectorRecord(s"f$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 40)
    st.enablePq(m = 4, kCodes = 8, trainSize = 40)
    st.enableSq()
    // nothing to refresh right after a full encode
    assert(st.refreshPq() == 0)
    assert(st.refreshSq() == 0)
    // a later migration batch appears as a code-table delta...
    st.insert((40 until 48).map(i => VectorRecord(s"f$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 8)
    val q = mkQueries(43L)
    val preRefresh = hitSet(st.searchBatchSq(q, k = 3, nProbe = 4, shortlist = 100))
    // ...which refresh encodes WITHOUT retraining or rewriting the tier
    assert(st.refreshPq() == 8)
    assert(st.refreshSq() == 8)
    assert(st.refreshSq() == 0, "second refresh must find nothing")
    // results are identical before and after (delta scan vs encoded codes
    // — full probe + exact rerank make both oracle-equal to exact)
    val postRefresh = hitSet(st.searchBatchSq(q, k = 3, nProbe = 4, shortlist = 100))
    val exact = hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4))
    assert(preRefresh == exact)
    assert(postRefresh == exact)
    val pq = hitSet(st.searchBatchPq(q, k = 3, nProbe = 4, shortlist = 100))
    assert(pq == exact)
  }

  test("code tiers serve cosine: oracle-equal to the exact cosine path") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_cos_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 50).map(i => VectorRecord(s"c$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 50)
    st.insert((50 until 56).map(i => VectorRecord(s"c$i", vec(i))))
    st.enableSq()
    st.enablePq(m = 4, kCodes = 8, trainSize = 50)
    val q = mkQueries(7L, 52L)
    // full probe + shortlist >= corpus: the exact rerank makes both code
    // tiers identical to the exact cosine scan, across BOTH store tiers
    val exact = hitSet(st.searchBatch(q, k = 5, metric = "cosine", nProbe = 4))
    val sq = hitSet(st.searchBatchSq(q, k = 5, nProbe = 4, shortlist = 100,
      metric = "cosine"))
    assert(sq == exact)
    val pq = hitSet(st.searchBatchPq(q, k = 5, nProbe = 4, shortlist = 100,
      metric = "cosine"))
    assert(pq == exact)
    // the single-query dispatcher accepts cosine on code tiers now...
    val one = st.searchMode(vec(7), k = 3, mode = "sq", metric = "cosine")
    assert(one.count() == 3)
    assert(one.orderBy(col("distance")).head().getString(0) == "c7")
    // ...but still rejects metrics the tier cannot rank
    val err = intercept[IllegalArgumentException] {
      st.searchMode(vec(7), k = 3, mode = "pq", metric = "dot")
    }
    assert(err.getMessage.contains("l2|cosine"))
  }

  test("BQ tier lifecycle: full-probe equality, tombstones, delta, refresh, vacuum") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_bqt_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 50).map(i => VectorRecord(s"b$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 50)
    st.insert((50 until 56).map(i => VectorRecord(s"b$i", vec(i))))
    st.enableBq()
    assert(st.hasBq)
    val q = mkQueries(7L, 52L)
    // full probe + shortlist >= corpus: every candidate is exact-reranked,
    // so the sign-bit tier returns exactly the exact path's top-k — for l2
    // AND cosine (the rerank carries the metric; hamming only shortlists)
    val exact = hitSet(st.searchBatch(q, k = 5, metric = "l2", nProbe = 4))
    assert(hitSet(st.searchBatchBq(q, k = 5, nProbe = 4, shortlist = 100)) == exact)
    val exactCos = hitSet(st.searchBatch(q, k = 5, metric = "cosine", nProbe = 4))
    assert(hitSet(st.searchBatchBq(q, k = 5, nProbe = 4, shortlist = 100,
      metric = "cosine")) == exactCos)

    // tombstones mask encoded rows
    st.delete(Seq("b7"))
    assert(!hitSet(st.searchBatchBq(q, k = 5, nProbe = 4, shortlist = 100))(7L)
      .exists(_._1 == "b7"))

    // post-encode migration surfaces via the historical delta scan, then
    // refreshBq appends exactly the delta (model-free) and nothing twice
    st.insert(Seq(VectorRecord("bLate", vec(7), tsString = Some(oldTs))))
    assert(st.migrate() == 1)
    assert(hitSet(st.searchBatchBq(q, k = 3, nProbe = 4, shortlist = 100))(7L)
      .exists(_._1 == "bLate"), "delta row must be searchable pre-refresh")
    assert(st.refreshBq() == 1)
    assert(st.refreshBq() == 0, "second refresh must find nothing")
    assert(hitSet(st.searchBatchBq(q, k = 3, nProbe = 4, shortlist = 100))(7L)
      .exists(_._1 == "bLate"), "refreshed row must stay searchable")

    // the single-query dispatcher routes mode=bq
    val one = st.searchMode(vec(8), k = 3, mode = "bq", metric = "l2")
    assert(one.orderBy(col("distance")).head().getString(0) == "b8")

    // vacuum invalidates the stale code table; re-enable is map-only
    st.vacuum()
    assert(!st.hasBq, "vacuum must drop the stale code table")
    st.enableBq()
    assert(hitSet(st.searchBatchBq(q, k = 3, nProbe = 4, shortlist = 100)) ==
      hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4)))
  }

  test("filtered code-tier search: oversampled post-filter matches the exact pre-filter path") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_fct_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 50).map(i =>
      VectorRecord(s"g$i", vec(i), Some(s"""{"grp": ${i % 2}}"""), Some(oldTs))))
    assert(st.migrate() == 50)
    st.insert((50 until 56).map(i =>
      VectorRecord(s"g$i", vec(i), Some(s"""{"grp": ${i % 2}}"""))))
    st.enableSq()
    st.enablePq(m = 4, kCodes = 8, trainSize = 50)
    val q = mkQueries(7L, 52L)
    val f = Some("""{"grp": 1}""")
    // with oversample sized past 1/selectivity the k*oversample candidate
    // set covers every matching row, so the post-filter agrees with
    // searchBatch's exact pre-filter (full probe + shortlist >= corpus +
    // exact rerank remove the other approximation sources)
    // shortlist deliberately SMALLER than k*oversample: the oversampled ask
    // must widen the shortlist floor, not be silently truncated by it
    val exact = hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4,
      filterJson = f))
    val sq = hitSet(st.searchBatchSq(q, k = 3, nProbe = 4, shortlist = 10,
      filterJson = f, oversample = 20))
    assert(sq == exact)
    val pq = hitSet(st.searchBatchPq(q, k = 3, nProbe = 4, shortlist = 10,
      filterJson = f, oversample = 20))
    assert(pq == exact)
    st.enableBq()
    val bq = hitSet(st.searchBatchBq(q, k = 3, nProbe = 4, shortlist = 10,
      filterJson = f, oversample = 20))
    assert(bq == exact)
    // the default k*3 oversample keeps reference semantics: every hit
    // matches the filter, rank-1 self-retrieval survives, but deep filtered
    // ranks MAY fall back to other tiers (documented recall trade-off)
    val sq3 = st.searchBatchSq(q, k = 3, nProbe = 4, shortlist = 100,
      filterJson = f)
    val ids = sq3.select("id").collect().map(_.getString(0))
    assert(ids.forall(id => id.stripPrefix("g").toInt % 2 == 1),
      s"non-matching hit in ${ids.mkString(",")}")
    assert(hitSet(sq3)(7L).exists(h => h._1 == "g7" && h._2 == 0.0))
    // a metadata overlay is visible to the post-filter: flip g7 out of grp 1
    st.updateMetadata("g7", """{"grp": 0}""")
    val sq2 = hitSet(st.searchBatchSq(q, k = 3, nProbe = 4, shortlist = 100,
      filterJson = f, oversample = 20))
    assert(!sq2.values.flatten.exists(_._1 == "g7"))
    assert(sq2 == hitSet(st.searchBatch(q, k = 3, metric = "l2", nProbe = 4,
      filterJson = f)))
  }

  test("SQ encode/decode round-trip stays within quantization error") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
    val enc = df.select(col("id"), col("embedding"),
      graft.operators.Sq.encode(col("embedding")).as("sq"))
    val dec = enc.select(col("id"), col("embedding"),
      graft.operators.Sq.decode(col("sq.codes"), col("sq.vmin"), col("sq.vmax")).as("back"))
    val rows = dec.collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](1); val back = r.getSeq[Float](2)
      assert(orig.length == back.length)
      // max error = half a quantization step = (vmax-vmin)/255/2 (range ~2)
      orig.zip(back).foreach { case (o, b) =>
        assert(math.abs(o - b) <= 2.0 / 255.0 / 2.0 + 1e-6,
          s"quantization error too large at id ${r.getLong(0)}: $o vs $b")
      }
    }
    // approximate distance agrees with exact distance within step-bound
    val q = vec(3)
    val withD = enc.select(col("id"),
      graft.functions.VectorExpressions.sqDequantL2(
        typedLit(q), col("sq.codes"), col("sq.vmin"), col("sq.vmax")).as("approx"),
      graft.functions.VectorExpressions.vecL2(
        typedLit(q), col("embedding")).as("exact"))
    withD.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.05,
        s"approx ${r.getDouble(1)} vs exact ${r.getDouble(2)}")
    }
  }
}
