package graft.streaming

import graft.SparkSpec
import graft.store.VectorStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(j => math.sin(seed * (j + 1)).toFloat)

  test("streaming ingest: dedup within stream, anti-join against store, append") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_stream_src_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString
    val storePath = Files.createTempDirectory("graft_stream_store_").toString
    val store = new VectorStore(spark, storePath)
    store.insert(Seq(VectorStore.VectorRecord("pre0", vec(999))))

    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val batch = (0 until 20).map(i => (s"s$i", vec(i), Some(s"""{"i": $i}"""), now)) ++
      Seq(("s5", vec(5), None, now), // dup within stream
        ("pre0", vec(999), None, now)) // dup against store
    batch.toDF("id", "embedding", "metadata", "ts")
      .coalesce(1).write.mode("overwrite").parquet(src)

    val q = Streaming.ingest(store, src, ckpt)
    q.processAllAvailable(); q.stop() // drain fully, never leak past the test
    assert(!q.isActive)

    assert(store.vectors.count() == 21) // pre0 + s0..s19, dups dropped
    assert(store.vectors.filter(col("id") === "s5").count() == 1)

    // second arrival file: only new ids land (checkpoint resumes)
    ((20 until 25).map(i => (s"s$i", vec(i), None, now)) :+ ("s3", vec(3), Option.empty[String], now))
      .toDF("id", "embedding", "metadata", "ts")
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = Streaming.ingest(store, src, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(store.vectors.count() == 26)
  }

  test("streaming ingest quarantines malformed rows instead of dying or storing poison") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_stream_q_src_").toString
    val ckpt = Files.createTempDirectory("graft_stream_q_ckpt_").toString
    val storePath = Files.createTempDirectory("graft_stream_q_store_").toString
    val store = new VectorStore(spark, storePath)
    store.insert(Seq(VectorStore.VectorRecord("pre0", vec(1))))

    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val batch = Seq(
      ("ok1", vec(2), Some("""{"k": 1}"""), now),
      ("badjson", vec(3), Some("{not json"), now), // would poison filtered reads
      ("baddim", Array(1.0f, 2.0f), Option.empty[String], now), // wrong dimension
      ("ok2", vec(4), None, now))
    batch.toDF("id", "embedding", "metadata", "ts")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val q = Streaming.ingest(store, src, ckpt)
    q.processAllAvailable(); q.stop()
    // good rows stored; bad rows quarantined WITH their reason, not lost
    assert(store.vectors.filter(col("id").isin("ok1", "ok2")).count() == 2)
    assert(store.vectors.filter(col("id").isin("badjson", "baddim")).count() == 0)
    val quarantined = spark.read.parquet(s"$storePath/quarantine")
      .select("id", "err").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(quarantined("badjson").contains("JSON"))
    assert(quarantined("baddim").contains("dimension"))
    // the store stays fully queryable with a metadata filter (the poison
    // this gate exists to keep out)
    assert(store.search(vec(2), k = 1,
      filterJson = Some("""{"k": 1}""")).count() == 1)
  }

  test("migration policy: per-run cap migrates oldest-first until drained") {
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft_mig_cap_").toString,
      VectorStore.Config(recentThresholdSeconds = 3600, nClusters = 2))
    val base = java.time.Instant.now().minusSeconds(7200)
    // 40 old rows with strictly increasing ts
    store.insert((0 until 40).map(i => VectorStore.VectorRecord(
      s"o$i", vec(i), tsString = Some(base.plusSeconds(i).toString))))
    store.insert(Seq(VectorStore.VectorRecord("fresh", vec(99))))
    val sched = new MigrationScheduler(store,
      MigrationPolicy(maxVectorsPerRun = 15, batchSize = 4))
    val r1 = sched.runMigration()
    assert((r1.vectorsMigrated, r1.batchesProcessed, r1.skippedQuietHours)
      == ((15L, 4L, false)))
    // oldest 15 (o0..o14) moved first
    assert(store.historical.filter(col("id") === "o0").count() == 1)
    assert(store.recent.filter(col("id") === "o14").count() == 0)
    assert(store.recent.filter(col("id") === "o15").count() == 1)
    val r2 = sched.runMigration()
    val r3 = sched.runMigration()
    assert(r2.vectorsMigrated == 15L && r3.vectorsMigrated == 10L)
    assert(r3.batchesProcessed == 3L) // ceil(10/4)
    assert(sched.runMigration().vectorsMigrated == 0L) // drained
    assert(store.recent.filter(col("id") =!= "fresh").count() == 0)
    assert(store.historical.count() == 40)
    val st = sched.statistics
    assert(st.totalVectorsMigrated == 40L && st.totalRuns == 4L)
    assert(math.abs(st.avgVectorsPerRun - 10.0) < 1e-9)
    // the reference's running duration average with its min-1ms floor
    // (maintenance.rs:394-407): positive after any run, never 0
    assert(st.avgDurationMs >= 1.0)
  }

  test("capped migrate keeps a live reinserted row that shares a vid with a tombstoned old row") {
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft_mig_vid_").toString,
      VectorStore.Config(recentThresholdSeconds = 3600, nClusters = 2))
    val oldTs = java.time.Instant.now().minusSeconds(7200)
    store.insert(Seq(
      VectorStore.VectorRecord("a", vec(1), tsString = Some(oldTs.toString)),
      VectorStore.VectorRecord("b", vec(2), tsString = Some(oldTs.plusSeconds(1).toString))))
    assert(store.delete(Seq("a")).deletedCount == 1)
    // resurrect: recent now holds TWO rows with vid(a) — tombstoned old + live new
    store.insert(Seq(VectorStore.VectorRecord("a", vec(3))))
    // capped run migrates the 2 oldest rows (dead a + b); the live a must stay
    val sched = new MigrationScheduler(store, MigrationPolicy(maxVectorsPerRun = 2))
    assert(sched.runMigration().vectorsMigrated == 2L)
    val live = store.vectors.select("id").collect().map(_.getString(0)).sorted
    assert(live.sameElements(Array("a", "b")), s"live=${live.mkString(",")}")
    val hit = store.search(vec(3), k = 1, metric = "l2").head()
    assert(hit.getString(0) == "a" && hit.getDouble(1) < 1e-6)
  }

  test("scheduled migration refreshes enabled code tiers with the migrated delta") {
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft_mig_rfr_").toString,
      VectorStore.Config(recentThresholdSeconds = 3600, nClusters = 2))
    val base = java.time.Instant.now().minusSeconds(7200)
    store.insert((0 until 20).map(i => VectorStore.VectorRecord(
      s"o$i", vec(i), tsString = Some(base.plusSeconds(i).toString))))
    val sched = new MigrationScheduler(store,
      MigrationPolicy(maxVectorsPerRun = 100))
    assert(sched.runMigration().vectorsMigrated == 20L)
    store.enableSq()
    store.buildRecentIndex(efConstruction = 60, m = 8)
    // a second wave ages in and migrates; the scheduler delta-encodes it
    store.insert((20 until 28).map(i => VectorStore.VectorRecord(
      s"o$i", vec(i), tsString = Some(base.plusSeconds(i).toString))))
    assert(sched.runMigration().vectorsMigrated == 8L)
    assert(store.refreshSq() == 0L,
      "scheduler already refreshed the code table — nothing left to encode")
    // migrate invalidated the recent index; the scheduler rebuilt it with
    // the persisted build params, so indexed serving never went dark
    assert(store.hasRecentIndex,
      "scheduler must rebuild the recent index it invalidated")
    assert(store.recentIndexBuildParams.contains((60, 8, "l2", 0, false)))
    // and with refresh disabled the delta stays un-encoded
    sched.policy = MigrationPolicy(maxVectorsPerRun = 100, refreshCodeTiers = false)
    store.insert((28 until 31).map(i => VectorStore.VectorRecord(
      s"o$i", vec(i), tsString = Some(base.plusSeconds(i).toString))))
    assert(sched.runMigration().vectorsMigrated == 3L)
    assert(store.refreshSq() == 3L)
  }

  test("auto-rebalance: skewed historical tier recovers on a scheduler tick") {
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft_mig_rb_").toString,
      VectorStore.Config(recentThresholdSeconds = 3600, nClusters = 3))
    val oldTs = java.time.Instant.now().minusSeconds(7200)
    // three well-separated blobs with deliberately skewed sizes 50/5/5:
    // k-means (k=3, fixed seed) recovers the blobs, so the big cluster is
    // 50 rows against a 20-row average — far over the 1.2x trigger
    def bvec(blob: Int, i: Int): Array[Float] =
      Array.tabulate(8)(j =>
        (if (j == blob) 10f else 0f) + (if (j == 3 + blob) i * 0.01f else 0f))
    val rows =
      (0 until 50).map(i => (s"r$i", bvec(0, i))) ++
      (50 until 55).map(i => (s"r$i", bvec(1, i))) ++
      (55 until 60).map(i => (s"r$i", bvec(2, i)))
    store.insert(rows.map { case (id, v) =>
      VectorStore.VectorRecord(id, v, tsString = Some(oldTs.toString)) })
    val sched = new MigrationScheduler(store, MigrationPolicy(
      maxVectorsPerRun = 100,
      autoRebalance = true, imbalanceThreshold = 1.2,
      minVectorsForRebalance = 10L))
    val r1 = sched.runMigration()
    assert(r1.vectorsMigrated == 60L)
    // the tick must have detected the 50-row cluster and moved its
    // overflow (cap = ceil(avg) = 20), recording it persistently
    assert(r1.vectorsRebalanced > 0, "skewed store but nothing rebalanced")
    assert(store.maintenanceStats.totalRebalances == 1L)
    assert(store.maintenanceStats.totalVectorsMoved == r1.vectorsRebalanced)
    val Some((total, avg, maxAfter)) = store.clusterImbalance()
    assert(total == 60L)
    assert(maxAfter < 50L, s"big cluster uncapped: max=$maxAfter avg=$avg")
    // the composition stayed whole: every row still findable through the
    // probed path (probe recall restored — moved rows live under their
    // second-nearest centroid, which full-probe search covers)
    val hit = store.search(bvec(0, 17), k = 1, metric = "l2").head()
    assert(hit.getString(0) == "r17" && hit.getDouble(1) < 1e-6)
    // and with a code tier enabled, a re-triggering tick re-encodes it
    // (rebalance DELETES the stale cluster-partitioned code table; a
    // scheduler that forgot the re-encode would leave hasSq false and the
    // searchBatchSq below would hard-fail)
    store.enableSq()
    store.enableOpq(m = 4, kCodes = 8, trainSize = 60, iters = 1)
    store.insert((100 until 140).map(i => VectorStore.VectorRecord(
      s"x$i", bvec(0, i), tsString = Some(oldTs.toString)))) // re-skew blob 0
    val r2 = sched.runMigration()
    assert(r2.vectorsMigrated == 40L)
    assert(r2.vectorsRebalanced > 0, "re-skewed store must re-trigger")
    assert(store.hasSq, "rebalance must not leave the SQ tier dark")
    assert(store.hasOpq, "rebalance must re-encode the OPQ tier from " +
      "its saved rotation (enableOpq(retrain = false))")
    val hit2 = store.searchBatchSq(
      spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(0L, bvec(0, 17).toSeq)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("q_embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType))))),
      k = 1).head()
    assert(hit2.getString(1) == "r17")
  }

  test("migration policy: quiet hours pause runs, including wrapping ranges") {
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft_mig_qh_").toString,
      VectorStore.Config(recentThresholdSeconds = 3600))
    // fixed row ts + fixed nowOverrides => fully deterministic eligibility
    store.insert(Seq(VectorStore.VectorRecord("x", vec(1),
      tsString = Some("2026-08-12T11:30:00Z"))))
    val sched = new MigrationScheduler(store,
      MigrationPolicy(quietHours = Seq((22, 2), (9, 11))))
    // end-exclusive + wrap-around semantics
    assert(sched.inQuietHours(22) && sched.inQuietHours(23)
      && sched.inQuietHours(0) && sched.inQuietHours(1))
    assert(!sched.inQuietHours(2) && !sched.inQuietHours(21))
    assert(sched.inQuietHours(9) && sched.inQuietHours(10) && !sched.inQuietHours(11))
    // a run at 10:30 UTC is skipped and does not count as a run
    val quietNow = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2026, 8, 12, 10, 30)
        .toInstant(java.time.ZoneOffset.UTC))
    val r = sched.runMigration(Some(quietNow))
    assert(r.skippedQuietHours && r.vectorsMigrated == 0L)
    assert(store.recent.count() == 1 && sched.statistics.totalRuns == 0L)
    // outside quiet hours the same row migrates
    val busyNow = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2026, 8, 12, 14, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val r2 = sched.runMigration(Some(busyNow))
    assert(!r2.skippedQuietHours && r2.vectorsMigrated == 1L)
    assert(sched.statistics.totalRuns == 1L)
  }

  test("streaming near-dup ingest: in-batch dedup, then reject dups of accepted corpus") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_nd_src_").toString
    val ckpt = Files.createTempDirectory("graft_nd_ckpt_").toString
    val acc = Files.createTempDirectory("graft_nd_acc_").toString + "/state"

    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // batch 1: two distinct docs + an in-batch near-dup of doc 1
    Seq(
      (1L, base),
      (2L, base + " with an extra tail phrase"), // near-dup of 1 (in-batch, dropped)
      (3L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(src)
    val q1 = Streaming.dedupIngest(spark, src, acc, ckpt, threshold = 0.5)
    q1.processAllAvailable(); q1.stop()
    val accepted1 = spark.read.parquet(s"$acc/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(accepted1 == Set(1L, 3L), s"got $accepted1")

    // batch 2: a near-dup of accepted doc 1 (rejected) + a fresh doc (kept)
    Seq(
      (4L, base + " slightly changed"),
      (5L, "another unrelated document mentioning vectors and embeddings")
    ).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    val q2 = Streaming.dedupIngest(spark, src, acc, ckpt, threshold = 0.5)
    q2.processAllAvailable(); q2.stop()
    val accepted2 = spark.read.parquet(s"$acc/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(accepted2 == Set(1L, 3L, 5L), s"got $accepted2")
    // every accepted doc carries its LSH band keys in the folded state
    // table (one key per band — the lookup index IS the state row)
    val bks = spark.read.parquet(s"$acc/docs").select("doc_id", "bks")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(bks.map(_._1).toSet == Set(1L, 3L, 5L))
    assert(bks.forall(_._2.length == 4), "4 bands -> 4 keys per doc")
  }

  test("oversized-drain fallback (no broadcasts) accepts the same set") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_big_src_").toString
    val ckpt = Files.createTempDirectory("graft_big_ckpt_").toString
    val acc = Files.createTempDirectory("graft_big_acc_").toString + "/state"
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (1L, base),
      (2L, base + " with an extra tail phrase"), // near-dup of 1
      (3L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(src)
    // broadcastDocLimit = 0 forces every batch down the shuffle-join path
    // (the plan an unbounded backlog drain takes); accepted set must be
    // IDENTICAL to the broadcast path's
    val q1 = Streaming.dedupIngest(spark, src, acc, ckpt, threshold = 0.5,
      broadcastDocLimit = 0L)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$acc/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // second batch exercises the accepted-state joins on the shuffle path
    Seq(
      (4L, base + " slightly changed"), // near-dup of accepted 1 -> rejected
      (5L, "another unrelated document mentioning vectors and embeddings")
    ).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    val q2 = Streaming.dedupIngest(spark, src, acc, ckpt, threshold = 0.5,
      broadcastDocLimit = 0L)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$acc/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
  }

  test("broadcast gate trips on estimated BYTES, not just rows") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_byte_src_").toString
    val ckpt = Files.createTempDirectory("graft_byte_ckpt_").toString
    val acc = Files.createTempDirectory("graft_byte_acc_").toString + "/state"
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (1L, base),
      (2L, base + " with an extra tail phrase"), // near-dup of 1
      (3L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(src)
    // few rows (well under the doc limit) but a zero BYTE budget: the gate
    // must still take the shuffle path — the hashed relations carry each
    // doc's full shingle-hash array, so a row-only limit under-counts the
    // broadcast footprint — and the accepted set must be identical
    val q = Streaming.dedupIngest(spark, src, acc, ckpt, threshold = 0.5,
      broadcastByteLimit = 0L)
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(s"$acc/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("streaming ingest quality/lang gates reject before hashing") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_gate_src_").toString
    val ckpt = Files.createTempDirectory("graft_gate_ckpt_").toString
    val acc = Files.createTempDirectory("graft_gate_acc_").toString + "/state"
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "1 2 3 4 5 6"), // zero alpha ratio -> fails the quality gate
      (3L, "zzz qqq www eee rrr ttt yyy uuu")  // no stopwords -> fails lang
    ).toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(src)
    val q = Streaming.dedupIngest(spark, src, acc, ckpt, threshold = 0.5,
      minQuality = Some(0.3), lang = Some("en"))
    q.processAllAvailable(); q.stop()
    val accepted = spark.read.parquet(s"$acc/docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(accepted == Set(1L), s"got $accepted")
  }

  test("accepted-state compaction bounds the file count over many batches") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_cmp_src_").toString
    val ckpt = Files.createTempDirectory("graft_cmp_ckpt_").toString
    val acc = Files.createTempDirectory("graft_cmp_acc_").toString + "/state"
    // 12 one-file arrivals, each a distinct doc -> 12 micro-batches at
    // maxFilesPerTrigger=1, each appending its own coalesced part set
    (0 until 12).foreach { i =>
      Seq((i.toLong, s"unique document number $i about topic ${"abcdefghijkl"(i)} " +
        s"with enough distinct words ${i * 17} ${i * 31} to avoid collisions"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    }
    val q = Streaming.dedupIngest(spark, src, acc, ckpt, threshold = 0.5,
      maxFilesPerTrigger = 1, compactEveryBatches = 4, compactMinFiles = 4)
    q.processAllAvailable(); q.stop()
    // all 12 docs accepted (no near-dups), and the periodic compaction
    // kept the state's file count bounded: without it, 12 batches x
    // >=2 coalesced files per append accrete >=24 parts
    val docs = spark.read.parquet(s"$acc/docs")
    assert(docs.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (0L until 12L).toSet)
    // bound derived from the SAME sizing the code uses (per-append and
    // compaction target = max(2, defaultParallelism/8)): last compaction
    // fires at batch 8, then at most 3 appends follow — a literal 16 here
    // only held on 32-core hosts
    val t = math.max(2, spark.sparkContext.defaultParallelism / 8)
    val bound = math.max(t, 4) + 3 * t
    val nFiles = Streaming.acceptedStateFileCount(spark, acc)
    assert(nFiles > 0 && nFiles <= bound, s"state accreted $nFiles part files (bound $bound)")
    // the band keys survive compaction (the lookup index IS the state row)
    assert(docs.select("bks").head().getSeq[Long](0).length == 4)
  }

  test("acceptedStateFileCount reads through mid-swap windows, never a false 0") {
    // the aside-window crash state (live renamed to _old, tmp complete but
    // not yet installed, marker present) used to read as 0 — a monitor
    // would see the state "vanish" mid-compaction. The probe now falls
    // back: marker present -> the committed _tmp count; no marker -> _old.
    val base = Files.createTempDirectory("graft_cnt_").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(dir: String, names: Int): Unit = (0 until names).foreach { i =>
      val p = new org.apache.hadoop.fs.Path(s"$base/$dir/part-$i.parquet")
      val out = fs.create(p, true)
      try out.write(Array[Byte](1, 2, 3)) finally out.close()
    }
    // live dir present: counted directly
    put("docs", 3)
    assert(Streaming.acceptedStateFileCount(spark, base) == 3)
    // aside-window crash: live gone, _old holds pre-swap, _tmp the
    // committed post-swap state, marker present -> report _tmp
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/docs"),
      new org.apache.hadoop.fs.Path(s"$base/docs_old"))
    put("docs_tmp", 2)
    fs.create(new org.apache.hadoop.fs.Path(s"$base/docs_swap.inprogress"), true).close()
    assert(Streaming.acceptedStateFileCount(spark, base) == 2)
    // markerless aside state (pre-marker-era crash): report the _old count
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/docs_swap.inprogress"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/docs_tmp"), true)
    assert(Streaming.acceptedStateFileCount(spark, base) == 3)
    // nothing at all -> 0
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/docs_old"), true)
    assert(Streaming.acceptedStateFileCount(spark, base) == 0)
  }

  test("windowed event-time aggregation with watermark over events stream") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val src = Files.createTempDirectory("graft_ev_src_").toString
    // batch-build from the real events table, replayed as a file stream
    graft.core.Tables.load(spark, sfDir, "events")
      .select("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(schema).parquet(src)
    val agg = Streaming.windowedEventCounts(stream, windowLen = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("ev_win")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // append mode emits only watermark-closed windows; verify against batch
    val got = spark.table("ev_win")
    val expected = graft.core.Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    val j = got.select(col("win_start"), col("event_type"), col("n"))
      .join(expected.select(col("window.start").as("win_start"), col("event_type"),
        col("n").as("n_exp")), Seq("win_start", "event_type"))
    assert(j.filter(col("n") =!= col("n_exp")).count() == 0)
  }
}
