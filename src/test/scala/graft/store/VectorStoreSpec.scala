package graft.store

import graft.SparkSpec
import graft.store.VectorStore._
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** An s3a-scheme FileSystem backed by local disk: lets specs exercise the
  * non-atomic-rename refusal path (graft.core.FsCapabilities keys off the
  * URI scheme) without a real object store. Top-level class — Hadoop
  * instantiates it reflectively via `fs.s3a.impl`. */
class FakeS3AFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
}

/** CRUD / lifecycle conformance (FIXTURES.md §4, mirroring the reference's
  * e2e Node tests: e2e-crud, vacuum, soft-deletion, schema/dimension
  * validation, persistence round-trip).
  */
class VectorStoreSpec extends SparkSpec {

  private def freshStore(): VectorStore = {
    val p = Files.createTempDirectory("graft_store_").toString
    new VectorStore(spark, p, Config(recentThresholdSeconds = 3600))
  }

  private def vec(seed: Int, dim: Int = 8): Array[Float] =
    Array.tabulate(dim)(j => math.sin(seed * (j + 1)).toFloat)

  test("insert batch + flagship search lifecycle") {
    val st = freshStore()
    val r = st.insert((0 until 50).map(i =>
      VectorRecord(s"doc$i", vec(i), Some(s"""{"category": "c${i % 3}", "rank": $i}"""))))
    assert((r.inserted, r.duplicates) == (50L, 0L) && r.insertedIds.sorted.length == 50)
    val hits = st.search(vec(7), k = 5).collect()
    assert(hits.length == 5)
    assert(hits.head.getString(0) == "doc7") // self-retrieval
    assert(hits.head.getDouble(1) < 1e-6)
    // results ordered ascending by distance
    assert(hits.map(_.getDouble(1)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("insertDF: distributed bulk ingest with the same checks as insert") {
    import spark.implicits._
    val st = freshStore()
    st.setSchema("""{"fields": {"rank": {"type": "number"}}, "required": ["rank"]}""")
    // 5K rows, multi-partition, within-batch dup (id repeats once)
    val big = spark.range(5000)
      .select(concat(lit("bulk"), (col("id") % 4999)).as("id"))
      .withColumn("seed", expr("CAST(substring(id, 5) AS INT)"))
      .withColumn("embedding",
        expr("transform(sequence(1, 8), j -> CAST(sin(seed * j) AS FLOAT))"))
      .withColumn("metadata", concat(lit("""{"rank": """), col("seed"), lit("}")))
      .drop("seed")
    val r = st.insertDF(big)
    assert((r.inserted, r.duplicates) == (4999L, 1L))
    assert(r.insertedIds.isEmpty) // by design: nothing batch-sized on the driver
    // overlap with live rows counts as duplicates, like insert()
    val r2 = st.insertDF(big.limit(10))
    assert((r2.inserted, r2.duplicates) == (0L, 10L))
    // searchable end-to-end
    val hit = st.search(vec(123), k = 1, metric = "l2").head()
    assert(hit.getString(0) == "bulk123" && hit.getDouble(1) < 1e-6)
    // dim mismatch, bad JSON, and schema violations all fail the batch
    intercept[IllegalArgumentException] {
      st.insertDF(Seq(("wide", Array.fill(9)(0.1f))).toDF("id", "embedding"))
    }
    intercept[IllegalArgumentException] {
      st.insertDF(Seq(("bad", vec(1), "{nope")).toDF("id", "embedding", "metadata"))
    }
    intercept[IllegalArgumentException] {
      st.insertDF(Seq(("noschema", vec(1), """{"other": 1}"""))
        .toDF("id", "embedding", "metadata"))
    }
    // failed batches wrote nothing
    assert(st.stats().recentCount == 4999L)
    // a failed FIRST batch must not poison a fresh store's manifest
    val st2 = freshStore()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mixedSchema = StructType(Seq(StructField("id", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val mixed = spark.createDataFrame(
      java.util.Arrays.asList(Row("good", vec(1).toSeq), Row("wide", Array.fill(9)(0.1f).toSeq)),
      mixedSchema)
    intercept[IllegalArgumentException] { st2.insertDF(mixed) }
    assert(st2.dimension.isEmpty) // no manifest written by the failed batch
    assert(st2.insertDF(Seq(("ok", vec(2))).toDF("id", "embedding")).inserted == 1L)
    assert(st2.dimension.contains(8))
  }

  test("duplicate insert rejected, dimension mismatch errors") {
    val st = freshStore()
    locally { val r1 = st.insert(Seq(VectorRecord("a", vec(1))))
      assert((r1.inserted, r1.duplicates, r1.insertedIds) == (1L, 0L, Seq("a"))) }
    locally { val r2 = st.insert(Seq(VectorRecord("a", vec(2)), VectorRecord("b", vec(3))))
      assert((r2.inserted, r2.duplicates, r2.insertedIds) == (1L, 1L, Seq("b"))) }
    intercept[IllegalArgumentException] {
      st.insert(Seq(VectorRecord("c", vec(1, dim = 4))))
    }
  }

  test("filtered search with metadata pre-filter") {
    val st = freshStore()
    st.insert((0 until 30).map(i =>
      VectorRecord(s"v$i", vec(i), Some(s"""{"category": "c${i % 3}", "rank": $i}"""))))
    val hits = st.search(vec(0), k = 10,
      filterJson = Some("""{"category": "c0", "rank": {"$lt": 15}}""")).collect()
    assert(hits.nonEmpty)
    val ids = hits.map(_.getString(0)).toSet
    assert(ids.subsetOf(Set("v0", "v3", "v6", "v9", "v12")))
  }

  test("soft delete by id excludes from search; re-insert resurrects") {
    val st = freshStore()
    st.insert((0 until 10).map(i => VectorRecord(s"d$i", vec(i))))
    val del = st.delete(Seq("d3", "d4", "nope"))
    assert(del.deletedCount == 2)
    assert(del.deletedIds.toSet == Set("d3", "d4"))
    assert(st.vectors.count() == 8)
    assert(!st.search(vec(3), k = 10).collect().map(_.getString(0)).contains("d3"))
    Thread.sleep(1100) // tombstone cut is timestamp-based at second granularity
    assert(st.insert(Seq(VectorRecord("d3", vec(3)))).insertedIds == Seq("d3"))
    assert(st.vectors.count() == 9)
  }

  test("deleteByMetadata with filter and with empty filter") {
    val st = freshStore()
    st.insert((0 until 12).map(i =>
      VectorRecord(s"m$i", vec(i), Some(s"""{"status": "${if (i < 4) "old" else "new"}"}"""))))
    val del = st.deleteByMetadata("""{"status": "old"}""")
    assert(del.deletedCount == 4)
    assert(del.deletedIds == Seq("m0", "m1", "m2", "m3"))
    assert(st.vectors.count() == 8)
    val all = st.deleteByMetadata("{}")
    assert(all.deletedCount == 8)
    assert(st.vectors.count() == 0)
  }

  test("updateMetadata full-replace, unknown id errors") {
    val st = freshStore()
    st.insert(Seq(VectorRecord("u1", vec(1), Some("""{"a": 1, "b": 2}"""))))
    st.updateMetadata("u1", """{"c": 3}""")
    val m = st.vectors.filter(col("id") === "u1").select("metadata").head().getString(0)
    assert(m == """{"c": 3}""") // full replace, not merge (session.rs:581-632)
    intercept[NoSuchElementException] { st.updateMetadata("ghost", "{}") }
  }

  test("schema validation on insert and update (F11)") {
    val st = freshStore()
    st.setSchema(
      """{"fields": {"title": {"type": "string"}, "views": {"type": "number"},
        |  "tags": {"type": "array", "items": {"type": "string"}}},
        | "required": ["title", "views"]}""".stripMargin)
    // valid
    st.insert(Seq(VectorRecord("ok", vec(1),
      Some("""{"title": "t", "views": 3, "tags": ["x"]}"""))))
    // missing required
    intercept[MetadataSchema.SchemaViolation] {
      st.insert(Seq(VectorRecord("bad1", vec(2), Some("""{"title": "t"}"""))))
    }
    // wrong scalar type
    intercept[MetadataSchema.SchemaViolation] {
      st.insert(Seq(VectorRecord("bad2", vec(3), Some("""{"title": "t", "views": "3"}"""))))
    }
    // bad array element
    intercept[MetadataSchema.SchemaViolation] {
      st.insert(Seq(VectorRecord("bad3", vec(4),
        Some("""{"title": "t", "views": 1, "tags": [1]}"""))))
    }
    // null always valid (schema.rs:68-71)
    st.insert(Seq(VectorRecord("ok2", vec(5),
      Some("""{"title": "t", "views": 2, "tags": null}"""))))
    // a null-valued required field earlier in the set must not shadow a
    // genuinely missing one later
    intercept[MetadataSchema.SchemaViolation] {
      st.insert(Seq(VectorRecord("bad4", vec(6), Some("""{"title": null}"""))))
    }
    // reference-exact (r10): with a schema set, metadata-LESS rows are a
    // violation even though no field is individually invalid — the
    // reference's validate requires an object unconditionally
    // (schema.rs:181-188; napi null metadata = Value::Null)
    intercept[MetadataSchema.SchemaViolation] {
      st.insert(Seq(VectorRecord("bad5", vec(7), None)))
    }
    val lax = freshStore() // no schema set: metadata-less inserts stay fine
    lax.insert(Seq(VectorRecord("nometa", vec(8), None)))
  }

  test("unparseable metadata is rejected at insert, not at first filtered read") {
    val st = freshStore()
    intercept[IllegalArgumentException] {
      st.insert(Seq(VectorRecord("bad", vec(1), Some("not json at all"))))
    }
    st.insert(Seq(VectorRecord("ok", vec(1), Some("""{"k": 1}"""))))
    intercept[IllegalArgumentException] { st.updateMetadata("ok", "{{nope") }
    // the store stays fully filterable
    assert(st.search(vec(1), k = 1, filterJson = Some("""{"k": 1}""")).count() == 1)
  }

  test("migration moves old rows to the cluster-partitioned historical tier") {
    val st = freshStore()
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 20).map(i => VectorRecord(s"old$i", vec(i), tsString = Some(oldTs))))
    st.insert((0 until 5).map(i => VectorRecord(s"new$i", vec(100 + i))))
    val moved = st.migrate()
    assert(moved == 20)
    val s = st.stats()
    assert(s.recentCount == 5 && s.historicalCount == 20)
    assert(st.historical.select("cluster_id").distinct().count() >= 1)
    // search still sees everything (X12 union)
    assert(st.search(vec(3), k = 30).count() == 25)
  }

  test("vacuum physically removes tombstoned rows and compacts overlays") {
    val st = freshStore()
    st.insert((0 until 10).map(i => VectorRecord(s"x$i", vec(i))))
    st.delete(Seq("x1", "x2"))
    st.updateMetadata("x5", """{"u": true}""")
    val vr = st.vacuum()
    assert(vr.recentRemoved == 2)
    assert(st.tombstones.count() == 0 && st.metaUpdates.count() == 0)
    assert(st.vectors.count() == 8)
    val m = st.vectors.filter(col("id") === "x5").select("metadata").head().getString(0)
    assert(m == """{"u": true}""") // overlay folded into the base
  }

  test("a crash inside swap() recovers at open; null embeddings reject with the id") {
    val path = java.nio.file.Files.createTempDirectory("graft_swaprec_").toString
    val st = new VectorStore(spark, path)
    st.insert((0 until 5).map(i => VectorStore.VectorRecord(s"r$i", vec(i))))
    // simulate dying between swap's delete and rename: live dir gone,
    // complete new tier stranded in _tmp
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/recent"),
      new org.apache.hadoop.fs.Path(s"$path/recent_tmp")))
    // a fresh open must finish the interrupted swap, not read an empty tier
    val reopened = new VectorStore(spark, path)
    assert(reopened.vectors.count() == 5)
    // a leftover _tmp NEXT TO an intact live dir WITHOUT a swap marker is
    // left untouched (it may be a CONCURRENT writer's in-flight rewrite —
    // deleting it would destroy that work); the live tier stays the truth
    reopened.recent.limit(1).write.mode("overwrite").parquet(s"$path/recent_tmp")
    val again = new VectorStore(spark, path)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/recent_tmp")))
    assert(again.vectors.count() == 5)
    // ... but WITH the marker the writer had committed (its _tmp was
    // complete), so open finishes the swap: _tmp replaces live
    again.recent.write.mode("overwrite").parquet(s"$path/recent_tmp")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "recent_swap.inprogress"), """{"swap": "recent"}""")
    val third = new VectorStore(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/recent_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/recent_swap.inprogress")))
    assert(third.vectors.count() == 5)
    val e = intercept[IllegalArgumentException] {
      third.insert(Seq(VectorStore.VectorRecord("bad", null)))
    }
    assert(e.getMessage.contains("id=bad") && e.getMessage.contains("null embedding"))
  }

  test("a live handle's READ recovers a stranded tier swap instead of seeing it empty") {
    // crash states used to be repaired only at OPEN; a long-lived handle
    // reading a tier stranded mid-swap (dir missing, marker live) would
    // silently serve an EMPTY tier — for tombstones that resurrects every
    // deleted row. Reads now run recovery when the dir looks missing.
    val st = freshStore()
    st.insert((0 until 5).map(i => VectorRecord(s"lr$i", vec(i))))
    val fs = new org.apache.hadoop.fs.Path(st.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"${st.path}/recent"),
      new org.apache.hadoop.fs.Path(s"${st.path}/recent_tmp")))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(st.path, "recent_swap.inprogress"), """{"swap": "recent"}""")
    // SAME handle, no reopen: the read must finish the swap and serve 5 rows
    assert(st.vectors.count() == 5)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${st.path}/recent_swap.inprogress")))
    // markerless complete-tmp (pre-marker-era crash shape): also adopted
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"${st.path}/recent"),
      new org.apache.hadoop.fs.Path(s"${st.path}/recent_tmp")))
    assert(st.vectors.count() == 5)
    // but a markerless INCOMPLETE tmp (no _SUCCESS: a live rewriter's
    // work-in-progress) is never adopted by a reader
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"${st.path}/recent"),
      new org.apache.hadoop.fs.Path(s"${st.path}/recent_tmp")))
    fs.delete(new org.apache.hadoop.fs.Path(s"${st.path}/recent_tmp/_SUCCESS"), false)
    assert(st.vectors.count() == 0) // tier legitimately unreadable mid-write
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"${st.path}/recent_tmp")))
  }

  test("a second writer fails loudly while the store's lease is held") {
    val st = freshStore()
    st.insert((0 until 5).map(i => VectorRecord(s"w$i", vec(i))))
    // simulate another live process mid-mutation: its lease file present
    // (fresh timestamp, foreign token) AND a swap marker in flight
    val fs = new org.apache.hadoop.fs.Path(st.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaseP = new org.apache.hadoop.fs.Path(st.path, "_writer.lease")
    val out = fs.create(leaseP, true)
    out.write(s"12345@otherhost\nforeign-token\n${System.currentTimeMillis()}\n"
      .getBytes("UTF-8"))
    out.close()
    st.recent.write.mode("overwrite").parquet(s"${st.path}/recent_tmp")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(st.path, "recent_swap.inprogress"), """{"swap": "recent"}""")
    // a second handle OPENS fine (readers are lock-free) but must not run
    // swap recovery under the live writer's feet...
    val second = new VectorStore(spark, st.path)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"${st.path}/recent_tmp")),
      "open-time recovery ran despite a live writer lease")
    // ...and every mutation fails loudly, naming the holder
    val e = intercept[graft.core.WriterLease.ConcurrentWriterException] {
      second.insert(Seq(VectorRecord("blocked", vec(99))))
    }
    assert(e.getMessage.contains("12345@otherhost"))
    // the "writer" dies: lease removed -> reopen recovers the swap and
    // mutations flow again (crud lifecycle unchanged)
    fs.delete(leaseP, false)
    val third = new VectorStore(spark, st.path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${st.path}/recent_tmp")))
    third.insert(Seq(VectorRecord("unblocked", vec(100))))
    assert(third.vectors.count() == 6)
    assert(!fs.exists(leaseP), "lease not released after mutation")
  }

  test("persistence round-trip: reopen from path preserves data and search") {
    val st = freshStore()
    st.insert((0 until 25).map(i => VectorRecord(s"p$i", vec(i), Some(s"""{"i": $i}"""))))
    st.delete(Seq("p9"))
    val before = st.search(vec(4), k = 5).collect().map(r => (r.getString(0), r.getDouble(1)))
    val reopened = new VectorStore(spark, st.path)
    assert(reopened.dimension.contains(8))
    assert(reopened.vectors.count() == 24)
    val after = reopened.search(vec(4), k = 5).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(before.sameElements(after))
  }

  test("manifest version gate: future rejected, too-old rejected, each by name") {
    // the reference's gate direction (chunk.rs:296-301): only version >
    // MANIFEST_VERSION is 'written by a newer engine'; below the oldest
    // readable layout is a distinct failure
    def tamper(st: VectorStore, v: Int): Unit = {
      Files.deleteIfExists(java.nio.file.Paths.get(st.path, ".manifest.json.crc"))
      Files.writeString(java.nio.file.Paths.get(st.path, "manifest.json"),
        s"""{"version": $v, "dim": 8}""")
    }
    val st = freshStore()
    st.insert(Seq(VectorRecord("a", vec(1))))
    tamper(st, 99)
    val eNew = intercept[IllegalStateException] {
      new VectorStore(spark, st.path).dimension }
    assert(eNew.getMessage.contains("newer engine"))
    tamper(st, VectorStore.MinFormatVersion - 1)
    val eOld = intercept[IllegalStateException] {
      new VectorStore(spark, st.path).dimension }
    assert(eOld.getMessage.contains("oldest readable"))
    // the current version still opens after the tampering round-trip
    tamper(st, VectorStore.FormatVersion)
    assert(new VectorStore(spark, st.path).dimension.contains(8))
  }

  test("open() restores the persisted config; constructor stays explicit") {
    val p = Files.createTempDirectory("graft_open_").toString
    // build with decidedly non-default knobs (load_index_chunked analog:
    // the constructor's config is the caller's)
    val built = new VectorStore(spark, p, Config(
      recentThresholdSeconds = 3600, nClusters = 7, nProbe = 3,
      chunkSize = 123, maxReturnedIds = 42, leaseTtlMs = 99000L))
    built.insert(Seq(VectorRecord("a", vec(1))))
    // load_index analog: a reopen restores the store AS CONFIGURED —
    // without it, the 1-hour-threshold store would silently serve 7-day
    // tier semantics under the default Config
    val reopened = VectorStore.open(spark, p)
    assert(reopened.config == built.config)
    assert(reopened.search(vec(1), k = 1).collect().head.getString(0) == "a")
    // explicit construction still overrides (the chunked-load path)
    assert(new VectorStore(spark, p).config.nClusters == 256)
    // no manifest = nothing to restore (MissingComponent analog)
    val empty = Files.createTempDirectory("graft_open_empty_").toString
    val e = intercept[IllegalStateException] { VectorStore.open(spark, empty) }
    assert(e.getMessage.contains("no manifest"))
    // open() gates the version EAGERLY and BEFORE construction — a
    // future-version store fails at open WITHOUT being touched: the
    // constructor's swap recovery must not finish a newer engine's
    // in-flight swap with this engine's logic
    Files.deleteIfExists(java.nio.file.Paths.get(p, ".manifest.json.crc"))
    Files.writeString(java.nio.file.Paths.get(p, "manifest.json"),
      """{"version": 99, "dim": 8}""")
    val marker = java.nio.file.Paths.get(p, "recent_swap.inprogress")
    Files.writeString(marker, "{}") // the newer engine's in-flight swap
    val eVer = intercept[IllegalStateException] { VectorStore.open(spark, p) }
    assert(eVer.getMessage.contains("newer engine"))
    assert(Files.exists(marker),
      "open() must not run recovery on a future-version store")
    Files.deleteIfExists(marker)
  }

  test("checkIntegrity: clean store complete; tampering and drift detected") {
    import spark.implicits._
    val st = freshStore()
    val oldTs = java.time.Instant.now().minusSeconds(7200)
    st.insert((0 until 20).map(i => VectorStore.VectorRecord(
      s"v$i", vec(i), tsString = Some(oldTs.plusSeconds(i).toString))))
    st.insert(Seq(VectorStore.VectorRecord("fresh", vec(99))))
    assert(st.migrate() == 20L)
    st.enableSq()
    val clean = st.checkIntegrity()
    assert(clean.isComplete && clean.hasManifest && clean.hasCentroids)
    assert(clean.liveRecent == 1L && clean.liveHistorical == 20L)
    assert(clean.codeTierDrift == Map("sq_codes" -> ((0L, 0L))))
    // natural drift: migrate MORE rows without refreshing the code tier
    // (the scheduler refreshes; a raw migrate() does not) — the sq tier
    // now misses the newly historical rows
    st.insert(Seq(VectorStore.VectorRecord("late", vec(50),
      tsString = Some(oldTs.toString))))
    assert(st.migrate() == 1L)
    val drifted = st.checkIntegrity()
    assert(!drifted.isComplete
      && drifted.codeTierDrift("sq_codes") == ((1L, 0L)))
    st.refreshSq()
    assert(st.checkIntegrity().isComplete)
    // a CROSS-tier duplicate (the state a scan racing migrate() between
    // its two swaps would observe) is reported separately and does NOT
    // flip isComplete — only within-tier duplication is a hard defect
    Seq(("v0", "vid_cross", vec(0), null.asInstanceOf[String],
        new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("id", "vid", "embedding", "metadata", "ts")
      .write.mode("append").parquet(st.path + "/recent")
    val crossed = st.checkIntegrity()
    assert(crossed.isComplete && crossed.duplicateIdCount == 0L
      && crossed.crossTierDuplicateCount == 1L)
    // out-of-band tampering: a wrong-dim row under a duplicated id,
    // appended straight into the tier dir past insert's validation
    Seq(("fresh", "vid_oob", Array(1.0f, 2.0f), null.asInstanceOf[String],
        new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("id", "vid", "embedding", "metadata", "ts")
      .write.mode("append").parquet(st.path + "/recent")
    val tampered = st.checkIntegrity()
    assert(!tampered.isComplete)
    assert(tampered.wrongDimCount == 1L && tampered.duplicateIdCount == 1L)
    assert(tampered.invalidClusterCount == 0L)
  }

  test("confirmTransients: persisting defects confirm; race artifacts clear; live writer defers") {
    import spark.implicits._
    val st = freshStore()
    val oldTs = java.time.Instant.now().minusSeconds(7200)
    st.insert((0 until 12).map(i => VectorRecord(s"w$i", vec(i),
      tsString = Some(oldTs.plusSeconds(i).toString))))
    assert(st.migrate() == 12L)
    st.insert((0 until 6).map(i => VectorRecord(s"f$i", vec(50 + i))))
    st.buildRecentIndex()
    val fs = new org.apache.hadoop.fs.Path(st.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(st.path, "recent"), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet") && f.getLen > 0)
          b += f.getPath.toString
      }
      b.result()
    }
    val covered = parts()
    // two PERSISTENT out-of-band defects wearing transient signatures:
    // a cross-tier duplicate (w0 planted into recent while live in
    // historical) and a covered recent part deleted under the index
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    Seq(("w0", "vid_conf_cross", vec(0), null.asInstanceOf[String], ts))
      .toDF("id", "vid", "embedding", "metadata", "ts")
      .coalesce(1).write.mode("append").parquet(st.path + "/recent")
    val plantParts = parts() -- covered // the plant's own part file(s)
    val victim = covered.toSeq.sorted.head
    fs.delete(new org.apache.hadoop.fs.Path(victim), false)
    // no live writer: the confirm pass runs and both defects persist
    // through the second observation — confirmed, while isComplete stays
    // ungated by the transient classes (unchanged contract)
    val r = st.checkIntegrity(confirmTransients = true)
    assert(r.crossTierDuplicateCount == 1L && r.recentIndexMissingParts == 1L)
    assert(r.transientsConfirmed, "confirm pass did not run on a quiet store")
    assert(r.confirmedCrossTierDuplicateCount == 1L,
      s"planted cross-tier dup not confirmed: $r")
    assert(r.confirmedRecentIndexMissingParts == 1L,
      s"planted missing part not confirmed: $r")
    assert(r.isComplete, "transient classes must stay non-gating")
    // without confirm: the sentinel, so a monitor can tell "not checked"
    val r0 = st.checkIntegrity()
    assert(!r0.transientsConfirmed
      && r0.confirmedCrossTierDuplicateCount == -1L
      && r0.confirmedRecentIndexMissingParts == -1L)
    // RACE CLEARS: pass 1 observed defects that a (simulated) completing
    // migrate/vacuum resolved before pass 2 — the plant removed, and a
    // pass-1 missing part that pass 2 no longer reports — confirm = 0 on
    // both, exactly the false-alarm the mechanism exists to absorb
    plantParts.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), false))
    val (ranClear, confCross, confMiss) = st.confirmTransientDefects(
      Seq("w0").toDF("id"), Some(Set("part-race-artifact.parquet")), 1000L)
    assert(ranClear && confCross == 0L,
      s"cleared cross-tier dup still confirmed: $confCross")
    assert(confMiss == 0L, s"cleared missing part still confirmed: $confMiss")
    // LIVE WRITER: the confirm pass refuses to conclude while maintenance
    // may be mid-window — bounded wait, then the could-not-confirm
    // sentinel (never a false confirmation)
    val other = new graft.core.WriterLease(fs,
      new org.apache.hadoop.fs.Path(st.path), ttlMs = 60000L)
    other.withLease {
      val (ran, c1, c2) = st.confirmTransientDefects(
        Seq("w0").toDF("id"), Some(Set("x")), maxWaitMs = 600L)
      assert(!ran && c1 == -1L && c2 == -1L,
        "confirm concluded under a live writer lease")
    }
  }

  test("integrity: saved-index part-list probe splits stale from missing") {
    import spark.implicits._
    val st = freshStore()
    st.insert((0 until 30).map(i => VectorRecord(s"p$i", vec(i))))
    // no index built: both probes are 0 and gate nothing
    val r0 = st.checkIntegrity()
    assert(r0.recentIndexStaleParts == 0L && r0.recentIndexMissingParts == 0L
      && r0.isComplete)
    st.buildRecentIndex()
    val r1 = st.checkIntegrity()
    assert(r1.recentIndexStaleParts == 0L && r1.recentIndexMissingParts == 0L
      && r1.isComplete)
    val fs = new org.apache.hadoop.fs.Path(st.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(st.path, "recent"), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet") && f.getLen > 0)
          b += f.getPath.toString
      }
      b.result()
    }
    val covered = parts()
    // out-of-band append AFTER the build: exactly one new part — STALE,
    // which is normal operation (the search-time delta scan serves it; a
    // big count is a rebuild hint), so is_complete still holds
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    Seq(("late", "vid_late", vec(99), null.asInstanceOf[String], ts))
      .toDF("id", "vid", "embedding", "metadata", "ts")
      .coalesce(1).write.mode("append").parquet(st.path + "/recent")
    val r2 = st.checkIntegrity()
    assert(r2.recentIndexStaleParts == 1L && r2.recentIndexMissingParts == 0L,
      s"stale=${r2.recentIndexStaleParts} missing=${r2.recentIndexMissingParts}")
    assert(r2.isComplete, "stale parts must not gate is_complete")
    // out-of-band DELETE of a covered part: the index's data table now
    // serves rows the tier no longer holds — reported as MISSING, but
    // (like cross_tier_duplicate_count) NOT gating is_complete: a
    // lease-free scan racing migrate()/vacuum() between tier swap and
    // index invalidation sees the same transient signature, so the
    // contract is alert-if-persists, not hard-fail
    fs.delete(new org.apache.hadoop.fs.Path(covered.toSeq.sorted.head), false)
    val r3 = st.checkIntegrity()
    assert(r3.recentIndexMissingParts == 1L && r3.isComplete,
      s"missing=${r3.recentIndexMissingParts} complete=${r3.isComplete}")
    // a pre-list-era index (meta.json without `files`) has UNKNOWN
    // coverage: both probes report the -1 sentinel — never 0 (a monitor
    // must distinguish verified-zero from could-not-verify) and never
    // "whole tier stale"
    val metaP = new org.apache.hadoop.fs.Path(st.path, "recent_index/meta.json")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val metaTxt = {
      val in = fs.open(metaP)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    def writeMeta(txt: String): Unit = {
      val out = fs.create(metaP, true)
      try out.write(txt.getBytes("UTF-8")) finally out.close()
    }
    val legacy = mapper.readTree(metaTxt)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    legacy.remove("files")
    writeMeta(legacy.toString)
    val r4 = st.checkIntegrity()
    assert(r4.recentIndexStaleParts == -1L && r4.recentIndexMissingParts == -1L,
      s"legacy meta: stale=${r4.recentIndexStaleParts} missing=${r4.recentIndexMissingParts}")
    // MALFORMED sidecars — non-array `files`, explicit null, non-object
    // root — are persistent defects, not benign legacy: the scan fails
    // LOUDLY on each (the search path deliberately degrades instead —
    // serving must survive what the admin scan flags)
    legacy.put("files", "corrupt")
    writeMeta(legacy.toString)
    val eMalformed = intercept[IllegalStateException] { st.checkIntegrity() }
    assert(eMalformed.getMessage.contains("malformed"))
    legacy.putNull("files")
    writeMeta(legacy.toString)
    intercept[IllegalStateException] { st.checkIntegrity() }
    writeMeta("[]") // valid JSON, wrong shape: corrupt, not pre-list-era
    intercept[IllegalStateException] { st.checkIntegrity() }
    // a meta.json that EXISTS but cannot be parsed is the same defect
    // class: loud, never a healthy 0/0
    writeMeta("{truncated")
    intercept[Exception] { st.checkIntegrity() }
    writeMeta(metaTxt) // restore the real sidecar: the EXACT pre-damage
    // verdict must come back (stale=1 from the late append, missing=1
    // from the deleted covered part) — a probe that cached the unknown
    // state or re-read a stale node would report 0s here
    val r6 = st.checkIntegrity()
    assert(r6.recentIndexStaleParts == 1L && r6.recentIndexMissingParts == 1L,
      s"restored meta: stale=${r6.recentIndexStaleParts} missing=${r6.recentIndexMissingParts}")
  }

  test("integrity: a corrupted code-tier part-list sidecar fails the scan loudly") {
    // without this surface, a malformed *_files.json silently degrades
    // every refresh/search delta to the full-tier anti-join FOREVER —
    // readPartList's safe serving fallback, with no operator signal
    val st = freshStore()
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 10).map(i => VectorRecord(s"c$i", vec(i),
      tsString = Some(oldTs))))
    st.migrate()
    st.enableSq()
    assert(st.checkIntegrity().isComplete)
    val fs = new org.apache.hadoop.fs.Path(st.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sc = new org.apache.hadoop.fs.Path(st.path, "sq_codes_files.json")
    val out = fs.create(sc, true)
    try out.write("""{"files": "corrupt"}""".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException] { st.checkIntegrity() }
    assert(e.getMessage.contains("sq_codes_files.json")
      && e.getMessage.contains("malformed"))
    // serving still works through the anti-join fallback — the scan
    // flags what search survives
    import spark.implicits._
    val q = Seq((0L, vec(1))).toDF("query_id", "q_embedding")
    assert(st.searchBatchSq(q, k = 1).count() == 1L)
  }

  test("mutations refuse non-atomic-rename filesystems unless opted in") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setClass("fs.s3a.impl", classOf[FakeS3AFileSystem],
      classOf[org.apache.hadoop.fs.FileSystem])
    hconf.setBoolean("fs.s3a.impl.disable.cache", true)
    try {
      val dir = Files.createTempDirectory("graft_fakes3_").toString
      val st = new VectorStore(spark, "s3a://" + dir)
      // the guard fires at the outermost lease acquire, BEFORE any write
      val e = intercept[IllegalStateException] {
        st.insert(Seq(VectorRecord("a", vec(1))))
      }
      assert(e.getMessage.contains("non-atomic object store")
        && e.getMessage.contains(graft.core.FsCapabilities.AllowNonAtomicKey))
      // reads were never refused: the store is openable and queryable
      assert(st.stats().recentCount == 0L)
      // explicit opt-in (external scheduler guarantees one writer):
      // mutations proceed — the lease itself still works on the fake FS
      hconf.setBoolean(graft.core.FsCapabilities.AllowNonAtomicKey, true)
      val st2 = new VectorStore(spark, "s3a://" + dir)
      val res = st2.vacuum()
      assert(res.recentRemoved == 0L && res.historicalRemoved == 0L)
    } finally {
      hconf.unset("fs.s3a.impl")
      hconf.unset("fs.s3a.impl.disable.cache")
      hconf.unset(graft.core.FsCapabilities.AllowNonAtomicKey)
    }
  }

  test("tiersSearched mirrors BOTH of searchBatch's historical preconditions") {
    import spark.implicits._
    val st = freshStore()
    val oldTs = java.time.Instant.now().minusSeconds(7200)
    st.insert((0 until 6).map(i => VectorStore.VectorRecord(
      s"t$i", vec(i), tsString = Some(oldTs.plusSeconds(i).toString))))
    assert(st.tiersSearched() == 1) // rows exist but none are historical yet
    st.migrate()
    assert(st.tiersSearched() == 2)
    // historical rows WITHOUT a readable centroid sidecar: searchBatch
    // skips the tier (its histPart gate), so it must not count — the
    // envelope otherwise claims an index was searched that the plan never
    // touched
    val fs = new org.apache.hadoop.fs.Path(st.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(st.path, "centroids"), true)
    assert(st.tiersSearched() == 1)
    // and the search path itself still serves (recent-only) — the two
    // stay consistent by construction
    val q = Seq((0L, vec(1))).toDF("query_id", "q_embedding")
    assert(st.searchBatch(q, k = 1).count() >= 0L)
  }

  test("checkHealth: the reference HealthMonitor's backlog/memory trips") {
    val st = freshStore()
    st.insert((0 until 5).map(i => VectorRecord(s"h$i", vec(i))))
    // under both thresholds: healthy, no issues, real tier flags
    val ok = st.checkHealth()
    assert(ok.status == "healthy" && ok.issues.isEmpty)
    assert(ok.migrationBacklog == 5L)
    assert(ok.recentIndexOk && ok.historicalIndexOk
      && ok.searchLatencyOk && ok.memoryUsageOk)
    // the reference's strict backlog > threshold trip with its issue
    // string (maintenance.rs:839-844): 5 > 4 warns, 5 > 5 does not
    val warn = st.checkHealth(migrationBacklogThreshold = 4L)
    assert(warn.status == "warning"
      && warn.issues == Seq("High migration backlog: 5"))
    assert(st.checkHealth(migrationBacklogThreshold = 5L).status == "healthy")
    // memory ok iff strictly under the threshold (maintenance.rs:846-851)
    val mem = st.checkHealth(memoryUsageThresholdBytes = 1L)
    assert(!mem.memoryUsageOk && mem.status == "warning"
      && mem.issues == Seq("Memory usage exceeds threshold"))
    // a stranded swap marker degrades the tier flag (real probe, not the
    // reference's hardcoded true)
    Files.writeString(
      java.nio.file.Paths.get(st.path, "recent_swap.inprogress"), "{}")
    val degraded = st.checkHealth()
    assert(!degraded.recentIndexOk && degraded.historicalIndexOk
      && degraded.status == "warning")
    // an unreadable tier is REPORTED, never thrown from the health check
    Files.deleteIfExists(java.nio.file.Paths.get(st.path, "recent_swap.inprogress"))
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(st.path, "recent")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.writeString(p, "not parquet"))
    val unreadable = st.checkHealth()
    assert(unreadable.status == "warning"
      && unreadable.issues.contains("Store tiers unreadable (stats failed)"))
  }
}
