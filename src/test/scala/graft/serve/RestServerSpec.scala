package graft.serve

import graft.SparkSpec
import graft.store.VectorStore
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

/** End-to-end HTTP conformance for the thin serving surface: the request/
  * response shapes of `/root/reference/src/api/rest.rs` driven through a
  * real socket against a live store. */
class RestServerSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def vecJson(seed: Int): String =
    (0 until 8).map(j => math.sin(seed * (j + 1)).toFloat).mkString("[", ",", "]")

  private def call(srv: RestServer, method: String, path: String,
      body: String = null): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.boundPort}$path"))
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m,
        if (body == null) BodyPublishers.noBody() else BodyPublishers.ofString(body))
    }).build()
    val res = client.send(req, BodyHandlers.ofString())
    (res.statusCode(), mapper.readTree(res.body()))
  }

  test("insert, get, search, delete, stats over HTTP") {
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rest_").toString)
    val bkBase = java.nio.file.Files.createTempDirectory("graft_rest_bk_").toString
    val srv = new RestServer(store, backupBase = Some(bkBase)).start()
    try {
      // health before any data
      val (hs, health) = call(srv, "GET", "/api/v1/health")
      assert(hs == 200 && health.get("status").asText() == "healthy")
      // reference HealthResponse envelope: version/storage/indices
      assert(health.get("version") != null)
      assert(health.get("storage").get("connected").asBoolean())
      assert(health.get("indices").get("hnsw").get("healthy").asBoolean())
      assert(health.get("indices").get("ivf").get("vector_count").asLong() == 0)

      // single insert -> 201 with recent-tier placement
      val (is, ins) = call(srv, "POST", "/api/v1/vectors",
        s"""{"id": "a", "vector": ${vecJson(1)}, "metadata": {"tag": "x"}}""")
      assert(is == 201 && ins.get("index").asText() == "recent")

      // duplicate -> 409
      val (ds, _) = call(srv, "POST", "/api/v1/vectors",
        s"""{"id": "a", "vector": ${vecJson(1)}}""")
      assert(ds == 409)

      // empty vector -> 400 (rest.rs validate_vector)
      val (bs, bad) = call(srv, "POST", "/api/v1/vectors",
        """{"id": "z", "vector": []}""")
      assert(bs == 400 && bad.get("error").asText().contains("empty"))

      // batch insert
      val batch = (2 until 10).map(i =>
        s"""{"id": "v$i", "vector": ${vecJson(i)}, "metadata": {"i": $i}}""")
        .mkString("""{"vectors": [""", ",", "]}")
      val (bs2, bres) = call(srv, "POST", "/api/v1/vectors/batch", batch)
      assert(bs2 == 200 && bres.get("inserted").asLong() == 8)
      // reference BatchInsertResponse envelope: successful/failed/errors
      assert(bres.get("successful").asLong() == 8)
      assert(bres.get("failed").asLong() == 0)
      assert(bres.get("errors").size() == 0)
      // re-sending one id: failed=1 with a per-id error entry
      val (bs3, bres2) = call(srv, "POST", "/api/v1/vectors/batch",
        s"""{"vectors": [{"id": "v2", "vector": ${vecJson(2)}}]}""")
      assert(bs3 == 200 && bres2.get("failed").asLong() == 1)
      assert(bres2.get("errors").get(0).get("id").asText() == "v2")

      // get by id
      val (gs, got) = call(srv, "GET", "/api/v1/vectors/v3")
      assert(gs == 200 && got.get("vector").size() == 8
        && got.get("metadata").get("i").asInt() == 3)
      assert(call(srv, "GET", "/api/v1/vectors/nope")._1 == 404)

      // search: nearest to v5's vector is v5 itself; metadata included
      val (ss, sr) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(5)}, "k": 3,
            "options": {"metric": "l2", "include_metadata": true}}""")
      assert(ss == 200)
      val top = sr.get("results").get(0)
      assert(top.get("id").asText() == "v5")
      assert(top.get("distance").asDouble() < 1e-6)
      assert(top.get("score").asDouble() > 0.999)
      assert(top.get("metadata").get("i").asInt() == 5)
      assert(sr.get("total_count").asInt() == 3)
      // reference SearchResponse envelope names. indices_searched counts
      // tiers ACTUALLY searched (rest.rs:638-669), not requested: both
      // tiers are requested by default, but everything lives in the
      // recent tier here — the absent historical tier must not count
      assert(sr.get("search_time_ms").asDouble() > 0.0)
      assert(sr.get("indices_searched").asInt() == 1)
      assert(!sr.get("partial_results").asBoolean())

      // reference SearchOptions request names (rest.rs:104-113): tier
      // selection — everything lives in the recent tier here, so
      // search_historical=false changes nothing and search_recent=false
      // finds nothing; probe-depth knobs are accepted
      val (t1s, t1) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(5)}, "k": 3,
            "options": {"metric": "l2", "search_historical": false,
                        "hnsw_ef": 64, "ivf_n_probe": 4, "timeout_ms": 500}}""")
      assert(t1s == 200)
      assert(t1.get("results").get(0).get("id").asText() == "v5")
      assert(t1.get("indices_searched").asInt() == 1)
      val (t2s, t2) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(5)}, "k": 3,
            "options": {"metric": "l2", "search_recent": false}}""")
      assert(t2s == 200 && t2.get("results").size() == 0)

      // include_vectors: the stored embedding payload round-trips
      // (session.rs:266-281); absent by default
      assert(top.get("vector") == null)
      val (vs2, vr) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(5)}, "k": 3,
            "options": {"metric": "l2", "include_vectors": true}}""")
      assert(vs2 == 200)
      val vtop = vr.get("results").get(0)
      assert(vtop.get("id").asText() == "v5")
      val expected = (0 until 8).map(j => math.sin(5 * (j + 1)).toFloat)
      val gotVec = (0 until 8).map(j => vtop.get("vector").get(j).floatValue())
      assert(vtop.get("vector").size() == 8 && gotVec == expected,
        s"vector payload mismatch: $gotVec vs $expected")

      // filtered search restricts the candidate set (F1 through HTTP)
      val (fs, fr) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(5)}, "k": 3, "filter": {"i": {"$$lte": 3}},
            "options": {"metric": "l2"}}""")
      assert(fs == 200)
      assert(fr.get("results").elements().hasNext)
      fr.get("results").forEach(h => assert(h.get("id").asText() != "v5"))

      // delete + 404 on re-delete
      assert(call(srv, "DELETE", "/api/v1/vectors/v3")._1 == 200)
      assert(call(srv, "DELETE", "/api/v1/vectors/v3")._1 == 404)

      // statistics reflect the lifecycle
      val (ts, st) = call(srv, "GET", "/api/v1/admin/statistics")
      assert(ts == 200)
      assert(st.get("recent_count").asLong() == 8) // 9 inserted - 1 deleted
      assert(st.get("dimension").asInt() == 8)
      // reference StatisticsResponse envelope: totals + on-disk bytes
      assert(st.get("total_vectors").asLong() == 8)
      assert(st.get("recent_vectors").asLong() == 8)
      assert(st.get("historical_vectors").asLong() == 0)
      assert(st.get("memory_usage").get("hnsw_bytes").asLong() > 0)
      assert(st.get("memory_usage").get("total_bytes").asLong() >=
        st.get("memory_usage").get("hnsw_bytes").asLong())

      // vacuum compacts the tombstone away
      val (vs, vac) = call(srv, "POST", "/api/v1/admin/vacuum")
      assert(vs == 200 && vac.get("recent_removed").asLong() == 1)

      // rebalance: no centroids yet -> moved 0; backup clones the store
      val (rs, rb) = call(srv, "POST", "/api/v1/admin/rebalance", "{}")
      assert(rs == 200 && rb.get("moved").asLong() == 0)
      // reference RebalanceResponse envelope names
      assert(rb.get("vectors_moved").asLong() == 0)
      assert(rb.get("clusters_modified").asLong() == 0)
      assert(call(srv, "POST", "/api/v1/admin/backup", "{}")._1 == 400)
      // targets resolve under backupBase; escapes are rejected
      assert(call(srv, "POST", "/api/v1/admin/backup",
        """{"target": "../evil"}""")._1 == 403)
      val (ks, bk) = call(srv, "POST", "/api/v1/admin/backup",
        """{"target": "c"}""")
      assert(ks == 200 && bk.get("bytes").asLong() > 0)
      assert(bk.get("target").asText().startsWith(bkBase))
      // reference BackupResponse envelope names (real values, not the
      // reference handler's TODO zeros)
      assert(bk.get("backup_size").asLong() == bk.get("bytes").asLong())
      assert(bk.get("vectors_backed_up").asLong() == 8)
      assert(bk.get("compression_ratio").asDouble() == 1.0)
    } finally srv.stop()
  }

  test("serving-index admin routes and mode search") {
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ridx_").toString,
      VectorStore.Config(recentThresholdSeconds = 3600, nClusters = 2))
    val srv = new RestServer(store).start()
    try {
      // old rows (will migrate to historical), plus fresh recent rows
      val oldTs = java.time.Instant.now().minusSeconds(7200).toString
      store.insert((0 until 30).map(i =>
        VectorStore.VectorRecord(s"h$i",
          (0 until 8).map(j => math.sin(i * (j + 1)).toFloat).toArray,
          tsString = Some(oldTs))))
      store.insert((30 until 40).map(i =>
        VectorStore.VectorRecord(s"h$i",
          (0 until 8).map(j => math.sin(i * (j + 1)).toFloat).toArray)))
      assert(call(srv, "POST", "/api/v1/admin/migrate")._1 == 200)

      // build all three serving artifacts over HTTP
      assert(call(srv, "POST", "/api/v1/admin/index/recent", "{}")._1 == 200)
      val (ps, pq) = call(srv, "POST", "/api/v1/admin/index/pq",
        """{"m": 4, "k_codes": 8, "train_size": 30}""")
      assert(ps == 200 && pq.get("enabled").asBoolean())
      assert(call(srv, "POST", "/api/v1/admin/index/sq", "{}")._1 == 200)
      assert(call(srv, "POST", "/api/v1/admin/index/bq", "{}")._1 == 200)
      val (os1, oq) = call(srv, "POST", "/api/v1/admin/index/opq",
        """{"m": 4, "k_codes": 8, "train_size": 30, "iters": 2}""")
      assert(os1 == 200 && oq.get("enabled").asBoolean(), oq.toString)
      // the refresh face: no delta yet -> refreshed with 0 encoded
      val (os2, or0) = call(srv, "POST", "/api/v1/admin/index/opq",
        """{"refresh": true}""")
      assert(os2 == 200 && or0.get("refreshed").asBoolean()
        && or0.get("encoded").asLong() == 0L, or0.toString)
      // a bare retrain (no m/k_codes) against an existing model must
      // keep the tier's OWN shape (m=4, 8 codes above) — following the
      // integrity warning's advice verbatim must never silently switch
      // the tier to the enableOpq defaults (m=8, 64 codes)
      val (os3, or1) = call(srv, "POST", "/api/v1/admin/index/opq",
        """{"retrain": true}""")
      assert(os3 == 200 && or1.get("shape_preserved").asBoolean(), or1.toString)
      val modelAfter = graft.operators.Opq.load(spark,
        store.path + "/opq_model")
      assert(modelAfter.pq.m == 4 && modelAfter.pq.k == 8,
        s"bare retrain changed the tier shape: m=${modelAfter.pq.m} " +
          s"k=${modelAfter.pq.k}")

      // every serving mode finds the exact row as its top hit, and serves
      // the STORED embedding payload on request (include_vectors is
      // uniform across modes — the code tiers return the exact vector
      // from the store, not a dequantized reconstruction)
      for (mode <- Seq("exact", "recent_index", "pq", "opq", "sq", "bq")) {
        val (ss, sr) = call(srv, "POST", "/api/v1/search",
          s"""{"vector": ${vecJson(33)}, "k": 3,
              "options": {"metric": "l2", "mode": "$mode",
                          "include_vectors": true}}""")
        assert(ss == 200, s"mode $mode failed: $sr")
        // with rows actually migrated, both tiers are searched and counted
        if (mode == "exact") assert(sr.get("indices_searched").asInt() == 2)
        assert(sr.get("results").get(0).get("id").asText() == "h33",
          s"mode $mode top hit: ${sr.get("results")}")
        assert(sr.get("results").get(0).get("distance").asDouble() < 1e-6)
        val v33 = sr.get("results").get(0).get("vector")
        assert(v33 != null && v33.size() == 8, s"mode $mode vector payload")
        (0 until 8).foreach(j => assert(
          v33.get(j).floatValue() == math.sin(33 * (j + 1)).toFloat,
          s"mode $mode vector[$j]"))
      }
      // historical row reachable through the code tiers too
      for (mode <- Seq("pq", "opq", "sq", "bq")) {
        val (_, sr) = call(srv, "POST", "/api/v1/search",
          s"""{"vector": ${vecJson(7)}, "k": 3,
              "options": {"metric": "l2", "mode": "$mode"}}""")
        assert(sr.get("results").get(0).get("id").asText() == "h7",
          s"mode $mode historical top hit: ${sr.get("results")}")
      }
      // the code tiers also serve the default metric (cosine) — the
      // common request shape needs no explicit metric override
      val (cosStatus, cosBody) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(7)}, "k": 3, "options": {"mode": "sq"}}""")
      assert(cosStatus == 200)
      assert(cosBody.get("results").get(0).get("id").asText() == "h7")
      // filters compose into the code tiers (k*3 oversample + post-filter);
      // no row here carries metadata, so a metadata filter matches nothing
      val (fs2, fr2) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(1)}, "filter": {"x": 1},
            "options": {"metric": "l2", "mode": "pq"}}""")
      assert(fs2 == 200 && fr2.get("results").size() == 0)
      // the oversample knob rides through: explicitly, or sized from a
      // selectivity estimate via Tuning.suggestOversample (1.5/selectivity).
      // The filter (empty $and = match-all, F4) makes filterJson defined so
      // the code tier actually takes the k*oversample post-filter path
      for (o <- Seq(""""oversample": 10""", """"selectivity": 0.15""")) {
        val (os, or) = call(srv, "POST", "/api/v1/search",
          s"""{"vector": ${vecJson(7)}, "k": 3, "filter": {"$$and": []},
              "options": {"metric": "l2", "mode": "sq", $o}}""")
        assert(os == 200, s"option $o failed: $or")
        assert(or.get("results").get(0).get("id").asText() == "h7")
      }
      // a zero/negative/non-integer oversample would silently empty the
      // quantized tier -> 400, matching the route's bad-option convention
      for (bad <- Seq(""""oversample": 0""", """"oversample": -2""",
          """"oversample": "ten"""", """"selectivity": "low"""",
          // selectivity is a kept-row FRACTION: 0/negative would silently
          // map to the oversample cap (a 33x more expensive search), >1 is
          // meaningless — all 400 like the oversample convention
          """"selectivity": 0""", """"selectivity": -0.5""",
          """"selectivity": 1.5""",
          // probe_blobs follows the oversample convention
          """"probe_blobs": 0""", """"probe_blobs": -3""",
          """"probe_blobs": "two"""")) {
        assert(call(srv, "POST", "/api/v1/search",
          s"""{"vector": ${vecJson(1)}, "options": {"mode": "sq", $bad}}""")._1 == 400,
          s"expected 400 for $bad")
      }
      // unknown mode -> 400; and a metric the code tier cannot rank
      // (dot) -> 400 instead of a silent misorder
      assert(call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(1)}, "options": {"mode": "warp"}}""")._1 == 400)
      assert(call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(1)}, "options": {"metric": "dot", "mode": "sq"}}""")._1 == 400)
    } finally srv.stop()
  }

  test("health surfaces swap/lease observability over a staged stranded marker") {
    val dir = java.nio.file.Files.createTempDirectory("graft_health_").toString
    val store = new VectorStore(spark, dir)
    store.initIfNeeded(8)
    val srv = new RestServer(store).start()
    try {
      val (s0, h0) = call(srv, "GET", "/api/v1/health")
      assert(s0 == 200 && h0.get("status").asText() == "healthy")
      assert(h0.get("graft").get("manifest_readable").asBoolean())
      assert(h0.get("graft").get("stranded_swap_markers").size() == 0)
      // stage a crash-stranded swap marker (what a writer that died right
      // after its marker write leaves behind); health must SHOW it — and
      // must not trigger recovery (pure reader)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(dir, "recent_swap.inprogress")
      fs.create(marker, true).close()
      val (s1, h1) = call(srv, "GET", "/api/v1/health")
      assert(s1 == 200)
      val marks = h1.get("graft").get("stranded_swap_markers")
      assert(marks.size() == 1 && marks.get(0).asText() == "recent",
        s"expected staged recent marker, got $h1")
      assert(!h1.get("indices").get("hnsw").get("healthy").asBoolean(),
        "recent tier with a stranded marker must not report healthy")
      assert(h1.get("indices").get("ivf").get("healthy").asBoolean())
      assert(fs.exists(marker), "health probe must not touch swap state")
      fs.delete(marker, false)
      // writer-lease visibility: holder + age are reported for a live lease
      val lease = new org.apache.hadoop.fs.Path(dir, "_writer.lease")
      val out = fs.create(lease, true)
      out.write(s"12345@otherhost\nsome-token\n${System.currentTimeMillis() - 2000}\n"
        .getBytes("UTF-8"))
      out.close()
      val (s2, h2) = call(srv, "GET", "/api/v1/health")
      assert(s2 == 200)
      assert(h2.get("graft").get("writer_lease_owner").asText() == "12345@otherhost")
      assert(h2.get("graft").get("writer_lease_age_ms").asLong() >= 2000)
      fs.delete(lease, false)
    } finally srv.stop()
  }

  test("admin integrity route reports the deep scan, drift included") {
    val dir = java.nio.file.Files.createTempDirectory("graft_integ_rest_").toString
    val store = new VectorStore(spark, dir,
      VectorStore.Config(recentThresholdSeconds = 3600, nClusters = 2))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    store.insert((0 until 10).map(i => VectorStore.VectorRecord(
      s"v$i", Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat),
      tsString = Some(oldTs))))
    store.migrate()
    store.enableSq()
    val srv = new RestServer(store).start()
    try {
      val (s0, r0) = call(srv, "GET", "/api/v1/admin/integrity")
      assert(s0 == 200 && r0.get("is_complete").asBoolean(), r0.toString)
      assert(r0.get("live_historical").asLong() == 10L)
      assert(r0.get("code_tier_drift").get("sq_codes").get("missing").asLong() == 0L)
      // no OPQ tier: the rotation-staleness probe serves its -1
      // "could not verify" sentinel, and no warning field phantoms in
      assert(r0.get("opq_rotation_mse_ratio").asDouble() == -1.0, r0.toString)
      assert(!r0.has("opq_rotation_warning"))
      // drift: a raw migrate() does not refresh code tiers
      store.insert(Seq(VectorStore.VectorRecord("late",
        Array.tabulate(8)(j => math.cos(j + 1).toFloat), tsString = Some(oldTs))))
      store.migrate()
      val (s1, r1) = call(srv, "GET", "/api/v1/admin/integrity")
      assert(s1 == 200 && !r1.get("is_complete").asBoolean())
      assert(r1.get("code_tier_drift").get("sq_codes").get("missing").asLong() == 1L)
      // without ?confirm=true the envelope carries the not-checked
      // sentinel, so a monitor can't mistake "unchecked" for "clean"
      assert(!r1.get("transients_confirmed").asBoolean())
      assert(r1.get("confirmed_cross_tier_duplicate_count").asLong() == -1L)
      // ?confirm=true: the confirm pass runs (quiet store — no live
      // writer), re-probes the transient classes, reports verified zeros;
      // confirm_wait_ms bounds the serial dispatcher's quiesce wait
      val (s2, r2) = call(srv, "GET",
        "/api/v1/admin/integrity?confirm=true&confirm_wait_ms=0")
      assert(s2 == 200 && r2.get("transients_confirmed").asBoolean(), r2.toString)
      assert(r2.get("confirmed_cross_tier_duplicate_count").asLong() == 0L)
      assert(r2.get("confirmed_recent_index_missing_parts").asLong() == 0L)
      // a malformed wait value must 400 loudly, never silently park the
      // serial dispatcher on the default
      val (sW, rW) = call(srv, "GET",
        "/api/v1/admin/integrity?confirm=true&confirm_wait_ms=5s")
      assert(sW == 400 && rW.get("error").asText().contains("confirm_wait_ms"))
      // TIMEOUT path: a live writer past the wait budget — the envelope
      // must carry could-not-confirm (false + the -1 sentinels), never a
      // false confirmation and never an error; the raw counts still serve
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val other = new graft.core.WriterLease(fs,
        new org.apache.hadoop.fs.Path(dir), ttlMs = 60000L)
      other.withLease {
        val (sT, rT) = call(srv, "GET",
          "/api/v1/admin/integrity?confirm=true&confirm_wait_ms=0")
        assert(sT == 200, rT.toString)
        assert(!rT.get("transients_confirmed").asBoolean(), rT.toString)
        assert(rT.get("confirmed_cross_tier_duplicate_count").asLong() == -1L)
        assert(rT.get("confirmed_recent_index_missing_parts").asLong() == -1L)
        assert(rT.get("code_tier_drift").get("sq_codes")
          .get("missing").asLong() == 1L, "raw scan must still serve")
      }
    } finally srv.stop()
  }

  test("admin frequent-items route serves the folded MG state via the locked read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fi_rest_").toString
    val store = new VectorStore(spark, dir)
    // unconfigured server: the route is disabled (backupBase posture)
    val srv0 = new RestServer(store).start()
    try {
      val (s404, r404) = call(srv0, "GET", "/api/v1/admin/frequent-items")
      assert(s404 == 404 && r404.get("error").asText().contains("not configured"))
    } finally srv0.stop()
    // configured: serve the folded state, counts ordered (cnt desc, item asc)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_fi_state_").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_fi_src_").toString + "/files"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_fi_ckpt_").toString
    import spark.implicits._
    Seq((1L, "alpha beta alpha gamma"), (2L, "alpha beta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(srcDir)
    val q = graft.streaming.StreamingHeavyHitters.ingest(
      spark, srcDir, stateDir, ckptDir, denominator = 2L, sketchK = 8)
    q.processAllAvailable(); q.stop()
    val srv = new RestServer(store,
      frequentItemsStateDir = Some(stateDir)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/frequent-items")
      assert(s == 200, r.toString)
      assert(!r.get("grouped").asBoolean())
      assert(r.get("k").asInt() == 8)
      assert(r.get("checkpoint").asText().endsWith(ckptDir))
      assert(r.get("last_batch_id").asLong() == 0L)
      assert(r.get("n").asLong() == 6L)
      assert(r.get("state_entries").asInt() == 3)
      assert(r.get("counts_are_mg_estimates").asBoolean())
      assert(r.get("counts").get("alpha").asLong() == 3L)
      val names = r.get("counts").fieldNames()
      assert(names.next() == "alpha") // cnt desc, item asc
      // empty state dir: a well-formed empty envelope, not an error
      val empty = java.nio.file.Files.createTempDirectory("graft_fi_empty_").toString
      val srv2 = new RestServer(store, frequentItemsStateDir = Some(empty)).start()
      try {
        val (s2, r2) = call(srv2, "GET", "/api/v1/admin/frequent-items")
        assert(s2 == 200 && r2.get("last_batch_id").asLong() == -1L
          && r2.get("state_entries").asInt() == 0)
      } finally srv2.stop()
      // a GROUPED fold's state dir serves the grouped envelope — it must
      // never render as an empty stream just because mg_state.json is
      // absent
      val gsd = java.nio.file.Files.createTempDirectory("graft_fi_gstate_").toString
      val gsrc = java.nio.file.Files.createTempDirectory("graft_fi_gsrc_").toString + "/files"
      // one null-source row: excluded from the fold (matches the batch
      // recount's inner-join semantics) but COUNTED for the envelope
      Seq((1L, "a", "alpha beta alpha"), (2L, "b", "gamma gamma"),
          (3L, null.asInstanceOf[String], "rotted rotted"))
        .toDF("doc_id", "source", "text").coalesce(1).write.parquet(gsrc)
      val gq = graft.streaming.StreamingGroupedHeavyHitters.ingest(
        spark, gsrc, gsd,
        java.nio.file.Files.createTempDirectory("graft_fi_gckpt_").toString,
        denominator = 2L, sketchK = 8)
      gq.processAllAvailable(); gq.stop()
      val srv3 = new RestServer(store, frequentItemsStateDir = Some(gsd)).start()
      try {
        val (s3, r3) = call(srv3, "GET", "/api/v1/admin/frequent-items")
        assert(s3 == 200, r3.toString)
        assert(r3.get("grouped").asBoolean())
        assert(r3.get("last_batch_id").asLong() == 0L)
        assert(r3.get("group_count").asInt() == 2)
        assert(r3.get("n").asLong() == 5L) // 3 tokens in a + 2 in b
        assert(r3.get("groups").get("a").get("counts").get("alpha").asLong() == 2L)
        assert(r3.get("groups").get("b").get("n").asLong() == 2L)
        // the excluded-null observability counter rides the envelope
        assert(r3.get("excluded_null_rows").asLong() == 1L, r3.toString)
      } finally srv3.stop()
    } finally srv.stop()
  }

  test("admin histogram route serves the folded exact-histogram state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hg_rest_").toString
    val store = new VectorStore(spark, dir)
    // unconfigured server: the route is disabled (backupBase posture)
    val srv0 = new RestServer(store).start()
    try {
      val (s404, r404) = call(srv0, "GET", "/api/v1/admin/histogram")
      assert(s404 == 404 && r404.get("error").asText().contains("not configured"))
    } finally srv0.stop()
    // configured + folded: serve binning, exact counts, rank-exact quantiles
    val stateDir = java.nio.file.Files.createTempDirectory("graft_hg_state_").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_hg_src_").toString + "/files"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_hg_ckpt_").toString
    import spark.implicits._
    // 8 in-range values + one under, one over — exact expectations
    (Seq(5.0, 15.0, 15.5, 25.0, 35.0, 45.0, 55.0, 95.0) ++ Seq(-1.0, 120.0))
      .toDF("value").coalesce(1).write.parquet(srcDir)
    val q = graft.streaming.StreamingHistogram.ingest(spark, srcDir,
      stateDir, ckptDir,
      graft.operators.HistogramSketch.HistogramSpec(0.0, 100.0, 10))
    q.processAllAvailable(); q.stop()
    val srv = new RestServer(store, histogramStateDir = Some(stateDir)).start()
    try {
      val (s, r) = call(srv, "GET",
        "/api/v1/admin/histogram?probs=0.5&bins=true")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean())
      assert(r.get("lo").asDouble() == 0.0 && r.get("hi").asDouble() == 100.0)
      assert(r.get("n_bins").asInt() == 10)
      assert(r.get("value_resolution").asDouble() == 10.0)
      assert(r.get("checkpoint").asText().endsWith(ckptDir))
      assert(r.get("n").asLong() == 10L)
      assert(r.get("underflow").asLong() == 1L)
      assert(r.get("overflow").asLong() == 1L)
      assert(r.get("counts_are_exact").asBoolean())
      // 2 of 10 values out of range -> fraction 0.2, past the default
      // 0.05 alert threshold: both the fraction and the loud warning ride
      assert(r.get("out_of_range_mass_fraction").asDouble() == 0.2, r.toString)
      assert(r.get("binning_warning").asText().contains("0.2000"), r.toString)
      assert(r.get("bins").get("1").asLong() == 2L) // 15.0, 15.5
      assert(r.get("bins").get("-1").asLong() == 1L)
      // p=0.5 over n=10: t=5.5; underflow(1)+bins0..2 cum: 1+1+2+1=5 <5.5;
      // bin 3 (25.0) holds t: frac=(5.5-5)/1 -> 30+10*0.5=35... bin of
      // 25.0 is 2 — recompute: bins: -1:1, 0:1(5.0), 1:2(15,15.5),
      // 2:1(25), 3:1(35), 4:1(45), 5:1(55), 9:1(95), 10:1. cum at bin 2 =
      // 1+1+2+1=5 < 5.5; bin 3 cnt 1 -> cum 6 >= 5.5; frac=0.5 -> est=35.0
      assert(r.get("quantiles").get("0.5").asDouble() == 35.0, r.toString)
      // default probes when none given
      val (sD, rD) = call(srv, "GET", "/api/v1/admin/histogram")
      assert(sD == 200 && rD.get("quantiles").has("0.9"), rD.toString)
      assert(!rD.has("bins"), "bins must be opt-in")
      // malformed probs must 400 loudly
      val (sB, rB) = call(srv, "GET", "/api/v1/admin/histogram?probs=0.5,x")
      assert(sB == 400 && rB.get("error").asText().contains("probs"))
      val (sR, rR) = call(srv, "GET", "/api/v1/admin/histogram?probs=1.5")
      assert(sR == 400 && rR.get("error").asText().contains("probs"))
    } finally srv.stop()
    // empty state dir: a well-formed empty envelope, not an error — and
    // no placeholder binning leaks into it
    val empty = java.nio.file.Files.createTempDirectory("graft_hg_empty_").toString
    val srv2 = new RestServer(store, histogramStateDir = Some(empty)).start()
    try {
      val (s2, r2) = call(srv2, "GET", "/api/v1/admin/histogram")
      assert(s2 == 200 && !r2.get("folded").asBoolean()
        && r2.get("last_batch_id").asLong() == -1L && !r2.has("lo"))
    } finally srv2.stop()
    // a GROUPED fold's state dir serves the grouped envelope — per-group
    // n/out-of-range/quantiles plus the excluded-null counter
    val gsd = java.nio.file.Files.createTempDirectory("graft_hg_gstate_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_hg_gsrc_").toString + "/files"
    Seq(("a", Some(10.0)), ("a", Some(30.0)), ("b", Some(90.0)),
        (null.asInstanceOf[String], Some(5.0)))
      .toDF("event_type", "value").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedHistogram.ingest(spark, gsrc,
      gsd, java.nio.file.Files.createTempDirectory("graft_hg_gckpt_").toString,
      graft.operators.HistogramSketch.HistogramSpec(0.0, 100.0, 10))
    gq.processAllAvailable(); gq.stop()
    val srv3 = new RestServer(store, histogramStateDir = Some(gsd)).start()
    try {
      val (s3, r3) = call(srv3, "GET", "/api/v1/admin/histogram?probs=0.5")
      assert(s3 == 200, r3.toString)
      assert(r3.get("folded").asBoolean() && r3.get("grouped").asBoolean())
      assert(r3.get("group_count").asInt() == 2)
      assert(r3.get("n").asLong() == 3L)
      assert(r3.get("excluded_null_rows").asLong() == 1L)
      // everything in range: fraction 0, no warning field
      assert(r3.get("out_of_range_mass_fraction").asDouble() == 0.0)
      assert(!r3.has("binning_warning"), r3.toString)
      assert(r3.get("groups").get("a").get("n").asLong() == 2L)
      // group a: values 10, 30 -> t = 1 + 1*0.5 = 1.5, bin 1 holds it
      // only if... cum: bin1(10.0)=1 <1.5, bin3(30.0): cum 2>=1.5,
      // frac=0.5 -> 30+10*0.5=35.0
      assert(r3.get("groups").get("a").get("quantiles").get("0.5")
        .asDouble() == 35.0, r3.toString)
      // group b: one value (90.0, bin 9): t=1, frac=1/1 -> the bin's
      // UPPER edge (the documented convention: frac=1 maps to the edge)
      assert(r3.get("groups").get("b").get("quantiles").get("0.5")
        .asDouble() == 100.0, r3.toString)
    } finally srv3.stop()
  }

  test("histogram envelope: degenerate states pinned; verify face parity") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_hgd_").toString)
    def fold(vals: Seq[Double], spec: graft.operators.HistogramSketch.HistogramSpec)
        : (String, String) = {
      val sd = java.nio.file.Files.createTempDirectory("graft_hgd_state_").toString
      val src = java.nio.file.Files.createTempDirectory("graft_hgd_src_").toString + "/files"
      val ck = java.nio.file.Files.createTempDirectory("graft_hgd_ckpt_").toString
      vals.toDF("value").coalesce(1).write.parquet(src)
      val q = graft.streaming.StreamingHistogram.ingest(spark, src, sd, ck, spec)
      q.processAllAvailable(); q.stop()
      (sd, src)
    }
    val s10 = graft.operators.HistogramSketch.HistogramSpec(0.0, 100.0, 10)

    // (1) all-underflow: estimates clamp to lo, fraction 1.0 + warning
    val (sdU, _) = fold(Seq(-5.0, -3.0), s10)
    val srvU = new RestServer(store, histogramStateDir = Some(sdU)).start()
    try {
      val (s, r) = call(srvU, "GET", "/api/v1/admin/histogram?probs=0.5,0.99")
      assert(s == 200 && r.get("n").asLong() == 2L)
      assert(r.get("underflow").asLong() == 2L && r.get("overflow").asLong() == 0L)
      assert(r.get("out_of_range_mass_fraction").asDouble() == 1.0)
      assert(r.has("binning_warning"), r.toString)
      assert(r.get("quantiles").get("0.5").asDouble() == 0.0, r.toString)
      assert(r.get("quantiles").get("0.99").asDouble() == 0.0)
    } finally srvU.stop()

    // (2) all-overflow: estimates clamp to hi, fraction 1.0 + warning
    val (sdO, _) = fold(Seq(150.0, 220.0), s10)
    val srvO = new RestServer(store, histogramStateDir = Some(sdO)).start()
    try {
      val (s, r) = call(srvO, "GET", "/api/v1/admin/histogram?probs=0.01,0.5")
      assert(s == 200 && r.get("overflow").asLong() == 2L)
      assert(r.get("out_of_range_mass_fraction").asDouble() == 1.0)
      assert(r.has("binning_warning"))
      assert(r.get("quantiles").get("0.01").asDouble() == 100.0, r.toString)
      assert(r.get("quantiles").get("0.5").asDouble() == 100.0)
    } finally srvO.stop()

    // (3) single-bin: interpolation inside the one bin, resolution = span
    val s1 = graft.operators.HistogramSketch.HistogramSpec(0.0, 10.0, 1)
    val (sd1, _) = fold(Seq(2.0, 4.0, 6.0), s1)
    val srv1 = new RestServer(store, histogramStateDir = Some(sd1)).start()
    try {
      val (s, r) = call(srv1, "GET", "/api/v1/admin/histogram?probs=0.5")
      assert(s == 200 && r.get("n_bins").asInt() == 1)
      assert(r.get("value_resolution").asDouble() == 10.0)
      assert(r.get("out_of_range_mass_fraction").asDouble() == 0.0
        && !r.has("binning_warning"))
      // t = 1 + 2*0.5 = 2 in bin 0 (cnt 3): est = 0 + 10 * (2/3)
      assert(math.abs(r.get("quantiles").get("0.5").asDouble() - 10.0 * 2 / 3)
        < 1e-9, r.toString)
    } finally srv1.stop()

    // (4) empty state: folded=false envelope carries NO quantiles object
    val empty = java.nio.file.Files.createTempDirectory("graft_hgd_e_").toString
    val srvE = new RestServer(store, histogramStateDir = Some(empty)).start()
    try {
      val (s, r) = call(srvE, "GET", "/api/v1/admin/histogram?probs=0.5")
      assert(s == 200 && !r.get("folded").asBoolean() && !r.has("quantiles"))
      assert(!r.has("out_of_range_mass_fraction"), r.toString)
    } finally srvE.stop()

    // ---- the verify face (flat) ----
    val (sdV, srcV) = fold(Seq(5.0, 15.0, 15.5, 25.0, -1.0, 120.0), s10)
    // not configured: 403 names the posture, not a silent skip
    val srvNoSrc = new RestServer(store, histogramStateDir = Some(sdV)).start()
    try {
      val (s, r) = call(srvNoSrc, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 403 && r.get("error").asText().contains("histogramSourceDir"))
    } finally srvNoSrc.stop()
    // empty state + verify: category error (the recount 409 rule)
    val srvE2 = new RestServer(store, histogramStateDir = Some(empty),
      histogramSourceDir = Some(srcV)).start()
    try {
      val (s, r) = call(srvE2, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 409 && r.get("error").asText().contains("no folded"), r.toString)
    } finally srvE2.stop()
    // quiesced stream over its own source: cell-for-cell parity
    val srvV = new RestServer(store, histogramStateDir = Some(sdV),
      histogramSourceDir = Some(srcV)).start()
    try {
      val (s, r) = call(srvV, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 200, r.toString)
      val v = r.get("verify")
      assert(v.get("matched").asBoolean(), r.toString)
      assert(v.get("recount_n").asLong() == 6L && v.get("state_n").asLong() == 6L)
      assert(v.get("mismatched_bin_count").asInt() == 0)
      // drift the source AFTER the fold (rows the state never saw):
      // the recount now disagrees and the face says so loudly
      Seq(55.0, 55.5).toDF("value").coalesce(1)
        .write.mode("append").parquet(srcV)
      val (s2, r2) = call(srvV, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s2 == 200, r2.toString)
      assert(!r2.get("verify").get("matched").asBoolean(), r2.toString)
      assert(r2.get("verify").get("mismatched_bin_count").asInt() == 1) // bin 5
      assert(r2.get("verify").get("recount_n").asLong() == 8L)
    } finally srvV.stop()

    // custom stream columns: the recount must read the SAME column the
    // ingest folded — histogramValueCol configures it (the r15 review
    // fix: a hardcoded "value" either 500s or recounts the wrong column)
    val sdC = java.nio.file.Files.createTempDirectory("graft_hgd_cs_").toString
    val srcC = java.nio.file.Files.createTempDirectory("graft_hgd_csrc_").toString + "/files"
    Seq(5.0, 15.0, 95.0).toDF("latency_ms").coalesce(1).write.parquet(srcC)
    val qc = graft.streaming.StreamingHistogram.ingest(spark, srcC, sdC,
      java.nio.file.Files.createTempDirectory("graft_hgd_cck_").toString,
      s10, valueCol = "latency_ms")
    qc.processAllAvailable(); qc.stop()
    val srvC = new RestServer(store, histogramStateDir = Some(sdC),
      histogramSourceDir = Some(srcC),
      histogramValueCol = "latency_ms").start()
    try {
      val (s, r) = call(srvC, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 200, r.toString)
      assert(r.get("verify").get("matched").asBoolean(), r.toString)
      assert(r.get("verify").get("recount_n").asLong() == 3L)
    } finally srvC.stop()

    // ---- the verify face (grouped) ----
    val gsd = java.nio.file.Files.createTempDirectory("graft_hgd_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_hgd_gsrc_").toString + "/files"
    Seq(("a", 10.0), ("a", 30.0), ("b", 90.0))
      .toDF("event_type", "value").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedHistogram.ingest(spark, gsrc,
      gsd, java.nio.file.Files.createTempDirectory("graft_hgd_gck_").toString, s10)
    gq.processAllAvailable(); gq.stop()
    val srvG = new RestServer(store, histogramStateDir = Some(gsd),
      histogramSourceDir = Some(gsrc)).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 200, r.toString)
      val v = r.get("verify")
      assert(v.get("matched").asBoolean(), r.toString)
      assert(v.get("mismatched_group_count").asInt() == 0)
      assert(v.get("recount_n").asLong() == 3L && v.get("state_n").asLong() == 3L)
      // a group the fold never saw appears in the source: named loudly
      Seq(("c", 50.0)).toDF("event_type", "value").coalesce(1)
        .write.mode("append").parquet(gsrc)
      val (s2, r2) = call(srvG, "GET", "/api/v1/admin/histogram?verify=true")
      val v2 = r2.get("verify")
      assert(s2 == 200 && !v2.get("matched").asBoolean(), r2.toString)
      assert(v2.get("mismatched_group_count").asInt() == 1)
      assert(v2.get("mismatched_groups").get(0).asText() == "c")
    } finally srvG.stop()
  }

  test("histogram verify: column validation, null-value counter, " +
      "cardinality bound") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_hgv_").toString)
    val s10 = graft.operators.HistogramSketch.HistogramSpec(0.0, 100.0, 10)

    // flat fold whose source carries NULL values: the fold and the
    // recount both exclude them (percentile convention) — the verify
    // face must COUNT the recount-side exclusions so a valueCol rotting
    // to NULL is visible even though the cells still match
    val sd = java.nio.file.Files.createTempDirectory("graft_hgv_s_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_hgv_src_").toString + "/files"
    Seq(Some(5.0), Some(15.0), None, None, Some(95.0))
      .toDF("value").coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingHistogram.ingest(spark, src, sd,
      java.nio.file.Files.createTempDirectory("graft_hgv_ck_").toString, s10)
    q.processAllAvailable(); q.stop()
    val srv = new RestServer(store, histogramStateDir = Some(sd),
      histogramSourceDir = Some(src)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 200, r.toString)
      val v = r.get("verify")
      assert(v.get("matched").asBoolean(), r.toString)
      assert(v.get("recount_n").asLong() == 3L)
      assert(v.get("recount_excluded_null_values").asLong() == 2L, r.toString)
    } finally srv.stop()

    // configured value column missing from the source schema: a
    // configuration-naming 422, not an AnalysisException-shaped 500
    val srvBadCol = new RestServer(store, histogramStateDir = Some(sd),
      histogramSourceDir = Some(src),
      histogramValueCol = "no_such_col").start()
    try {
      val (s, r) = call(srvBadCol, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 422, s"$s $r")
      assert(r.get("error").asText().contains("no_such_col"), r.toString)
      assert(r.get("error").asText().contains("histogramGroupCol") ||
        r.get("error").asText().contains("histogramValueCol"), r.toString)
    } finally srvBadCol.stop()

    // grouped fold, then the source's group column drifts toward per-row
    // cardinality: the recount collect is BOUNDED — past
    // (stateGroups + 16) x (nBins + 2) cells the face refuses with a
    // named error instead of pulling an unbounded relation into the
    // serving driver
    val gsd = java.nio.file.Files.createTempDirectory("graft_hgv_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_hgv_gsrc_").toString + "/files"
    Seq(("a", 10.0), ("a", 30.0)).toDF("event_type", "value")
      .coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedHistogram.ingest(spark, gsrc,
      gsd, java.nio.file.Files.createTempDirectory("graft_hgv_gck_").toString, s10)
    gq.processAllAvailable(); gq.stop()
    // cap for 1 state group = (1 + 16) x 12 = 204 cells; 300 one-row
    // groups overflow it
    (0 until 300).map(i => (s"g$i", 50.0)).toDF("event_type", "value")
      .coalesce(1).write.mode("append").parquet(gsrc)
    val srvG = new RestServer(store, histogramStateDir = Some(gsd),
      histogramSourceDir = Some(gsrc)).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/histogram?verify=true")
      assert(s == 200, r.toString)
      val v = r.get("verify")
      assert(!v.get("matched").asBoolean(), r.toString)
      assert(v.get("error").asText().contains("group cardinality"), r.toString)
      assert(!v.has("mismatched_groups"), r.toString) // compare skipped
    } finally srvG.stop()
  }

  test("admin sample route serves the folded bottom-k via the locked read") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_smp_rest_").toString)
    // unconfigured: disabled (backupBase posture)
    val srv0 = new RestServer(store).start()
    try {
      val (s404, r404) = call(srv0, "GET", "/api/v1/admin/sample")
      assert(s404 == 404 && r404.get("error").asText().contains("not configured"))
    } finally srv0.stop()
    // empty state dir: a well-formed empty envelope
    val empty = java.nio.file.Files.createTempDirectory("graft_smp_e_").toString
    val srvE = new RestServer(store, sampleStateDir = Some(empty)).start()
    try {
      val (s, r) = call(srvE, "GET", "/api/v1/admin/sample")
      assert(s == 200 && !r.get("folded").asBoolean() && !r.has("entries"))
    } finally srvE.stop()
    // folded: bindings + exact entries with carried values
    val sd = java.nio.file.Files.createTempDirectory("graft_smp_s_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_smp_src_").toString + "/files"
    (0L until 100L).map(i => (i, i * 2.0)).toDF("doc_id", "value")
      .coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingSample.ingest(spark, src, sd,
      java.nio.file.Files.createTempDirectory("graft_smp_ck_").toString,
      k = 16, valueCol = Some("value"))
    q.processAllAvailable(); q.stop()
    val srv = new RestServer(store, sampleStateDir = Some(sd)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/sample")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && r.get("k").asInt() == 16)
      assert(r.get("n_seen").asLong() == 100L)
      assert(r.get("sample_size").asInt() == 16)
      assert(r.get("entries_are_exact").asBoolean())
      assert(r.get("entries").size() == 16)
      // entries match the batch bottom-k bit-for-bit, values carried
      val expect = graft.streaming.StreamingSample.batchBottomK(
        spark.read.parquet(src), k = 16, valueCol = Some("value"))
      (0 until 16).foreach { i =>
        val e = r.get("entries").get(i)
        assert(e.get("id").asLong() == expect(i).id)
        assert(e.get("value").asDouble() == expect(i).value.get)
      }
      // a flat fold never serves the grouped shape, and a ?group ask
      // against it refuses rather than serving the whole flat sample as
      // if it were one stratum's
      assert(!r.get("grouped").asBoolean(), r.toString)
      val (sFg, rFg) = call(srv, "GET", "/api/v1/admin/sample?group=s0")
      assert(sFg == 404 && rFg.get("error").asText().contains("flat"), rFg.toString)
    } finally srv.stop()

    // grouped fold in its own state dir: the selection rule picks it up,
    // serves per-group samples, and ?group selects one
    val gsd = java.nio.file.Files.createTempDirectory("graft_smp_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_smp_gsrc_").toString + "/files"
    (0L until 100L).map(i => (s"s${i % 3}", i, i * 2.0))
      .toDF("source", "doc_id", "value").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedSample.ingest(spark, gsrc, gsd,
      java.nio.file.Files.createTempDirectory("graft_smp_gck_").toString,
      k = 4, valueCol = Some("value"))
    gq.processAllAvailable(); gq.stop()
    val srvG = new RestServer(store, sampleStateDir = Some(gsd)).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/sample")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && r.get("grouped").asBoolean())
      assert(r.get("group_count").asInt() == 3)
      assert(r.get("n_seen").asLong() == 100L)
      assert(r.get("excluded_null_rows").asLong() == 0L)
      // every group's entries match ITS batch bottom-k bit-for-bit
      val twin = graft.streaming.StreamingGroupedSample
        .batchBottomKPerGroup(spark.read.parquet(gsrc), k = 4,
          valueCol = Some("value"))
        .collect().groupBy(_.getString(0))
      (0 until 3).foreach { gi =>
        val g = s"s$gi"
        val gn = r.get("groups").get(g)
        assert(gn.get("sample_size").asInt() == 4, r.toString)
        val ids = (0 until 4).map(i => gn.get("entries").get(i).get("id").asLong())
        assert(ids.sorted == twin(g).map(_.getLong(2)).sorted.toSeq, g)
      }
      // ?group selection: one group only; unknown group is a 404
      val (s1, r1) = call(srvG, "GET", "/api/v1/admin/sample?group=s1")
      assert(s1 == 200 && r1.get("groups").size() == 1
        && r1.get("groups").has("s1"), r1.toString)
      val (s2, r2) = call(srvG, "GET", "/api/v1/admin/sample?group=nope")
      assert(s2 == 404 && r2.get("error").asText().contains("nope"), r2.toString)
      // verify without a configured source: the 403 posture
      val (sV0, rV0) = call(srvG, "GET", "/api/v1/admin/sample?verify=true")
      assert(sV0 == 403 && rV0.get("error").asText().contains("sampleSourceDir"))

      // from-sample binning over the grouped fold: 'group' required,
      // then the derived spec equals the offline fromSample over that
      // group's entries (the one-arithmetic rule)
      val (sFs0, rFs0) = call(srvG, "POST",
        "/api/v1/admin/histogram/from-sample", """{"n_bins": 4}""")
      assert(sFs0 == 400 && rFs0.get("error").asText().contains("GROUPED"),
        rFs0.toString)
      val (sFs, rFs) = call(srvG, "POST",
        "/api/v1/admin/histogram/from-sample",
        """{"n_bins": 4, "coverage": 1.0, "group": "s1"}""")
      assert(sFs == 200, rFs.toString)
      val gSt = graft.streaming.StreamingGroupedSample
        .readState(spark, gsd)
      val offline = graft.operators.HistogramSketch.fromSample(
        graft.streaming.StreamingGroupedSample.toDF(spark, gSt)
          .filter(org.apache.spark.sql.functions.col("group") === "s1"),
        "value", 4, coverage = 1.0, sampleSize = 1000)
      assert(rFs.get("lo").asDouble() == offline.lo, rFs.toString)
      assert(rFs.get("hi").asDouble() == offline.hi, rFs.toString)
      assert(rFs.get("n_bins").asInt() == 4)
      assert(rFs.get("sample_values").asInt() == 4)
    } finally srvG.stop()

    // from-sample over the FLAT fold + the refusal ladder
    val srvFs = new RestServer(store, sampleStateDir = Some(sd)).start()
    try {
      val (s, r) = call(srvFs, "POST",
        "/api/v1/admin/histogram/from-sample",
        """{"n_bins": 8, "coverage": 1.0}""")
      assert(s == 200, r.toString)
      val flatSt = graft.streaming.StreamingSample.readState(spark, sd)
      val offline = graft.operators.HistogramSketch.fromSample(
        graft.streaming.StreamingSample.toDF(spark, flatSt),
        "value", 8, coverage = 1.0, sampleSize = 1000)
      assert(r.get("lo").asDouble() == offline.lo, r.toString)
      assert(r.get("hi").asDouble() == offline.hi, r.toString)
      assert(r.get("value_resolution").asDouble() == offline.width)
      // malformed knobs 400 loudly
      val (sB, rB) = call(srvFs, "POST",
        "/api/v1/admin/histogram/from-sample", """{"n_bins": 0}""")
      assert(sB == 400 && rB.get("error").asText().contains("n_bins"))
      val (sC, rC) = call(srvFs, "POST",
        "/api/v1/admin/histogram/from-sample", """{"coverage": 1.5}""")
      assert(sC == 400 && rC.get("error").asText().contains("coverage"))
    } finally srvFs.stop()
    // unconfigured: 404; empty state: 409 (category error); no values: 422
    val srvFs0 = new RestServer(store).start()
    try {
      val (s, r) = call(srvFs0, "POST",
        "/api/v1/admin/histogram/from-sample", "{}")
      assert(s == 404 && r.get("error").asText().contains("not configured"))
    } finally srvFs0.stop()
    val srvFsE = new RestServer(store, sampleStateDir = Some(empty)).start()
    try {
      val (s, r) = call(srvFsE, "POST",
        "/api/v1/admin/histogram/from-sample", "{}")
      assert(s == 409 && r.get("error").asText().contains("no folded"), r.toString)
    } finally srvFsE.stop()
    val nvSd = java.nio.file.Files.createTempDirectory("graft_smp_nv_").toString
    val nvSrc = java.nio.file.Files.createTempDirectory("graft_smp_nvsrc_").toString + "/files"
    (0L until 20L).toDF("doc_id").coalesce(1).write.parquet(nvSrc)
    val nvQ = graft.streaming.StreamingSample.ingest(spark, nvSrc, nvSd,
      java.nio.file.Files.createTempDirectory("graft_smp_nvck_").toString, k = 8)
    nvQ.processAllAvailable(); nvQ.stop()
    val srvFsNv = new RestServer(store, sampleStateDir = Some(nvSd)).start()
    try {
      val (s, r) = call(srvFsNv, "POST",
        "/api/v1/admin/histogram/from-sample", "{}")
      assert(s == 422 && r.get("error").asText().contains("no finite values"),
        r.toString)
    } finally srvFsNv.stop()
  }

  test("sample verify face: recount parity, drift, value-col verdict, " +
      "grouped bound") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_smpv_").toString)
    val sd = java.nio.file.Files.createTempDirectory("graft_smpv_s_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_smpv_src_").toString + "/files"
    (0L until 100L).map(i => (i, i * 2.0)).toDF("doc_id", "value")
      .coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingSample.ingest(spark, src, sd,
      java.nio.file.Files.createTempDirectory("graft_smpv_ck_").toString,
      k = 16, valueCol = Some("value"))
    q.processAllAvailable(); q.stop()

    // quiesced stream over its own source: entry-for-entry parity
    val srv = new RestServer(store, sampleStateDir = Some(sd),
      sampleSourceDir = Some(src), sampleValueCol = Some("value")).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/sample?verify=true")
      assert(s == 200, r.toString)
      val v = r.get("verify")
      assert(v.get("matched").asBoolean(), r.toString)
      assert(v.get("ids_matched").asBoolean() && v.get("values_matched").asBoolean())
      assert(v.get("recount_size").asInt() == 16)
      // drift the source AFTER the fold: ids the state never saw now win
      // bottom slots and the face says so, naming some of them
      (100L until 300L).map(i => (i, i * 2.0)).toDF("doc_id", "value")
        .coalesce(1).write.mode("append").parquet(src)
      // deterministic precondition: the twin over the drifted source
      // really differs from the folded state
      val stNow = graft.streaming.StreamingSample.readState(spark, sd)
      val twinAfter = graft.streaming.StreamingSample.batchBottomK(
        spark.read.parquet(src), k = 16, valueCol = Some("value"))
      assert(twinAfter != stNow.entries, "drift failed to change the twin")
      val (s2, r2) = call(srv, "GET", "/api/v1/admin/sample?verify=true")
      assert(s2 == 200 && !r2.get("verify").get("matched").asBoolean(), r2.toString)
      assert(!r2.get("verify").get("ids_matched").asBoolean())
      assert(r2.get("verify").get("mismatched_ids").size() > 0)
    } finally srv.stop()

    // value-column misconfig: ids match, carried values don't — the
    // split verdict names the defect class (sampleValueCol = None while
    // the fold carried values)
    val srvNoVal = new RestServer(store, sampleStateDir = Some(sd),
      sampleSourceDir = Some(src)).start()
    try {
      // re-fold a fresh state over the CURRENT source so ids match
      val sd2 = java.nio.file.Files.createTempDirectory("graft_smpv_s2_").toString
      val q2 = graft.streaming.StreamingSample.ingest(spark, src, sd2,
        java.nio.file.Files.createTempDirectory("graft_smpv_ck2_").toString,
        k = 16, valueCol = Some("value"))
      q2.processAllAvailable(); q2.stop()
      val srv2 = new RestServer(store, sampleStateDir = Some(sd2),
        sampleSourceDir = Some(src)).start() // sampleValueCol = None
      try {
        val (s, r) = call(srv2, "GET", "/api/v1/admin/sample?verify=true")
        assert(s == 200, r.toString)
        val v = r.get("verify")
        assert(v.get("ids_matched").asBoolean(), r.toString)
        assert(!v.get("values_matched").asBoolean(), r.toString)
        assert(!v.get("matched").asBoolean())
      } finally srv2.stop()
      // missing configured id column: the 422 configuration-naming rule
      val srvBad = new RestServer(store, sampleStateDir = Some(sd2),
        sampleSourceDir = Some(src), sampleIdCol = "no_such").start()
      try {
        val (s, r) = call(srvBad, "GET", "/api/v1/admin/sample?verify=true")
        assert(s == 422 && r.get("error").asText().contains("no_such"), r.toString)
      } finally srvBad.stop()
    } finally srvNoVal.stop()

    // grouped: parity over a drained grouped fold, then the bounded
    // refusal when the source's group column drifts to wide cardinality
    val gsd = java.nio.file.Files.createTempDirectory("graft_smpv_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_smpv_gsrc_").toString + "/files"
    (0L until 90L).map(i => (s"g${i % 3}", i, i * 1.0))
      .toDF("source", "doc_id", "value").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedSample.ingest(spark, gsrc, gsd,
      java.nio.file.Files.createTempDirectory("graft_smpv_gck_").toString,
      k = 4, valueCol = Some("value"))
    gq.processAllAvailable(); gq.stop()
    val srvG = new RestServer(store, sampleStateDir = Some(gsd),
      sampleSourceDir = Some(gsrc), sampleValueCol = Some("value")).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/sample?verify=true")
      assert(s == 200, r.toString)
      val v = r.get("verify")
      assert(v.get("matched").asBoolean(), r.toString)
      assert(v.get("mismatched_group_count").asInt() == 0)
      assert(v.get("recount_group_count").asInt() == 3)
      // cap for 3 state groups at k=4 = (3+16)*4 = 76 recount rows; 100
      // new one-row groups push past it -> loud refusal, compare skipped
      (0 until 100).map(i => (s"w$i", 1000L + i, 1.0))
        .toDF("source", "doc_id", "value")
        .coalesce(1).write.mode("append").parquet(gsrc)
      val (s2, r2) = call(srvG, "GET", "/api/v1/admin/sample?verify=true")
      assert(s2 == 200, r2.toString)
      val v2 = r2.get("verify")
      assert(!v2.get("matched").asBoolean(), r2.toString)
      assert(v2.get("error").asText().contains("group cardinality"), r2.toString)
      assert(!v2.has("mismatched_groups"))
    } finally srvG.stop()
  }

  test("admin frequent-items recount serves the EXACT face of the folded state") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_fir_").toString)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_fir_state_").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_fir_src_").toString + "/files"
    Seq((1L, "alpha beta alpha gamma"), (2L, "alpha beta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(srcDir)
    val q = graft.streaming.StreamingHeavyHitters.ingest(spark, srcDir,
      stateDir, java.nio.file.Files.createTempDirectory("graft_fir_ck_").toString,
      denominator = 2L, sketchK = 8)
    q.processAllAvailable(); q.stop()
    // state wired but no source corpus: the recount is a Spark job over
    // an operator-configured path — client-supplied paths are refused by
    // construction (the backupBase posture), so the route is disabled
    val srvNoSrc = new RestServer(store,
      frequentItemsStateDir = Some(stateDir)).start()
    try {
      val (s403, r403) = call(srvNoSrc, "POST",
        "/api/v1/admin/frequent-items/recount", """{"denominator": 2}""")
      assert(s403 == 403
        && r403.get("error").asText().contains("frequentItemsSourceDir"))
    } finally srvNoSrc.stop()
    // fully configured, FLAT state: exact counts at the asked threshold
    val srv = new RestServer(store, frequentItemsStateDir = Some(stateDir),
      frequentItemsSourceDir = Some(srcDir)).start()
    try {
      val (s, r) = call(srv, "POST",
        "/api/v1/admin/frequent-items/recount", """{"denominator": 2}""")
      assert(s == 200, r.toString)
      assert(!r.get("grouped").asBoolean())
      assert(r.get("counts_are_exact").asBoolean())
      assert(r.get("n").asLong() == 6L)
      // N=6, denom=2 -> minCount 3: alpha (3) qualifies, beta (2) doesn't
      assert(r.get("counts").size() == 1
        && r.get("counts").get("alpha").asLong() == 3L, r.toString)
      // no denominator -> 400; a threshold the folded k can't cover -> 400
      // through the operator's own loud exactness guard
      assert(call(srv, "POST",
        "/api/v1/admin/frequent-items/recount", "{}")._1 == 400)
      val (sCov, rCov) = call(srv, "POST",
        "/api/v1/admin/frequent-items/recount", """{"denominator": 500}""")
      assert(sCov == 400 && rCov.get("error").asText().contains("does not cover"))
      // zero / negative / non-numeric denominators invert or nuke the
      // threshold arithmetic — each must 400, never a 200 "exact" answer
      // (Jackson coerces a string to 0, so "abc" rides the zero check)
      for (bad <- Seq("0", "-1", "\"abc\"")) {
        val (sb, rb) = call(srv, "POST",
          "/api/v1/admin/frequent-items/recount", s"""{"denominator": $bad}""")
        assert(sb == 400 && rb.get("error").asText().contains("positive"),
          s"denominator=$bad -> $sb ${rb.toString}")
      }
    } finally srv.stop()
    // GROUPED state: per-group thresholds, exact counts, the null counter
    val gsd = java.nio.file.Files.createTempDirectory("graft_fir_gstate_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_fir_gsrc_").toString + "/files"
    Seq((1L, "a", "alpha beta alpha"), (2L, "b", "gamma gamma"),
        (3L, null.asInstanceOf[String], "rotted"))
      .toDF("doc_id", "source", "text").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedHeavyHitters.ingest(spark, gsrc,
      gsd, java.nio.file.Files.createTempDirectory("graft_fir_gck_").toString,
      denominator = 2L, sketchK = 8)
    gq.processAllAvailable(); gq.stop()
    val gsrv = new RestServer(store, frequentItemsStateDir = Some(gsd),
      frequentItemsSourceDir = Some(gsrc)).start()
    try {
      val (sg, rg) = call(gsrv, "POST",
        "/api/v1/admin/frequent-items/recount", """{"denominator": 2}""")
      assert(sg == 200, rg.toString)
      assert(rg.get("grouped").asBoolean() && rg.get("counts_are_exact").asBoolean())
      // a: n=3, min=2 -> alpha(2); b: n=2, min=1 -> gamma(2)
      assert(rg.get("groups").get("a").get("alpha").asLong() == 2L, rg.toString)
      assert(rg.get("groups").get("b").get("gamma").asLong() == 2L)
      assert(rg.get("excluded_null_rows").asLong() == 1L)
    } finally gsrv.stop()
    // an EMPTY state dir is a category error for a recount (409), never
    // an empty "no heavy hitters" answer
    val empty = java.nio.file.Files.createTempDirectory("graft_fir_empty_").toString
    val esrv = new RestServer(store, frequentItemsStateDir = Some(empty),
      frequentItemsSourceDir = Some(srcDir)).start()
    try {
      val (se, re) = call(esrv, "POST",
        "/api/v1/admin/frequent-items/recount", """{"denominator": 2}""")
      assert(se == 409 && re.get("error").asText().contains("no folded"))
    } finally esrv.stop()
  }

  test("query cache memoizes repeats and mutations invalidate it") {
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_qc_").toString)
    val srv = new RestServer(store).start()
    try {
      (0 until 6).foreach { i =>
        assert(call(srv, "POST", "/api/v1/vectors",
          s"""{"id": "c$i", "vector": ${vecJson(i)}}""")._1 == 201)
      }
      // no backupBase configured on this server -> backup route is disabled
      assert(call(srv, "POST", "/api/v1/admin/backup",
        """{"target": "x"}""")._1 == 403)
      val q = s"""{"vector": ${vecJson(2)}, "k": 2, "options": {"metric": "l2"}}"""
      val (_, first) = call(srv, "POST", "/api/v1/search", q)
      assert(!first.has("cached"))
      val (_, second) = call(srv, "POST", "/api/v1/search", q)
      assert(second.get("cached").asBoolean())
      assert(second.get("results").get(0).get("id").asText() == "c2")
      // deleting the top hit invalidates: fresh search no longer returns it
      assert(call(srv, "DELETE", "/api/v1/vectors/c2")._1 == 200)
      val (_, third) = call(srv, "POST", "/api/v1/search", q)
      assert(!third.has("cached"))
      assert(third.get("results").get(0).get("id").asText() != "c2")
      val (_, st) = call(srv, "GET", "/api/v1/admin/statistics")
      assert(st.get("cache_hits").asLong() == 1 && st.get("cache_misses").asLong() == 2)

      // change feed: sequenced insert/delete events, resumable via ?since=
      val (us, upd) = call(srv, "GET", "/api/v1/updates")
      assert(us == 200 && upd.get("latest_seq").asLong() == 7) // 6 inserts + 1 delete
      val types = (0 until upd.get("events").size())
        .map(i => upd.get("events").get(i).get("type").asText())
      assert(types.count(_ == "insert") == 6 && types.count(_ == "delete") == 1)
      val (_, tail) = call(srv, "GET", "/api/v1/updates?since=6")
      assert(tail.get("events").size() == 1
        && tail.get("events").get(0).get("type").asText() == "delete"
        && tail.get("events").get(0).get("id").asText() == "c2")
    } finally srv.stop()
  }

  test("SSE update stream: backlog replay then live events over a held connection") {
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_sse_").toString)
    val srv = new RestServer(store).start()
    try {
      // one event already in the ring before the stream opens
      assert(call(srv, "POST", "/api/v1/vectors",
        s"""{"id": "s1", "vector": ${vecJson(1)}}""")._1 == 201)
      val req = HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${srv.boundPort}/api/v1/updates/stream?since=0")).GET().build()
      val res = client.send(req, BodyHandlers.ofInputStream())
      assert(res.statusCode() == 200)
      assert(res.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/event-stream"))
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(res.body(), java.nio.charset.StandardCharsets.UTF_8))
      def nextEvent(): com.fasterxml.jackson.databind.JsonNode = {
        var line = reader.readLine()
        while (line != null && !line.startsWith("data: ")) line = reader.readLine()
        assert(line != null, "stream closed before an event arrived")
        mapper.readTree(line.drop(6))
      }
      // backlog: the pre-subscription insert replays first
      val e1 = nextEvent()
      assert(e1.get("type").asText() == "insert" && e1.get("id").asText() == "s1")
      // two live mutations arrive over the SAME held connection, in order
      assert(call(srv, "POST", "/api/v1/vectors",
        s"""{"id": "s2", "vector": ${vecJson(2)}}""")._1 == 201)
      assert(call(srv, "DELETE", "/api/v1/vectors/s1")._1 == 200)
      val e2 = nextEvent()
      assert(e2.get("type").asText() == "insert" && e2.get("id").asText() == "s2")
      val e3 = nextEvent()
      assert(e3.get("type").asText() == "delete" && e3.get("id").asText() == "s1")
      assert(e3.get("seq").asLong() == e2.get("seq").asLong() + 1)
      reader.close()
      // a since= resume skips the acknowledged prefix
      val res2 = client.send(HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${srv.boundPort}/api/v1/updates/stream?since=${e2.get("seq").asLong()}"))
        .GET().build(), BodyHandlers.ofInputStream())
      val r2 = new java.io.BufferedReader(
        new java.io.InputStreamReader(res2.body(), java.nio.charset.StandardCharsets.UTF_8))
      var line2 = r2.readLine()
      while (line2 != null && !line2.startsWith("data: ")) line2 = r2.readLine()
      val first2 = mapper.readTree(line2.drop(6))
      assert(first2.get("seq").asLong() == e3.get("seq").asLong()
        && first2.get("type").asText() == "delete")
      r2.close()
    } finally srv.stop()
  }

  test("SSE write deadline evicts a stalled-but-alive client") {
    // A client with a full TCP send buffer blocks the pusher's socket
    // write INDEFINITELY (it is alive, so the write never fails on its
    // own) — the watchdog must close the exchange at the deadline so the
    // write aborts and the client is dropped like a dead one. Driven with
    // a stub exchange whose output stream blocks until close(), the only
    // deterministic way to reproduce a kernel-buffer stall.
    import com.sun.net.httpserver.{Headers, HttpContext, HttpPrincipal}
    import java.io.{InputStream, OutputStream}
    class StubExchange(blockWrites: Boolean) extends
        com.sun.net.httpserver.HttpExchange {
      val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
      private val gate = new java.util.concurrent.CountDownLatch(1)
      private val out = new OutputStream {
        override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          if (blockWrites) {
            // block like a full socket buffer; closing the exchange is
            // what aborts the write
            gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
            throw new java.io.IOException("stream closed")
          }
      }
      override def close(): Unit = { closed.set(true); gate.countDown() }
      override def getResponseBody: OutputStream = out
      override def getRequestHeaders: Headers = new Headers
      override def getResponseHeaders: Headers = new Headers
      override def getRequestURI: java.net.URI = java.net.URI.create("/")
      override def getRequestMethod: String = "GET"
      override def getHttpContext: HttpContext = null
      override def getRequestBody: InputStream = InputStream.nullInputStream()
      override def sendResponseHeaders(rCode: Int, len: Long): Unit = ()
      override def getRemoteAddress: java.net.InetSocketAddress = null
      override def getResponseCode: Int = 200
      override def getLocalAddress: java.net.InetSocketAddress = null
      override def getProtocol: String = "HTTP/1.1"
      override def getAttribute(name: String): AnyRef = null
      override def setAttribute(name: String, value: Any): Unit = ()
      override def setStreams(i: InputStream, o: OutputStream): Unit = ()
      override def getPrincipal: HttpPrincipal = null
    }
    val srv = new RestServer(null, sseWriteDeadlineMs = 150L)
    try {
      val ev = mapper.createObjectNode()
      ev.put("seq", 1L); ev.put("type", "insert"); ev.put("id", "x")
      // healthy client: write returns, retained
      val ok = new StubExchange(blockWrites = false)
      assert(srv.sseWrite(ok, ev))
      assert(!ok.closed.get)
      // stalled client: the write blocks; the watchdog must close it at
      // ~the deadline and sseWrite must report eviction, not hang
      val stalled = new StubExchange(blockWrites = true)
      val t0 = System.nanoTime()
      assert(!srv.sseWrite(stalled, ev))
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(stalled.closed.get, "watchdog should have closed the exchange")
      assert(elapsedMs < 10000, s"write should abort near the 150ms deadline, took $elapsedMs ms")
    } finally srv.stop()
  }

  test("WebSocket update stream: handshake, backlog, live push, ping, close") {
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ws_").toString)
    val srv = new RestServer(store).start()
    try {
      // one pre-subscription mutation -> becomes the backlog
      assert(call(srv, "POST", "/api/v1/vectors",
        s"""{"id": "w1", "vector": ${vecJson(1)}}""")._1 == 201)

      val sock = new java.net.Socket("127.0.0.1", srv.boundWsPort)
      sock.setSoTimeout(10000)
      val out = sock.getOutputStream
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))

      // RFC 6455 client handshake with a fixed key; verify the accept hash
      val key = java.util.Base64.getEncoder.encodeToString(
        "0123456789abcdef".getBytes("UTF-8"))
      out.write(("GET /api/v1/updates/ws?since=0 HTTP/1.1\r\n" +
        s"Host: 127.0.0.1\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
      out.flush()
      def readLine(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
        sb.toString
      }
      assert(readLine() == "HTTP/1.1 101 Switching Protocols")
      var hdr = readLine(); var accept = ""
      while (hdr.nonEmpty) {
        if (hdr.toLowerCase.startsWith("sec-websocket-accept:"))
          accept = hdr.split(":", 2)(1).trim
        hdr = readLine()
      }
      val expect = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes("UTF-8")))
      assert(accept == expect, s"bad Sec-WebSocket-Accept: $accept")

      // server frame reader (server->client frames are unmasked)
      def readFrame(): (Int, Array[Byte]) = {
        val b0 = in.readUnsignedByte(); val b1 = in.readUnsignedByte()
        var len: Long = b1 & 0x7f
        if (len == 126) len = in.readUnsignedShort()
        else if (len == 127) len = in.readLong()
        val payload = new Array[Byte](len.toInt)
        in.readFully(payload)
        (b0 & 0x0f, payload)
      }
      // masked client frame writer
      def sendFrame(op: Int, payload: Array[Byte]): Unit = {
        val mask = Array[Byte](1, 2, 3, 4)
        out.write(0x80 | op); out.write(0x80 | payload.length)
        out.write(mask)
        out.write(payload.zipWithIndex.map { case (b, i) => (b ^ mask(i & 3)).toByte })
        out.flush()
      }

      // backlog: the pre-subscription insert replays as the first frame
      val (op1, p1) = readFrame()
      val e1 = mapper.readTree(new String(p1, "UTF-8"))
      assert(op1 == 0x1 && e1.get("type").asText() == "insert"
        && e1.get("id").asText() == "w1")
      // live: a mutation after subscribe arrives on the held connection
      assert(call(srv, "POST", "/api/v1/vectors",
        s"""{"id": "w2", "vector": ${vecJson(2)}}""")._1 == 201)
      val (op2, p2) = readFrame()
      val e2 = mapper.readTree(new String(p2, "UTF-8"))
      assert(op2 == 0x1 && e2.get("id").asText() == "w2"
        && e2.get("seq").asLong() == e1.get("seq").asLong() + 1)
      // ping -> pong with the same payload
      sendFrame(0x9, "hi".getBytes("UTF-8"))
      val (opPong, pPong) = readFrame()
      assert(opPong == 0xA && new String(pPong, "UTF-8") == "hi")
      // close -> close echo, connection drains
      sendFrame(0x8, Array[Byte](0x03, 0xe8.toByte))
      val (opClose, _) = readFrame()
      assert(opClose == 0x8)
      sock.close()

      // a plain-HTTP request to the WS port on a wrong path is rejected
      val sock2 = new java.net.Socket("127.0.0.1", srv.boundWsPort)
      sock2.setSoTimeout(5000)
      sock2.getOutputStream.write(
        "GET /nope HTTP/1.1\r\nHost: x\r\n\r\n".getBytes("UTF-8"))
      sock2.getOutputStream.flush()
      val r2 = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock2.getInputStream, "UTF-8"))
      assert(r2.readLine().contains("404"))
      sock2.close()
    } finally srv.stop()
  }

  test("admin moments route serves the folded exact moments via the locked read") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_mom_rest_").toString)
    // unconfigured: disabled (backupBase posture)
    val srv0 = new RestServer(store).start()
    try {
      val (s404, r404) = call(srv0, "GET", "/api/v1/admin/moments")
      assert(s404 == 404 && r404.get("error").asText().contains("not configured"))
    } finally srv0.stop()
    // empty state dir: a well-formed empty envelope
    val empty = java.nio.file.Files.createTempDirectory("graft_mom_e_").toString
    val srvE = new RestServer(store, momentsStateDir = Some(empty)).start()
    try {
      val (s, r) = call(srvE, "GET", "/api/v1/admin/moments")
      assert(s == 200 && !r.get("folded").asBoolean() && !r.has("sum"))
    } finally srvE.stop()
    // flat fold: exact numbers, sums as STRINGS, derived mean/std
    val sd = java.nio.file.Files.createTempDirectory("graft_mom_s_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_mom_src_").toString + "/files"
    (0L until 100L).toDF("value").coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingMoments.ingest(spark, src, sd,
      java.nio.file.Files.createTempDirectory("graft_mom_ck_").toString)
    q.processAllAvailable(); q.stop()
    val srv = new RestServer(store, momentsStateDir = Some(sd)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/moments")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && !r.get("grouped").asBoolean())
      assert(r.get("value_col").asText() == "value")
      assert(r.get("n_rows").asLong() == 100L && r.get("n_null").asLong() == 0L)
      assert(r.get("min").asLong() == 0L && r.get("max").asLong() == 99L)
      // exact sums ride as strings (unbounded width, never a rounded
      // JSON double); 0..99: sum 4950, sumsq 99*100*199/6 = 328350
      assert(r.get("sum").isTextual && r.get("sum").asText() == "4950")
      assert(r.get("sum_sq").asText() == "328350")
      assert(r.get("mean").asDouble() == 49.5)
      assert(r.get("moments_are_exact").asBoolean())
      // a ?group ask against a flat fold refuses
      val (sFg, rFg) = call(srv, "GET", "/api/v1/admin/moments?group=s0")
      assert(sFg == 404 && rFg.get("error").asText().contains("flat"), rFg.toString)
      // verify without a configured source: the 403 posture
      val (sV0, rV0) = call(srv, "GET", "/api/v1/admin/moments?verify=true")
      assert(sV0 == 403 && rV0.get("error").asText().contains("momentsSourceDir"))
    } finally srv.stop()

    // grouped fold: per-group exact numbers + selection
    val gsd = java.nio.file.Files.createTempDirectory("graft_mom_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_mom_gsrc_").toString + "/files"
    (0L until 90L).map(i => (s"s${i % 3}", i))
      .toDF("source", "value").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedMoments.ingest(spark, gsrc, gsd,
      java.nio.file.Files.createTempDirectory("graft_mom_gck_").toString)
    gq.processAllAvailable(); gq.stop()
    val srvG = new RestServer(store, momentsStateDir = Some(gsd)).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/moments")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && r.get("grouped").asBoolean())
      assert(r.get("group_count").asInt() == 3)
      assert(r.get("excluded_null_rows").asLong() == 0L)
      // every group's envelope numbers equal the batch face's row
      val twin = graft.operators.Profile
        .momentsPerGroup(spark.read.parquet(gsrc), "source", "value")
        .collect().map(x => x.getString(0) -> x).toMap
      (0 until 3).foreach { gi =>
        val g = s"s$gi"
        val gn = r.get("groups").get(g)
        assert(gn.get("n_rows").asLong() == twin(g).getLong(1), g)
        assert(gn.get("min").asLong() == twin(g).getLong(4), g)
        assert(gn.get("sum").asText() ==
          twin(g).getDecimal(6).toBigInteger.toString, g)
      }
      // ?group selection: one group only; unknown group is a 404
      val (s1, r1) = call(srvG, "GET", "/api/v1/admin/moments?group=s1")
      assert(s1 == 200 && r1.get("groups").size() == 1
        && r1.get("groups").has("s1"), r1.toString)
      val (s2, r2) = call(srvG, "GET", "/api/v1/admin/moments?group=nope")
      assert(s2 == 404 && r2.get("error").asText().contains("nope"), r2.toString)
    } finally srvG.stop()

    // a group name carrying '&' must be reachable through its
    // percent-encoded form: the route splits the RAW query on '&' and
    // decodes each value AFTER (getQuery pre-decodes, which would
    // truncate "r&d" to "r" and 404)
    val esd = java.nio.file.Files.createTempDirectory("graft_mom_es_").toString
    val esrc = java.nio.file.Files.createTempDirectory("graft_mom_esrc_").toString + "/files"
    Seq(("r&d", 5L), ("plain", 7L)).toDF("source", "value")
      .coalesce(1).write.parquet(esrc)
    val eq = graft.streaming.StreamingGroupedMoments.ingest(spark, esrc, esd,
      java.nio.file.Files.createTempDirectory("graft_mom_eck_").toString)
    eq.processAllAvailable(); eq.stop()
    val srvE2 = new RestServer(store, momentsStateDir = Some(esd)).start()
    try {
      val (s, r) = call(srvE2, "GET", "/api/v1/admin/moments?group=r%26d")
      assert(s == 200, s"$s $r")
      assert(r.get("groups").size() == 1 && r.get("groups").has("r&d"), r.toString)
      assert(r.get("groups").get("r&d").get("sum").asText() == "5", r.toString)
    } finally srvE2.stop()
  }

  test("histogram route windowed rung: aggregate envelope + quantiles, verify 409") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_whist_rest_").toString)
    val sd = java.nio.file.Files.createTempDirectory("graft_whist_s_").toString
    val spec = graft.operators.HistogramSketch.HistogramSpec(0.0, 100.0, 20)
    val ck = "file:whist-ckpt"
    // 5 batches at window=2: only batches 3 and 4 (30..59 and 40..69)
    // survive in the window
    (0 until 5).foreach { b =>
      graft.streaming.StreamingWindowedHistogram.applyBatch(spark, sd,
        spec, 2, ck,
        (0 until 30).map(j => (b * 10 + j).toDouble).toDF("value"),
        "value", b.toLong)
    }
    val srv = new RestServer(store, histogramStateDir = Some(sd),
      histogramSourceDir = Some("/nonexistent")).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/histogram?bins=true")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && r.get("windowed").asBoolean())
      assert(r.get("window").asInt() == 2 && r.get("ring_depth").asInt() == 2)
      assert(r.get("n").asLong() == 60L)
      assert(r.get("underflow").asLong() == 0L && r.get("overflow").asLong() == 0L)
      // quantiles ride the window aggregate: the twin interpolation over
      // the last two batches' values
      val twin = graft.operators.HistogramSketch.quantiles(spec,
        graft.operators.HistogramSketch.counts(
          ((30 until 60) ++ (40 until 70)).map(_.toDouble).toDF("value"),
          "value", spec).collect().map(x => x.getInt(0) -> x.getLong(1)).toMap,
        Seq(0.5)).head._2
      assert(math.abs(r.get("quantiles").get("0.5").asDouble() - twin) < 1e-9,
        r.toString)
      assert(r.get("bins").size() > 0)
      // verify on a windowed fold: a named 409 category error
      val (sV, rV) = call(srv, "GET", "/api/v1/admin/histogram?verify=true")
      assert(sV == 409 &&
        rV.get("error").asText().contains("cannot be recount-verified"), rV.toString)
      // the one-poll profile face reports the windowed rung
      val (sP, rP) = call(srv, "GET", "/api/v1/admin/profile")
      assert(sP == 200, rP.toString)
      val h = rP.get("faces").get("histogram")
      assert(h.get("windowed").asBoolean() && h.get("n").asLong() == 60L, rP.toString)
    } finally srv.stop()
  }

  test("moments route windowed rung: aggregate envelope, group 404, verify 409") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_wmom_rest_").toString)
    val sd = java.nio.file.Files.createTempDirectory("graft_wmom_s_").toString
    // fold 5 deterministic batches at window=2 through applyBatch (order
    // is the point of the windowed face)
    val ck = "file:wmom-ckpt"
    (0 until 5).foreach { b =>
      graft.streaming.StreamingWindowedMoments.applyBatch(spark, sd, 2, ck,
        (0 until 10).map(j => b * 100L + j).toDF("value"), "value", b.toLong)
    }
    val srv = new RestServer(store, momentsStateDir = Some(sd),
      momentsSourceDir = Some("/nonexistent")).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/moments")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && r.get("windowed").asBoolean())
      assert(r.get("window").asInt() == 2 && r.get("ring_depth").asInt() == 2)
      // aggregate = batches 3 and 4: 300..309 + 400..409
      assert(r.get("n_rows").asLong() == 20L)
      assert(r.get("min").asLong() == 300L && r.get("max").asLong() == 409L)
      assert(r.get("moments_are_exact").asBoolean())
      // a windowed fold has no groups; verify is a category error with a
      // NAMED reason, not an attempted (wrong) all-time recount
      val (sG, rG) = call(srv, "GET", "/api/v1/admin/moments?group=s0")
      assert(sG == 404 && rG.get("error").asText().contains("WINDOW"), rG.toString)
      val (sV, rV) = call(srv, "GET", "/api/v1/admin/moments?verify=true")
      assert(sV == 409 &&
        rV.get("error").asText().contains("cannot be recount-verified"), rV.toString)
      // the one-poll profile face reports the windowed rung too
      val (sP, rP) = call(srv, "GET", "/api/v1/admin/profile")
      assert(sP == 200, rP.toString)
      val mom = rP.get("faces").get("moments")
      assert(mom.get("windowed").asBoolean() &&
        mom.get("ring_depth").asInt() == 2 &&
        mom.get("n_rows").asLong() == 20L, rP.toString)
    } finally srv.stop()
  }

  test("distinct route windowed rung: envelope, group 404, verify 409") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_wdis_rest_").toString)
    val sd = java.nio.file.Files.createTempDirectory("graft_wdis_s_").toString
    val ck = "file:wdis-ckpt"
    // 5 batches at window=2: only batches 3 (d30..d49) and 4 (d40..d59)
    // survive — 30 distinct values in the window
    (0 until 5).foreach { b =>
      graft.streaming.StreamingWindowedDistinct.applyBatch(spark, sd, 12,
        2, ck, (0 until 20).map(j => s"d${b * 10 + j}").toDF("value"),
        "value", b.toLong)
    }
    val srv = new RestServer(store, distinctStateDir = Some(sd),
      distinctSourceDir = Some("/nonexistent")).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/distinct")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && r.get("windowed").asBoolean())
      assert(r.get("window").asInt() == 2 && r.get("ring_depth").asInt() == 2)
      assert(r.get("n_rows").asLong() == 40L && r.get("n_null").asLong() == 0L)
      assert(r.get("lg_k").asInt() == 12)
      assert(math.rint(r.get("estimate").asDouble()) == 30.0, r.toString)
      // a windowed fold has no groups; verify is a named 409
      val (sG, rG) = call(srv, "GET", "/api/v1/admin/distinct?group=s0")
      assert(sG == 404 && rG.get("error").asText().contains("WINDOW"), rG.toString)
      val (sV, rV) = call(srv, "GET", "/api/v1/admin/distinct?verify=true")
      assert(sV == 409 &&
        rV.get("error").asText().contains("cannot be recount-verified"), rV.toString)
      // the one-poll profile face reports the windowed rung
      val (sP, rP) = call(srv, "GET", "/api/v1/admin/profile")
      assert(sP == 200, rP.toString)
      val d = rP.get("faces").get("distinct")
      assert(d.get("windowed").asBoolean() &&
        d.get("ring_depth").asInt() == 2 &&
        d.get("n_rows").asLong() == 40L &&
        math.rint(d.get("estimate").asDouble()) == 30.0, rP.toString)
    } finally srv.stop()
  }

  test("frequent-items windowed rung: trending envelope, recount 409") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_whh_rest_").toString)
    val sd = java.nio.file.Files.createTempDirectory("graft_whh_s_").toString
    val src = java.nio.file.Files
      .createTempDirectory("graft_whh_src_").toString + "/files"
    Seq((1L, "x y")).toDF("doc_id", "text").coalesce(1).write.parquet(src)
    val ck = "file:whh-ckpt"
    // 4 batches at window=2: batches 0-1 dominated by "old", 2-3 by
    // "hot" — the served window candidates must be the trending set
    (0 until 4).foreach { b =>
      val tok = if (b < 2) "old" else "hot"
      graft.streaming.StreamingWindowedHeavyHitters.applyBatch(spark, sd, 8, 2, ck,
        (0 until 10).map(i => ((b * 10 + i).toLong, s"$tok $tok t${b}_$i"))
          .toDF("doc_id", "text"), b.toLong)
    }
    val srv = new RestServer(store, frequentItemsStateDir = Some(sd),
      frequentItemsSourceDir = Some(src)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/frequent-items")
      assert(s == 200, r.toString)
      assert(r.get("windowed").asBoolean() && !r.get("grouped").asBoolean())
      assert(r.get("window").asInt() == 2 && r.get("ring_depth").asInt() == 2)
      assert(r.get("n").asLong() == 60L, r.toString)
      assert(r.get("counts").has("hot") && !r.get("counts").has("old"),
        s"trending set wrong: $r")
      assert(r.get("counts_are_mg_estimates").asBoolean())
      // the exact recount is a named 409 on a windowed fold (checked
      // before the no-state 409 — the windowed state IS folded)
      val (s2, r2) = call(srv, "POST",
        "/api/v1/admin/frequent-items/recount", "{\"denominator\": 4}")
      assert(s2 == 409 &&
        r2.get("error").asText().contains("cannot be exactly recounted"),
        s"$s2 $r2")
      // the one-poll profile face reports the windowed rung
      val (sP, rP) = call(srv, "GET", "/api/v1/admin/profile")
      assert(sP == 200, rP.toString)
      val f = rP.get("faces").get("frequent_items")
      assert(f.get("windowed").asBoolean() &&
        f.get("ring_depth").asInt() == 2 &&
        f.get("n").asLong() == 60L, rP.toString)
    } finally srv.stop()
  }

  test("one-poll profile: the full configured-face matrix, windowed rungs " +
      "and liveness per face") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_pmat_rest_").toString)
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    // six faces, three of them on their WINDOWED rung (moments,
    // histogram, distinct — the three ring instantiations), the other
    // three flat — the widest simultaneous configuration the monitor
    // serves, each face with its own liveness (last_batch_id, and the
    // ring faces' window/ring_depth)
    val momSd = tmp("graft_pmat_mom_")
    (0 until 3).foreach { b =>
      graft.streaming.StreamingWindowedMoments.applyBatch(spark, momSd, 2,
        "file:pm-mom", (0 until 5).map(j => b * 10L + j).toDF("value"),
        "value", b.toLong)
    }
    val histSd = tmp("graft_pmat_hist_")
    val spec = graft.operators.HistogramSketch.HistogramSpec(0.0, 50.0, 5)
    (0 until 3).foreach { b =>
      graft.streaming.StreamingWindowedHistogram.applyBatch(spark, histSd,
        spec, 2, "file:pm-hist",
        (0 until 5).map(j => (b * 10 + j).toDouble).toDF("value"),
        "value", b.toLong)
    }
    val disSd = tmp("graft_pmat_dis_")
    (0 until 3).foreach { b =>
      graft.streaming.StreamingWindowedDistinct.applyBatch(spark, disSd,
        12, 2, "file:pm-dis",
        (0 until 5).map(j => s"v${b * 3 + j}").toDF("value"),
        "value", b.toLong)
    }
    val hhSd = tmp("graft_pmat_hh_")
    val hhSrc = tmp("graft_pmat_hhsrc_") + "/files"
    Seq((1L, "a a b"), (2L, "a c d")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(hhSrc)
    val qHh = graft.streaming.StreamingHeavyHitters.ingest(spark, hhSrc,
      hhSd, tmp("graft_pmat_hhck_"), denominator = 5)
    qHh.processAllAvailable(); qHh.stop()
    val smpSd = tmp("graft_pmat_smp_")
    val smpSrc = tmp("graft_pmat_smpsrc_") + "/files"
    Seq((1L, 1.0), (2L, 2.0)).toDF("doc_id", "value")
      .coalesce(1).write.parquet(smpSrc)
    val qSmp = graft.streaming.StreamingSample.ingest(spark, smpSrc,
      smpSd, tmp("graft_pmat_smpck_"), k = 4, valueCol = Some("value"))
    qSmp.processAllAvailable(); qSmp.stop()
    val comSd = tmp("graft_pmat_com_")
    val comSrc = tmp("graft_pmat_comsrc_") + "/files"
    Seq((1L, 2L), (3L, 5L)).toDF("x", "y")
      .coalesce(1).write.parquet(comSrc)
    val qCom = graft.streaming.StreamingComoments.ingest(spark, comSrc,
      comSd, tmp("graft_pmat_comck_"))
    qCom.processAllAvailable(); qCom.stop()
    val srv = new RestServer(store,
      frequentItemsStateDir = Some(hhSd), histogramStateDir = Some(histSd),
      sampleStateDir = Some(smpSd), momentsStateDir = Some(momSd),
      distinctStateDir = Some(disSd), comomentsStateDir = Some(comSd))
      .start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/profile")
      assert(s == 200, r.toString)
      assert(r.get("face_count").asInt() == 6, r.toString)
      val faces = r.get("faces")
      // every configured face present, folded, with its own liveness
      Seq("frequent_items", "histogram", "sample", "moments", "distinct",
        "comoments").foreach { name =>
        val f = faces.get(name)
        assert(f != null && f.get("folded").asBoolean(), s"$name: $r")
        assert(f.has("last_batch_id"), s"$name lacks liveness: $r")
        assert(!f.has("error"), s"$name errored: $r")
      }
      // the three ring faces carry their windowed identity
      Seq("histogram", "moments", "distinct").foreach { name =>
        val f = faces.get(name)
        assert(f.get("windowed").asBoolean() &&
          f.get("window").asInt() == 2 &&
          f.get("ring_depth").asInt() == 2 &&
          f.get("last_batch_id").asLong() == 2L, s"$name: $r")
      }
      // and the flat faces do NOT claim a window
      Seq("frequent_items", "sample", "comoments").foreach { name =>
        assert(!faces.get(name).has("windowed"), s"$name: $r")
      }
      // headline numbers ride the windowed aggregates
      assert(faces.get("moments").get("n_rows").asLong() == 10L, r.toString)
      assert(faces.get("histogram").get("n").asLong() == 10L, r.toString)
      assert(faces.get("distinct").get("n_rows").asLong() == 10L, r.toString)
    } finally srv.stop()
  }

  test("moments verify face: recount parity, drift, column 422, grouped bound") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_momv_").toString)
    val sd = java.nio.file.Files.createTempDirectory("graft_momv_s_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_momv_src_").toString + "/files"
    (0L until 100L).toDF("value").coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingMoments.ingest(spark, src, sd,
      java.nio.file.Files.createTempDirectory("graft_momv_ck_").toString)
    q.processAllAvailable(); q.stop()
    // quiesced stream over its own source: number-for-number parity
    val srv = new RestServer(store, momentsStateDir = Some(sd),
      momentsSourceDir = Some(src)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/moments?verify=true")
      assert(s == 200, r.toString)
      assert(r.get("verify").get("matched").asBoolean(), r.toString)
      assert(r.get("verify").get("recount_n_rows").asLong() == 100L)
      // drift the source AFTER the fold: the recount sees rows the state
      // never folded and the face says so
      (100L until 150L).toDF("value").coalesce(1)
        .write.mode("append").parquet(src)
      val (s2, r2) = call(srv, "GET", "/api/v1/admin/moments?verify=true")
      assert(s2 == 200 && !r2.get("verify").get("matched").asBoolean(), r2.toString)
      assert(r2.get("verify").get("recount_n_rows").asLong() == 150L)
    } finally srv.stop()
    // configured value column missing from the source schema: a
    // configuration-naming 422, never an AnalysisException-shaped 500
    val srvBad = new RestServer(store, momentsStateDir = Some(sd),
      momentsSourceDir = Some(src), momentsValueCol = "no_such_col").start()
    try {
      val (s, r) = call(srvBad, "GET", "/api/v1/admin/moments?verify=true")
      assert(s == 422, s"$s $r")
      assert(r.get("error").asText().contains("no_such_col"), r.toString)
      assert(r.get("error").asText().contains("momentsValueCol"), r.toString)
    } finally srvBad.stop()
    // nothing folded: verify is a category error (409), not an empty 200
    val empty = java.nio.file.Files.createTempDirectory("graft_momv_e_").toString
    val srvE = new RestServer(store, momentsStateDir = Some(empty),
      momentsSourceDir = Some(src)).start()
    try {
      val (s, r) = call(srvE, "GET", "/api/v1/admin/moments?verify=true")
      assert(s == 409 && r.get("error").asText().contains("no folded"), r.toString)
    } finally srvE.stop()
    // grouped fold, then the source's group column drifts toward per-row
    // cardinality: the recount collect is BOUNDED — past stateGroups + 16
    // rows the face refuses with a named error instead of pulling an
    // unbounded relation into the serving driver
    val gsd = java.nio.file.Files.createTempDirectory("graft_momv_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_momv_gsrc_").toString + "/files"
    Seq(("a", 10L), ("a", 30L)).toDF("source", "value")
      .coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedMoments.ingest(spark, gsrc, gsd,
      java.nio.file.Files.createTempDirectory("graft_momv_gck_").toString)
    gq.processAllAvailable(); gq.stop()
    val srvG = new RestServer(store, momentsStateDir = Some(gsd),
      momentsSourceDir = Some(gsrc)).start()
    try {
      // parity first (1 group, quiesced)
      val (s0, r0) = call(srvG, "GET", "/api/v1/admin/moments?verify=true")
      assert(s0 == 200 && r0.get("verify").get("matched").asBoolean(), r0.toString)
      // cap for 1 state group = 1 + 16 = 17 recount rows; 300 one-row
      // groups overflow it
      (0 until 300).map(i => (s"g$i", 50L)).toDF("source", "value")
        .coalesce(1).write.mode("append").parquet(gsrc)
      val (s, r) = call(srvG, "GET", "/api/v1/admin/moments?verify=true")
      assert(s == 200, r.toString)
      val v = r.get("verify")
      assert(!v.get("matched").asBoolean(), r.toString)
      assert(v.get("error").asText().contains("group cardinality"), r.toString)
      assert(!v.has("mismatched_groups"), r.toString) // compare skipped
    } finally srvG.stop()
  }

  test("admin profile route: one-poll envelope over every configured face") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_prof_rest_").toString)
    // nothing configured: 404, not an empty 200
    val srv0 = new RestServer(store).start()
    try {
      val (s404, r404) = call(srv0, "GET", "/api/v1/admin/profile")
      assert(s404 == 404 &&
        r404.get("error").asText().contains("no profiling faces"))
    } finally srv0.stop()
    // three faces folded (moments flat, distinct flat, comoments flat),
    // one configured-but-empty (sample): the envelope carries each
    // configured face, liveness per face, headline numbers, and the
    // empty face as folded=false — never a phantom or an omission
    def tmpd(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val momSd = tmpd("graft_prof_mom_")
    val momSrc = tmpd("graft_prof_msrc_") + "/f"
    (0L until 100L).toDF("value").coalesce(1).write.parquet(momSrc)
    val q1 = graft.streaming.StreamingMoments.ingest(spark, momSrc, momSd,
      tmpd("graft_prof_mck_"))
    q1.processAllAvailable(); q1.stop()
    val disSd = tmpd("graft_prof_dis_")
    val disSrc = tmpd("graft_prof_dsrc_") + "/f"
    (0 until 50).map(i => s"v${i % 7}").toDF("value")
      .coalesce(1).write.parquet(disSrc)
    val q2 = graft.streaming.StreamingDistinct.ingest(spark, disSrc, disSd,
      tmpd("graft_prof_dck_"))
    q2.processAllAvailable(); q2.stop()
    val comSd = tmpd("graft_prof_com_")
    val comSrc = tmpd("graft_prof_csrc_") + "/f"
    (0L until 60L).map(i => (i, 2L * i)).toDF("x", "y")
      .coalesce(1).write.parquet(comSrc)
    val q3 = graft.streaming.StreamingComoments.ingest(spark, comSrc, comSd,
      tmpd("graft_prof_cck_"))
    q3.processAllAvailable(); q3.stop()
    val emptySample = tmpd("graft_prof_smp_")
    val srv = new RestServer(store,
      momentsStateDir = Some(momSd), distinctStateDir = Some(disSd),
      comomentsStateDir = Some(comSd),
      sampleStateDir = Some(emptySample)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/profile")
      assert(s == 200, r.toString)
      assert(r.get("face_count").asInt() == 4)
      val faces = r.get("faces")
      // unconfigured faces are OMITTED, configured ones present
      assert(!faces.has("frequent_items") && !faces.has("histogram"))
      val mom = faces.get("moments")
      assert(mom.get("folded").asBoolean() && !mom.get("grouped").asBoolean())
      assert(mom.get("n_rows").asLong() == 100L &&
        mom.get("mean").asDouble() == 49.5)
      assert(mom.get("last_batch_id").asLong() == 0L)
      val dis = faces.get("distinct")
      assert(dis.get("folded").asBoolean() &&
        dis.get("n_rows").asLong() == 50L)
      assert(math.rint(dis.get("estimate").asDouble()) == 7.0)
      val com = faces.get("comoments")
      assert(com.get("folded").asBoolean() && com.get("n").asLong() == 60L)
      assert(math.abs(com.get("correlation").asDouble() - 1.0) < 1e-12)
      // the configured-but-never-folded face says so
      assert(!faces.get("sample").get("folded").asBoolean())
    } finally srv.stop()
    // a grouped fold under the same poll reports the grouped headline
    val gSd = tmpd("graft_prof_gm_")
    val gSrc = tmpd("graft_prof_gmsrc_") + "/f"
    (0L until 90L).map(i => (s"s${i % 3}", i)).toDF("source", "value")
      .coalesce(1).write.parquet(gSrc)
    val q4 = graft.streaming.StreamingGroupedMoments.ingest(spark, gSrc,
      gSd, tmpd("graft_prof_gmck_"))
    q4.processAllAvailable(); q4.stop()
    val srvG = new RestServer(store, momentsStateDir = Some(gSd)).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/profile")
      assert(s == 200, r.toString)
      val mom = r.get("faces").get("moments")
      assert(mom.get("grouped").asBoolean() &&
        mom.get("group_count").asInt() == 3, r.toString)
    } finally srvG.stop()
  }

  test("admin comoments route: envelope, selection, verify parity and drift") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_com_rest_").toString)
    // unconfigured: disabled (backupBase posture)
    val srv0 = new RestServer(store).start()
    try {
      val (s404, r404) = call(srv0, "GET", "/api/v1/admin/comoments")
      assert(s404 == 404 && r404.get("error").asText().contains("not configured"))
    } finally srv0.stop()
    // empty state dir: a well-formed empty envelope
    val empty = java.nio.file.Files.createTempDirectory("graft_com_e_").toString
    val srvE = new RestServer(store, comomentsStateDir = Some(empty)).start()
    try {
      val (s, r) = call(srvE, "GET", "/api/v1/admin/comoments")
      assert(s == 200 && !r.get("folded").asBoolean() && !r.has("x_sum"))
    } finally srvE.stop()
    // flat fold: exact numbers, sums as STRINGS, derived cov/correlation
    val sd = java.nio.file.Files.createTempDirectory("graft_com_s_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_com_src_").toString + "/files"
    (0L until 100L).map(i => (i, 2L * i)).toDF("x", "y")
      .coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingComoments.ingest(spark, src, sd,
      java.nio.file.Files.createTempDirectory("graft_com_ck_").toString)
    q.processAllAvailable(); q.stop()
    val srv = new RestServer(store, comomentsStateDir = Some(sd),
      comomentsSourceDir = Some(src)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/comoments")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && !r.get("grouped").asBoolean())
      assert(r.get("x_col").asText() == "x" && r.get("y_col").asText() == "y")
      assert(r.get("n_rows").asLong() == 100L && r.get("n").asLong() == 100L)
      assert(r.get("n_null_x").asLong() == 0L && r.get("n_null_y").asLong() == 0L)
      assert(r.get("x_min").asLong() == 0L && r.get("y_max").asLong() == 198L)
      // exact sums ride as strings; 0..99: Σx 4950, Σxy = 2Σx² = 656700
      assert(r.get("x_sum").isTextual && r.get("x_sum").asText() == "4950")
      assert(r.get("xy_sum").asText() == "656700")
      // y = 2x exactly: correlation 1 (within FP of the exact-sums path)
      assert(math.abs(r.get("correlation").asDouble() - 1.0) < 1e-12, r.toString)
      assert(r.get("comoments_are_exact").asBoolean())
      // a ?group ask against a flat fold refuses
      val (sFg, rFg) = call(srv, "GET", "/api/v1/admin/comoments?group=s0")
      assert(sFg == 404 && rFg.get("error").asText().contains("flat"), rFg.toString)
      // verify: quiesced stream over its own source matches exactly
      val (sV, rV) = call(srv, "GET", "/api/v1/admin/comoments?verify=true")
      assert(sV == 200 && rV.get("verify").get("matched").asBoolean(), rV.toString)
      // drift the source AFTER the fold: the recount sees unfolded rows
      (100L until 150L).map(i => (i, 2L * i)).toDF("x", "y")
        .coalesce(1).write.mode("append").parquet(src)
      val (sD, rD) = call(srv, "GET", "/api/v1/admin/comoments?verify=true")
      assert(sD == 200 && !rD.get("verify").get("matched").asBoolean(), rD.toString)
      assert(rD.get("verify").get("recount_n_rows").asLong() == 150L)
    } finally srv.stop()
    // verify without a configured source: the 403 posture; nothing
    // folded: 409; configured column missing from the schema: 422
    val srvNoSrc = new RestServer(store, comomentsStateDir = Some(sd)).start()
    try {
      val (s, r) = call(srvNoSrc, "GET", "/api/v1/admin/comoments?verify=true")
      assert(s == 403 && r.get("error").asText().contains("comomentsSourceDir"))
    } finally srvNoSrc.stop()
    val srvE2 = new RestServer(store, comomentsStateDir = Some(empty),
      comomentsSourceDir = Some(src)).start()
    try {
      val (s, r) = call(srvE2, "GET", "/api/v1/admin/comoments?verify=true")
      assert(s == 409 && r.get("error").asText().contains("no folded"), r.toString)
    } finally srvE2.stop()
    val srvBad = new RestServer(store, comomentsStateDir = Some(sd),
      comomentsSourceDir = Some(src), comomentsYCol = "no_such_col").start()
    try {
      val (s, r) = call(srvBad, "GET", "/api/v1/admin/comoments?verify=true")
      assert(s == 422, s"$s $r")
      assert(r.get("error").asText().contains("no_such_col"), r.toString)
      assert(r.get("error").asText().contains("comomentsYCol"), r.toString)
    } finally srvBad.stop()

    // grouped fold: per-group envelope equals the batch twin, ?group
    // selection (incl. the encoded-'&' rule), verify parity per group
    val gsd = java.nio.file.Files.createTempDirectory("graft_com_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_com_gsrc_").toString + "/files"
    ((0L until 90L).map(i => (s"s${i % 3}", i, 3L * i + i % 5)) :+
      (("r&d", 5L, 9L)))
      .toDF("source", "x", "y").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedComoments.ingest(spark, gsrc,
      gsd, java.nio.file.Files.createTempDirectory("graft_com_gck_").toString)
    gq.processAllAvailable(); gq.stop()
    val srvG = new RestServer(store, comomentsStateDir = Some(gsd),
      comomentsSourceDir = Some(gsrc)).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/comoments")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && r.get("grouped").asBoolean())
      assert(r.get("group_count").asInt() == 4)
      // every group's envelope numbers equal the batch face's row
      val twin = graft.operators.Profile
        .comomentsPerGroup(spark.read.parquet(gsrc), "source", "x", "y")
        .collect().map(x => x.getString(0) -> x).toMap
      (0 until 3).foreach { gi =>
        val g = s"s$gi"
        val gn = r.get("groups").get(g)
        assert(gn.get("n_rows").asLong() == twin(g).getLong(1), g)
        assert(gn.get("x_min").asLong() == twin(g).getLong(5), g)
        assert(gn.get("xy_sum").asText() ==
          twin(g).getDecimal(13).toBigInteger.toString, g)
      }
      // ?group selection: one group only; unknown group is a 404; a
      // group named with '&' reachable through its encoded form
      val (s1, r1) = call(srvG, "GET", "/api/v1/admin/comoments?group=s1")
      assert(s1 == 200 && r1.get("groups").size() == 1
        && r1.get("groups").has("s1"), r1.toString)
      val (s2, r2) = call(srvG, "GET", "/api/v1/admin/comoments?group=nope")
      assert(s2 == 404 && r2.get("error").asText().contains("nope"), r2.toString)
      val (s3, r3) = call(srvG, "GET", "/api/v1/admin/comoments?group=r%26d")
      assert(s3 == 200 && r3.get("groups").has("r&d"), r3.toString)
      assert(r3.get("groups").get("r&d").get("x_sum").asText() == "5")
      // grouped verify parity on the quiesced stream
      val (sV, rV) = call(srvG, "GET", "/api/v1/admin/comoments?verify=true")
      assert(sV == 200 && rV.get("verify").get("matched").asBoolean(), rV.toString)
      // the group column drifts toward per-row cardinality: the recount
      // collect is BOUNDED (stateGroups + 16) and refuses loudly past it
      (0 until 300).map(i => (s"g$i", 50L, 1L)).toDF("source", "x", "y")
        .coalesce(1).write.mode("append").parquet(gsrc)
      val (sB, rB) = call(srvG, "GET", "/api/v1/admin/comoments?verify=true")
      assert(sB == 200, rB.toString)
      val v = rB.get("verify")
      assert(!v.get("matched").asBoolean(), rB.toString)
      assert(v.get("error").asText().contains("group cardinality"), rB.toString)
    } finally srvG.stop()
  }

  test("admin distinct route: envelope, selection, verify parity and drift") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_dis_rest_").toString)
    // unconfigured: disabled
    val srv0 = new RestServer(store).start()
    try {
      val (s404, r404) = call(srv0, "GET", "/api/v1/admin/distinct")
      assert(s404 == 404 && r404.get("error").asText().contains("not configured"))
    } finally srv0.stop()
    // flat fold over values with heavy duplication: the envelope's
    // estimate is the exact distinct count (sparse regime) and the
    // counters are exact
    val sd = java.nio.file.Files.createTempDirectory("graft_dis_s_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_dis_src_").toString + "/files"
    (0 until 200).map(i => s"v${i % 37}").toDF("value")
      .coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingDistinct.ingest(spark, src, sd,
      java.nio.file.Files.createTempDirectory("graft_dis_ck_").toString)
    q.processAllAvailable(); q.stop()
    val srv = new RestServer(store, distinctStateDir = Some(sd),
      distinctSourceDir = Some(src)).start()
    try {
      val (s, r) = call(srv, "GET", "/api/v1/admin/distinct")
      assert(s == 200, r.toString)
      assert(r.get("folded").asBoolean() && !r.get("grouped").asBoolean())
      assert(r.get("lg_k").asInt() == 12 && r.get("value_col").asText() == "value")
      assert(r.get("n_rows").asLong() == 200L && r.get("n_null").asLong() == 0L)
      assert(math.round(r.get("estimate").asDouble()) == 37L, r.toString)
      assert(r.get("counters_are_exact").asBoolean())
      // ?group against a flat fold refuses
      val (sFg, rFg) = call(srv, "GET", "/api/v1/admin/distinct?group=s0")
      assert(sFg == 404 && rFg.get("error").asText().contains("flat"), rFg.toString)
      // verify: quiesced parity, then source drift flips the verdict
      val (sV, rV) = call(srv, "GET", "/api/v1/admin/distinct?verify=true")
      assert(sV == 200 && rV.get("verify").get("matched").asBoolean(), rV.toString)
      (0 until 50).map(i => s"fresh$i").toDF("value")
        .coalesce(1).write.mode("append").parquet(src)
      val (sV2, rV2) = call(srv, "GET", "/api/v1/admin/distinct?verify=true")
      assert(sV2 == 200 && !rV2.get("verify").get("matched").asBoolean(), rV2.toString)
      assert(rV2.get("verify").get("recount_n_rows").asLong() == 250L)
    } finally srv.stop()
    // grouped fold: per-group envelopes + selection + verify parity
    val gsd = java.nio.file.Files.createTempDirectory("graft_dis_gs_").toString
    val gsrc = java.nio.file.Files.createTempDirectory("graft_dis_gsrc_").toString + "/files"
    (0 until 300).map(i => (s"s${i % 3}", s"${i % 3}_v${i % 41}"))
      .toDF("source", "value").coalesce(1).write.parquet(gsrc)
    val gq = graft.streaming.StreamingGroupedDistinct.ingest(spark, gsrc,
      gsd, java.nio.file.Files.createTempDirectory("graft_dis_gck_").toString)
    gq.processAllAvailable(); gq.stop()
    val srvG = new RestServer(store, distinctStateDir = Some(gsd),
      distinctSourceDir = Some(gsrc)).start()
    try {
      val (s, r) = call(srvG, "GET", "/api/v1/admin/distinct")
      assert(s == 200, r.toString)
      assert(r.get("grouped").asBoolean() && r.get("group_count").asInt() == 3)
      val truth = spark.read.parquet(gsrc).groupBy("source")
        .agg(org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("value")).as("d"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      (0 until 3).foreach { gi =>
        val g = s"s$gi"
        val gn = r.get("groups").get(g)
        assert(math.round(gn.get("estimate").asDouble()) == truth(g), g)
        assert(gn.get("n_rows").asLong() == 100L, g)
      }
      val (s1, r1) = call(srvG, "GET", "/api/v1/admin/distinct?group=s1")
      assert(s1 == 200 && r1.get("groups").size() == 1 &&
        r1.get("groups").has("s1"), r1.toString)
      val (s2, r2) = call(srvG, "GET", "/api/v1/admin/distinct?group=nope")
      assert(s2 == 404 && r2.get("error").asText().contains("nope"), r2.toString)
      val (sV, rV) = call(srvG, "GET", "/api/v1/admin/distinct?verify=true")
      assert(sV == 200 && rV.get("verify").get("matched").asBoolean(), rV.toString)
    } finally srvG.stop()
    // verify misconfig ladder: no source dir 403; bad column 422;
    // empty state 409
    val srvNoSrc = new RestServer(store, distinctStateDir = Some(sd)).start()
    try {
      val (s, r) = call(srvNoSrc, "GET", "/api/v1/admin/distinct?verify=true")
      assert(s == 403 && r.get("error").asText().contains("distinctSourceDir"))
    } finally srvNoSrc.stop()
    val srvBad = new RestServer(store, distinctStateDir = Some(sd),
      distinctSourceDir = Some(src), distinctValueCol = "no_such_col").start()
    try {
      val (s, r) = call(srvBad, "GET", "/api/v1/admin/distinct?verify=true")
      assert(s == 422 && r.get("error").asText().contains("no_such_col"), s"$s $r")
    } finally srvBad.stop()
    val empty = java.nio.file.Files.createTempDirectory("graft_dis_e_").toString
    val srvE = new RestServer(store, distinctStateDir = Some(empty),
      distinctSourceDir = Some(src)).start()
    try {
      val (sE0, rE0) = call(srvE, "GET", "/api/v1/admin/distinct")
      assert(sE0 == 200 && !rE0.get("folded").asBoolean())
      val (s, r) = call(srvE, "GET", "/api/v1/admin/distinct?verify=true")
      assert(s == 409 && r.get("error").asText().contains("no folded"), r.toString)
    } finally srvE.stop()
  }
}
