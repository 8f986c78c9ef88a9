package graft.serve

import graft.SparkSpec
import graft.store.VectorStore
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

/** Workflow-level conformance with the reference's documented CLIENT
  * flows (`/root/reference/bindings/node/test/e2e-crud.test.js`, the
  * session API in `docs/sdk-reference/SDK_API.md`): each scenario here is
  * one of the reference's e2e tests driven through the MIGRATION.md
  * mapping — REST routes where the reference flow has a route
  * (insert/search/delete-by-id/vacuum/backup), the store session calls
  * where it maps to the session API (`update_metadata` →
  * `store.updateMetadata`, `delete_by_metadata` →
  * `store.deleteByMetadata`, `save_to_s5`/`load_user_vectors` →
  * `store.backup` + opening the backup path). Corpus sizes are scaled
  * down from the reference's 130/100 (the flows assert SEMANTICS —
  * counts, survivors, filter correctness — not scale; scale rows live in
  * the bench). MIGRATION.md §8 lists each flow against its test name
  * here. */
class MigrationFlowsSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(j => (math.sin(seed * (j + 1) * 0.01) * 0.5 + 0.5).toFloat)

  private def vecJson(seed: Int): String = vec(seed).mkString("[", ",", "]")

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

  private def batchInsert(srv: RestServer,
      rows: Seq[(String, Int, String)]): Unit = {
    val body = rows.map { case (id, seed, meta) =>
      s"""{"id": "$id", "vector": ${vecJson(seed)}, "metadata": $meta}"""
    }.mkString("""{"vectors": [""", ",", "]}")
    val (s, r) = call(srv, "POST", "/api/v1/vectors/batch", body)
    assert(s == 200 && r.get("failed").asInt() == 0, s"batch insert failed: $r")
  }

  private def resultIds(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    val it = n.get("results").elements()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next().get("id").asText()
    b.result()
  }

  private def freshServer(): (VectorStore, RestServer, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mig_").toString
    val bk = java.nio.file.Files.createTempDirectory("graft_mig_bk_").toString
    val store = new VectorStore(spark, dir)
    (store, new RestServer(store, backupBase = Some(bk)).start(), bk)
  }

  // e2e-crud.test.js "Full CRUD workflow — Create → Add → Save → Load →
  // Update → Delete → Save": 30 training + 60 docs with rich metadata,
  // stats, backup (the save_to_s5 analog), reopen-from-backup (the
  // load_user_vectors analog), metadata update, delete-by-id,
  // delete-by-metadata, final backup → persistence check.
  test("flow: full CRUD lifecycle (add, save, load, update, delete, save)") {
    val (store, srv, bk) = freshServer()
    try {
      batchInsert(srv, (0 until 30).map(i =>
        (s"train-$i", i, s"""{"type": "training", "index": $i}""")))
      batchInsert(srv, (0 until 60).map { i =>
        val cat = Seq("tech", "science", "arts")(i % 3)
        (s"doc-$i", 1000 + i,
          s"""{"title": "Document $i", "category": "$cat",
              "views": ${100 + i * 10}, "published": ${i % 2 == 0}}""")
      })
      val (_, st1) = call(srv, "GET", "/api/v1/admin/statistics")
      assert(st1.get("total_vectors").asLong() == 90)

      // save → load: backup is the durable snapshot; opening it IS the load
      assert(call(srv, "POST", "/api/v1/admin/backup",
        """{"target": "crud1"}""")._1 == 200)
      val loaded = new VectorStore(spark, s"$bk/crud1")
      assert(loaded.stats().recentCount == 90)
      val hits1 = loaded.search(vec(1000), 10, metric = "l2").collect()
      assert(hits1.head.getString(0) == "doc-0", s"got ${hits1.head}")
      assert(hits1.head.getString(3).contains("Document 0"),
        "metadata must survive save/load")

      // update metadata (session.update_metadata → store.updateMetadata)
      store.updateMetadata("doc-0",
        """{"title": "Updated Document 0", "category": "tech",
           "views": 9999, "published": true}""")
      val (_, up) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(1000)}, "k": 5,
            "options": {"metric": "l2", "include_metadata": true}}""")
      val doc0 = up.get("results").get(0)
      assert(doc0.get("id").asText() == "doc-0")
      assert(doc0.get("metadata").get("title").asText() == "Updated Document 0")
      assert(doc0.get("metadata").get("views").asInt() == 9999)

      // delete by id over REST; deleted ids must vanish from search
      for (i <- 1 to 3)
        assert(call(srv, "DELETE", s"/api/v1/vectors/doc-$i")._1 == 200)
      val (_, afterDel) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(1001)}, "k": 20, "options": {"metric": "l2"}}""")
      val ids3 = resultIds(afterDel)
      for (i <- 1 to 3) assert(!ids3.contains(s"doc-$i"), s"doc-$i not deleted")

      // delete by metadata (session.delete_by_metadata)
      val delRes = store.deleteByMetadata("""{"category": "arts"}""")
      assert(delRes.deletedCount > 0, "arts docs should be deleted")

      // save again, reopen, verify every deletion persisted
      assert(call(srv, "POST", "/api/v1/admin/backup",
        """{"target": "crud2"}""")._1 == 200)
      val reloaded = new VectorStore(spark, s"$bk/crud2")
      val fin = reloaded.search(vec(1000), 50, metric = "l2").collect()
      val finIds = fin.map(_.getString(0)).toSet
      for (i <- 1 to 3) assert(!finIds.contains(s"doc-$i"),
        s"doc-$i resurrected after reload")
      assert(!fin.exists(r => !r.isNullAt(3) && r.getString(3).contains("\"arts\"")),
        "arts docs resurrected after reload")
    } finally srv.stop()
  }

  // e2e-crud.test.js "Deletion workflow — Delete by ID", extended through
  // vacuum (vacuum.test.js): looped REST deletes, search-verified, then
  // physical removal with exact accounting.
  test("flow: delete by id then vacuum") {
    val (_, srv, _) = freshServer()
    try {
      batchInsert(srv, (0 until 40).map(i =>
        (s"vec-$i", 2000 + i, s"""{"index": $i}""")))
      for (i <- 0 until 10)
        assert(call(srv, "DELETE", s"/api/v1/vectors/vec-$i")._1 == 200)
      val (_, sr) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(2000)}, "k": 40, "options": {"metric": "l2"}}""")
      val ids = resultIds(sr)
      for (i <- 0 until 10) assert(!ids.contains(s"vec-$i"), s"vec-$i still served")
      assert(ids.size == 30)

      val (vs, vr) = call(srv, "POST", "/api/v1/admin/vacuum")
      assert(vs == 200 && vr.get("recent_removed").asLong() == 10)
      val (_, st) = call(srv, "GET", "/api/v1/admin/statistics")
      assert(st.get("total_vectors").asLong() == 30)
      assert(st.get("tombstone_count").asLong() == 0, "vacuum compacts tombstones")
      val (_, sr2) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(2001)}, "k": 40, "options": {"metric": "l2"}}""")
      assert(resultIds(sr2).size == 30, "post-vacuum search serves survivors only")
    } finally srv.stop()
  }

  // e2e-crud.test.js "Deletion workflow — Delete by metadata": exact
  // deleted count + returned id list, deletion visible in search.
  test("flow: delete by metadata with id accounting") {
    val (store, srv, _) = freshServer()
    try {
      batchInsert(srv, (0 until 60).map { i =>
        val status = if (i < 20) "active" else if (i < 40) "inactive" else "archived"
        (s"item-$i", 3000 + i, s"""{"status": "$status", "value": $i}""")
      })
      val res = store.deleteByMetadata("""{"status": "archived"}""")
      assert(res.deletedCount == 20, s"expected 20 archived deletions, got ${res.deletedCount}")
      assert(res.deletedIds.size == 20)
      assert(res.deletedIds.forall { id =>
        id.startsWith("item-") && id.stripPrefix("item-").toInt >= 40
      }, s"wrong ids deleted: ${res.deletedIds.sorted.take(5)}")
      val (_, sr) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(3000)}, "k": 60,
            "options": {"metric": "l2", "include_metadata": true}}""")
      val it = sr.get("results").elements()
      while (it.hasNext) {
        val r = it.next()
        assert(r.get("metadata").get("status").asText() != "archived",
          s"archived row served: ${r.get("id")}")
      }
    } finally srv.stop()
  }

  // e2e-crud.test.js "Update workflow — Update metadata and verify
  // persistence": updates visible to filtered search, surviving save/load.
  test("flow: metadata update persists across save/load") {
    val (store, srv, bk) = freshServer()
    try {
      batchInsert(srv, (0 until 20).map(i =>
        (s"post-$i", 4000 + i, s"""{"status": "draft", "n": $i}""")))
      for (i <- 0 until 10)
        store.updateMetadata(s"post-$i", s"""{"status": "published", "n": $i}""")
      val (_, sr) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(4000)}, "k": 20,
            "filter": {"status": "published"},
            "options": {"metric": "l2", "include_metadata": true}}""")
      val pubIds = resultIds(sr)
      assert(pubIds.toSet == (0 until 10).map(i => s"post-$i").toSet,
        s"published set wrong: $pubIds")
      assert(call(srv, "POST", "/api/v1/admin/backup",
        """{"target": "upd"}""")._1 == 200)
      val reloaded = new VectorStore(spark, s"$bk/upd")
      val again = reloaded.search(vec(4000), 20, metric = "l2",
        filterJson = Some("""{"status": "published"}""")).collect()
      assert(again.map(_.getString(0)).toSet ==
        (0 until 10).map(i => s"post-$i").toSet,
        "updates must survive save/load")
    } finally srv.stop()
  }

  // e2e-crud.test.js "Filter workflow — Complex filtering scenarios":
  // equals, numeric range, $and of three predicates, array-contains —
  // checked STRONGER than the reference (it verifies returned rows
  // satisfy the predicate; we also require the full matching set).
  test("flow: complex filter scenarios") {
    val (_, srv, _) = freshServer()
    try {
      case class P(id: Int, price: Int, cat: String, inStock: Boolean,
          rating: Int, tags: Seq[String])
      val prods = (0 until 40).map { i =>
        P(i, 10 + i * 5,
          Seq("electronics", "books", "clothing", "food")(i % 4),
          i % 3 != 0, 3 + (i % 3),
          if (i % 5 == 0) Seq("featured", "sale") else Seq("regular"))
      }
      batchInsert(srv, prods.map { p =>
        (s"product-${p.id}", 5000 + p.id,
          s"""{"price": ${p.price}, "category": "${p.cat}",
              "inStock": ${p.inStock}, "rating": ${p.rating},
              "tags": [${p.tags.map("\"" + _ + "\"").mkString(",")}]}""")
      })
      def filtered(filter: String): Set[String] = {
        val (s, sr) = call(srv, "POST", "/api/v1/search",
          s"""{"vector": ${vecJson(5000)}, "k": 40, "filter": $filter,
              "options": {"metric": "l2"}}""")
        assert(s == 200, s"filter $filter failed: $sr")
        resultIds(sr).toSet
      }
      assert(filtered("""{"category": "electronics"}""") ==
        prods.filter(_.cat == "electronics").map(p => s"product-${p.id}").toSet)
      assert(filtered("""{"price": {"$gte": 50, "$lte": 150}}""") ==
        prods.filter(p => p.price >= 50 && p.price <= 150)
          .map(p => s"product-${p.id}").toSet)
      assert(filtered(
        """{"$and": [{"category": "books"}, {"inStock": true},
                     {"rating": {"$gte": 4}}]}""") ==
        prods.filter(p => p.cat == "books" && p.inStock && p.rating >= 4)
          .map(p => s"product-${p.id}").toSet)
      assert(filtered("""{"tags": "featured"}""") ==
        prods.filter(_.tags.contains("featured")).map(p => s"product-${p.id}").toSet)
    } finally srv.stop()
  }

  // e2e-crud.test.js "Combined operations — Filter + Update + Delete in
  // sequence": find premium users, promote them, purge inactive, verify
  // the final population.
  test("flow: filter, update, delete in sequence") {
    val (store, srv, _) = freshServer()
    try {
      batchInsert(srv, (0 until 30).map { i =>
        val status = if (i < 15) "active" else "inactive"
        (s"user-$i", 6000 + i,
          s"""{"age": ${20 + i}, "status": "$status", "premium": ${i % 10 == 0}}""")
      })
      val (_, prem) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(6000)}, "k": 30, "filter": {"premium": true},
            "options": {"metric": "l2", "include_metadata": true}}""")
      val premiumIds = resultIds(prem)
      assert(premiumIds.toSet == Set("user-0", "user-10", "user-20"))
      for (id <- premiumIds) {
        val i = id.stripPrefix("user-").toInt
        store.updateMetadata(id,
          s"""{"age": ${20 + i}, "status": "vip", "premium": true}""")
      }
      val (_, vip) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(6001)}, "k": 30, "filter": {"status": "vip"},
            "options": {"metric": "l2"}}""")
      assert(resultIds(vip).toSet == premiumIds.toSet)
      val del = store.deleteByMetadata("""{"status": "inactive"}""")
      // user-20 was promoted to vip before the purge; 15..29 minus it = 14
      assert(del.deletedCount == 14, s"expected 14 inactive deletions, got ${del.deletedCount}")
      val (_, fin) = call(srv, "POST", "/api/v1/search",
        s"""{"vector": ${vecJson(6002)}, "k": 30,
            "options": {"metric": "l2", "include_metadata": true}}""")
      val it = fin.get("results").elements()
      var vips = 0
      while (it.hasNext) {
        val r = it.next()
        val status = r.get("metadata").get("status").asText()
        assert(status != "inactive", s"inactive row served: ${r.get("id")}")
        if (status == "vip") vips += 1
      }
      assert(vips == 3)
    } finally srv.stop()
  }
}
