package graft.store

import graft.SparkSpec
import graft.store.VectorStore._
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Hybrid batch search + age stats over the store. */
class StoreSearchSpec extends SparkSpec {

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(j => math.sin(seed * (j + 1)).toFloat)

  test("batch hybrid search spans both tiers and matches single search") {
    import spark.implicits._
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_bs_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 40).map(i => VectorRecord(s"old$i", vec(i), tsString = Some(oldTs))))
    st.insert((40 until 50).map(i => VectorRecord(s"new$i", vec(i))))
    assert(st.migrate() == 40)
    val queries = Seq((3L, vec(3)), (45L, vec(45)))
      .toDF("query_id", "q_embedding")
    val hits = st.searchBatch(queries, k = 5, metric = "l2", nProbe = 4)
      .collect().groupBy(_.getLong(0))
    // full probe (nProbe = nClusters) => equals exact single search
    val h3 = hits(3L).sortBy(_.getDouble(2)).map(_.getString(1))
    assert(h3.head == "old3")
    val h45 = hits(45L).sortBy(_.getDouble(2)).map(_.getString(1))
    assert(h45.head == "new45")
    assert(hits(3L).length == 5 && hits(45L).length == 5)
    val single = st.search(vec(3), k = 5, metric = "l2")
      .collect().map(_.getString(0))
    assert(h3.sameElements(single))
  }

  test("store k-NN graph: exact on a young store, blocked after migration, tombstones excluded") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_kg_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 30).map(i => VectorRecord(s"old$i", vec(i), tsString = Some(oldTs))))
    // young store (no centroids yet): exact all-pairs path
    val gExact = st.knnGraph(k = 3)
    assert(gExact.groupBy("id").count().collect().forall(_.getLong(1) == 3))
    val exactTop = gExact.filter(col("rank") === 1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // migrate -> centroids trained, historical tier blocked by cluster_id
    st.insert(Seq(VectorRecord("fresh", vec(5))))
    assert(st.migrate() == 30)
    val g = st.knnGraph(k = 3).collect()
    val ids = g.map(_.getString(0)).toSet
    assert(ids.contains("fresh") && ids.contains("old3"))
    // full-probe sanity on a coherent pair: old5 and fresh share vec(5)
    val top = g.filter(r => r.getLong(2) == 1)
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top("fresh") == "old5" && top("old5") == "fresh")
    // multi-probe reaches at least the single-probe graph's neighbors
    val gMp = st.knnGraph(k = 3, multiProbe = 2).collect()
    val mpPairs = gMp.map(r => (r.getString(0), r.getString(1))).toSet
    assert(mpPairs.contains(("fresh", "old5")))
    // blocked recall vs the young-store exact baseline is measurable, and
    // a tombstoned vector leaves the graph entirely
    st.delete(Seq("old3"))
    val afterDel = st.knnGraph(k = 3).collect().map(_.getString(0)).toSet
    assert(!afterDel.contains("old3"))
    assert(exactTop.nonEmpty) // baseline existed before migration
  }

  test("filtered batch search composes the metadata filter into both tiers") {
    import spark.implicits._
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_fbs_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 4))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 40).map(i => VectorRecord(s"old$i", vec(i),
      metadata = Some(s"""{"grp": ${i % 2}}"""), tsString = Some(oldTs))))
    assert(st.migrate() == 40)
    st.insert((40 until 50).map(i => VectorRecord(s"new$i", vec(i),
      metadata = Some(s"""{"grp": ${i % 2}}"""))))
    val queries = Seq((3L, vec(3)), (45L, vec(45)))
      .toDF("query_id", "q_embedding")
    val hits = st.searchBatch(queries, k = 5, metric = "l2", nProbe = 4,
      filterJson = Some("""{"grp": 1}"""))
      .collect().groupBy(_.getLong(0))
    // every hit is an odd-i row (grp 1), drawn from BOTH tiers
    hits.values.flatten.foreach { r =>
      val i = r.getString(1).replaceAll("[^0-9]", "").toInt
      assert(i % 2 == 1, s"row ${r.getString(1)} escaped the grp filter")
    }
    assert(hits(3L).map(_.getString(1)).exists(_.startsWith("old")))
    assert(hits(45L).map(_.getString(1)).exists(_.startsWith("new")))
    assert(hits(3L).length == 5 && hits(45L).length == 5)
    // exact-k parity with the single-query filtered exact path
    val single = st.search(vec(3), k = 5, metric = "l2",
      filterJson = Some("""{"grp": 1}""")).collect().map(_.getString(0))
    val h3 = hits(3L).sortBy(r => (r.getDouble(2), r.getString(1))).map(_.getString(1))
    assert(h3.sameElements(single))
  }

  test("search returns metadata, respects includeVectors and score threshold") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_iv_").toString)
    st.insert((0 until 10).map(i =>
      VectorRecord(s"v$i", vec(i), Some(s"""{"i": $i}"""))))
    val plain = st.search(vec(2), k = 3)
    assert(plain.columns.toSeq == Seq("id", "distance", "score", "metadata"))
    val top = plain.collect().head
    assert(top.getString(0) == "v2" && top.getString(3) == """{"i": 2}""")
    val withVec = st.search(vec(2), k = 3, includeVectors = true)
    assert(withVec.columns.contains("result_embedding"))
    assert(withVec.collect().head.getSeq[Float](4).length == 8)
    // threshold 1.0 keeps only score >= 1 (exact self-match, distance 0)
    val thr = st.search(vec(2), k = 10, metric = "l2", scoreThreshold = Some(0.99))
    assert(thr.collect().map(_.getString(0)).sameElements(Array("v2")))
    // no threshold given => nothing filtered, even for similarity metrics
    // whose distance is negative (dot: distance = -dot)
    val dot = st.search(vec(2), k = 3, metric = "dot")
    assert(dot.collect().length == 3)
    assert(dot.collect().forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1))
  }

  test("store works end-to-end through a file:///-qualified Hadoop path") {
    val st = new VectorStore(spark,
      "file://" + Files.createTempDirectory("graft_uri_").toString,
      Config(nClusters = 2))
    st.insert((0 until 12).map(i => VectorRecord(s"u$i", vec(i), Some(s"""{"i": $i}"""))))
    assert(st.stats().recentCount == 12)
    // exists/hasRows must see the qualified path (a java.nio check would
    // silently treat the populated store as empty)
    assert(st.search(vec(4), k = 1).collect().head.getString(0) == "u4")
    val del = st.deleteByMetadata("""{"i": {"$gte": 9}}""")
    assert(del.deletedCount == 3)
    assert(st.stats().recentCount == 9)
    val vac = st.vacuum()
    assert(vac.recentRemoved == 3)
    assert(st.readManifest().exists(_.dim == 8))
  }

  test("rebalance caps oversized historical clusters; backup clones the store") {
    import spark.implicits._
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_rb_").toString,
      Config(recentThresholdSeconds = 3600, nClusters = 3))
    val oldTs = java.time.Instant.now().minusSeconds(7200).toString
    st.insert((0 until 60).map(i => VectorRecord(s"r$i", vec(i), tsString = Some(oldTs))))
    assert(st.migrate() == 60)
    val before = st.historical.select("vid", "cluster_id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val sizesBefore = before.values.groupBy(identity).view.mapValues(_.size).toMap
    val maxSize = 12
    val oversized = sizesBefore.filter(_._2 > maxSize).keySet
    assert(oversized.nonEmpty) // 60 rows over 3 clusters must overflow somewhere
    val moved = st.rebalance(maxSize)
    assert(moved > 0)
    val after = st.historical.select("vid", "cluster_id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // the single-pass contract (like the reference's balance_clusters,
    // ivf/operations.rs:422-492): every oversized cluster KEEPS at most
    // maxSize of its own rows — incoming overflow from other clusters may
    // legitimately re-grow it; no row is lost
    oversized.foreach { c =>
      val kept = before.count { case (vid, c0) => c0 == c && after(vid) == c }
      assert(kept <= maxSize, s"cluster $c kept $kept of its rows")
    }
    assert(after.size == 60)

    // backup: byte-identical clone opens as a working store
    val target = Files.createTempDirectory("graft_bk_").toString + "/clone"
    assert(st.backup(target) > 0)
    val clone = new VectorStore(spark, target)
    assert(clone.stats().historicalCount == 60)
    assert(clone.search(vec(7), k = 1, metric = "l2").collect().head.getString(0) == "r7")
  }

  test("ageStats buckets live rows") {
    val st = new VectorStore(spark,
      Files.createTempDirectory("graft_age_").toString)
    val now = java.time.Instant.now()
    st.insert(Seq(
      VectorRecord("a", vec(1)),
      VectorRecord("b", vec(2), tsString = Some(now.minusSeconds(7200).toString)),
      VectorRecord("c", vec(3), tsString = Some(now.minusSeconds(2 * 604800).toString))))
    val buckets = st.ageStats().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets("lt_1h") == 1 && buckets("lt_1d") == 1 && buckets("ge_1w") == 1)
  }

  test("dropNearDuplicates keeps the smallest id per near-dup pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different content about spark query engines at scale"),
      (4L, "another unrelated document mentioning vectors and embeddings")
    ).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.dropNearDuplicates(
      docs, shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L) && kept.contains(4L))
  }
}
