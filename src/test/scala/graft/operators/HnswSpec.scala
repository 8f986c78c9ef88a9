package graft.operators

import graft.SparkSpec
import graft.operators.Hnsw.{Graph, HnswConfig}
import org.apache.spark.sql.functions._

/** HNSW conformance mirrored from the reference tests
  * (`/root/reference/tests/hnsw/core.rs`): self-retrieval, 2D geometric
  * ordering, ef monotonicity, deleted-node exclusion, plus distributed
  * recall vs the exact oracle (the per-partition contract).
  */
class HnswSpec extends SparkSpec {

  private def sinVec(i: Int, dim: Int = 16): Array[Float] =
    Array.tabulate(dim)(j => math.sin(i.toDouble * j).toFloat)

  test("local graph: self-retrieval over 100 sin-grid vectors") {
    val g = new Graph("l2", HnswConfig())
    (0 until 100).foreach(i => g.insert(i.toLong, sinVec(i)))
    (0 until 100).foreach { i =>
      val hits = g.search(sinVec(i), k = 1, ef = 50)
      assert(hits.head._1 == i.toLong, s"query $i returned ${hits.head}")
      assert(hits.head._2 < 1e-5)
    }
  }

  test("local graph: 2D compass k-NN ordering") {
    val g = new Graph("l2", HnswConfig())
    val pts = Seq(
      0L -> Array(0f, 0f), 1L -> Array(1f, 0f), 2L -> Array(0f, 1f),
      3L -> Array(-1f, 0f), 4L -> Array(0f, -1f), 5L -> Array(1f, 1f))
    pts.foreach { case (id, v) => g.insert(id, v) }
    val hits = g.search(Array(0.9f, 0.1f), k = 3, ef = 10)
    assert(hits.head._1 == 1L) // (1,0) closest
    assert(hits.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("local graph: higher ef does not reduce result quality") {
    val g = new Graph("l2", HnswConfig(efConstruction = 50))
    (0 until 300).foreach(i => g.insert(i.toLong, sinVec(i, 10)))
    val q = sinVec(42, 10)
    val lo = g.search(q, k = 10, ef = 10).map(_._2).sum
    val hi = g.search(q, k = 10, ef = 200).map(_._2).sum
    assert(hi <= lo + 1e-9) // larger beam finds equal-or-closer set
  }

  test("local graph: deleted nodes excluded from results but traversable") {
    val g = new Graph("l2", HnswConfig())
    (0 until 50).foreach(i => g.insert(i.toLong, sinVec(i)))
    assert(g.markDeleted(7L))
    assert(!g.markDeleted(999L))
    val hits = g.search(sinVec(7), k = 10, ef = 50)
    assert(!hits.map(_._1).contains(7L))
    assert(hits.length == 10)
  }

  test("FrozenGraph serde/maintenance fuzz: round-trips and compaction at every shape") {
    // adversarial graph shapes the corpus paths never build: empty,
    // single-node, tiny dims, none/some/ALL nodes deleted — the binary
    // layout's offsets (header, ids, vecs, adjacency, tombstone words)
    // must survive toBytes/fromBytes and a compact() at each of them
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 30) {
      val n = trial % 6 match {
        case 0 => 0
        case 1 => 1
        case 2 => 2
        case _ => 3 + rnd.nextInt(200)
      }
      val dim = Seq(1, 3, 8)(trial % 3)
      val g = new Graph(if (trial % 2 == 0) "l2" else "cosine", HnswConfig())
      val ids = (0 until n).map(_ => rnd.nextLong().abs).distinct
      ids.foreach(id => g.insert(id,
        Array.tabulate(dim)(j => (rnd.nextFloat() - 0.5f) + j)))
      val fg = Hnsw.FrozenGraph.fromBytes(g.freeze().toBytes)
      assert(fg.n == ids.size)
      // round-trip: a second serde pass must preserve search exactly
      val rt = Hnsw.FrozenGraph.fromBytes(fg.toBytes)
      val q = Array.tabulate(dim)(j => j.toFloat)
      assert(rt.search(q, 5, 32).toSeq == fg.search(q, 5, 32).toSeq,
        s"trial $trial: serde changed results")
      assert(Hnsw.FrozenGraph.peekIds(fg.toBytes).toSet == ids.toSet)
      // delete a random subset (possibly all), round-trip the tombstones
      val del = ids.filter(_ => rnd.nextInt(3) == 0) ++
        (if (trial % 7 == 0) ids else Nil) // periodically: delete ALL
      val found = fg.markDeleted(del)
      assert(found == del.distinct.size)
      val rtDel = Hnsw.FrozenGraph.fromBytes(fg.toBytes)
      val live = ids.toSet -- del
      assert(rtDel.search(q, ids.size + 1, 256).map(_._1).toSet.subsetOf(live),
        s"trial $trial: deleted id served after serde")
      // compact physically removes them; the compacted graph serdes too
      val c = fg.compact()
      assert(c.n == live.size && c.liveCount == live.size)
      val rtC = Hnsw.FrozenGraph.fromBytes(c.toBytes)
      val cHits = rtC.search(q, live.size + 1, 256).map(_._1).toSet
      if (live.isEmpty) assert(cHits.isEmpty,
        s"trial $trial: empty compacted graph served hits")
      else assert(cHits.subsetOf(live),
        s"trial $trial: compacted graph served a removed id")
    }
  }

  test("FrozenGraph.search: N threads on one SHARED graph match single-thread") {
    // the serving-cache pattern: one deserialized graph, many request
    // threads. Visit marks live in per-thread scratch — shared-instance
    // concurrent searches must be bit-identical to a single-thread run
    // (the old shared marks returned silently wrong neighbors here).
    val g = new Graph("l2", HnswConfig())
    (0 until 2000).foreach(i => g.insert(i.toLong, sinVec(i, 12)))
    val fg = Hnsw.FrozenGraph.fromBytes(g.freeze().toBytes)
    val queries = (0 until 64).map(i => sinVec(i * 31 + 7, 12))
    val expected = queries.map(q => fg.search(q, k = 10, ef = 80).toSeq)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        for (round <- 0 until 20; qi <- queries.indices) {
          val got = fg.search(queries(qi), k = 10, ef = 80).toSeq
          if (got != expected(qi))
            errors.add(s"thread $t round $round query $qi diverged")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"${errors.size} mismatches, first: ${errors.peek()}")
  }

  test("persisted graphs: save/load round-trip returns same results as live build") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding")).repartition(4)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_save_").toString + "/g"
    val cfg = HnswConfig(efSearch = 100)
    Hnsw.buildAndSave(corpus, path, cfg = cfg)
    val saved = Hnsw.searchSaved(spark, path, queries, k = 10, efSearch = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = Hnsw.searchBatch(corpus, queries, k = 10, cfg = cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(saved == live)
  }

  test("persisted graphs: delete -> search excludes -> insert -> vacuum compacts") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") < 400)
      .select(col("vec_id").as("id"), col("embedding")).repartition(4)
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_maint_").toString + "/g"
    val cfg = HnswConfig(efSearch = 100)
    Hnsw.buildAndSave(corpus, path, cfg = cfg)

    // self-query for a node we are about to delete: present before, gone after
    val q3 = emb.filter(col("vec_id") === 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def hitIds() = Hnsw.searchSaved(spark, path, q3, k = 10, efSearch = 100)
      .collect().map(_.getLong(1)).toSet
    assert(hitIds().contains(3L))
    assert(Hnsw.deleteFromSaved(spark, path, Seq(3L, 5L)) == 2L)
    assert(Hnsw.deleteFromSaved(spark, path, Seq(99999L)) == 0L)
    val afterDelete = hitIds()
    assert(!afterDelete.contains(3L) && !afterDelete.contains(5L))
    assert(afterDelete.size == 10) // beam traverses tombstones, results backfill

    // incremental insert: new rows become searchable without a rebuild
    val extra = emb.filter(col("vec_id").between(400, 449))
      .select(col("vec_id").as("id"), col("embedding")).repartition(2)
    Hnsw.insertIntoSaved(extra, path, cfg = cfg)
    val q400 = emb.filter(col("vec_id") === 400)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val hits400 = Hnsw.searchSaved(spark, path, q400, k = 1, efSearch = 100).collect()
    assert(hits400.head.getLong(1) == 400L && hits400.head.getDouble(2) < 1e-6)

    // vacuum physically removes tombstoned nodes and scrubs their edges
    assert(Hnsw.vacuumSaved(spark, path) == 2L)
    import spark.implicits._
    val total = spark.read.parquet(path).select(col("graph")).as[Array[Byte]]
      .collect().map { b =>
        val g = Hnsw.FrozenGraph.fromBytes(b)
        assert(g.deleted.isEmpty)
        val (_, _, _, _) = g.stats
        // no adjacency slot may reference an out-of-range node after the scrub
        assert(g.adj.forall(n => n >= 0 && n < g.n))
        assert(!g.ids.contains(3L) && !g.ids.contains(5L))
        g.n.toLong
      }.sum
    assert(total == 448L) // 400 - 2 deleted + 50 inserted
    val afterVacuum = hitIds()
    assert(!afterVacuum.contains(3L) && afterVacuum.size == 10)
  }

  test("stats: reference-exact active-only accounting (hnsw/operations.rs:227-272)") {
    val g = new Graph("l2", HnswConfig())
    val rnd = new scala.util.Random(7)
    (0L until 60L).foreach(id => g.insert(id,
      Array.tabulate(8)(j => rnd.nextFloat() + j)))
    val before = g.stats
    assert(before._1 == 60)
    // reference rule: avg_degree = 2*edges/nodes over ALL layers
    assert(math.abs(before._3 - 2.0 * before._2 / before._1) < 1e-12)
    val fg = Hnsw.FrozenGraph.fromBytes(g.freeze().toBytes)
    assert(fg.stats == before, "frozen stats != mutable stats on same graph")
    // delete a third: active-only node count; edges from live INTO the
    // tombstones still count (the reference does not filter them)
    val del = (0L until 60L by 3L)
    del.foreach(id => assert(g.markDeleted(id)))
    fg.markDeleted(del.toSeq)
    val after = g.stats
    assert(after._1 == 40)
    assert(fg.stats == after)
    assert(after._2 > 0 && after._2 <= before._2)
    // all deleted => zeroed stats including max layer
    val tiny = new Graph("l2", HnswConfig())
    tiny.insert(1L, Array(1f, 2f)); tiny.insert(2L, Array(3f, 4f))
    tiny.markDeleted(1L); tiny.markDeleted(2L)
    assert(tiny.stats == ((0, 0L, 0.0, 0)))
  }

  test("FrozenGraph.peek reads metric and live count from the header only") {
    val g = new Graph("cosine", HnswConfig())
    (0 until 40).foreach(i => g.insert(i.toLong, sinVec(i)))
    assert(g.markDeleted(3L) && g.markDeleted(17L))
    val bytes = g.freeze().toBytes
    assert(Hnsw.FrozenGraph.peek(bytes) == ((1, 38))) // cosine mc=1, 40-2 live
    val l2 = new Graph("l2", HnswConfig())
    (0 until 5).foreach(i => l2.insert(i.toLong, sinVec(i)))
    assert(Hnsw.FrozenGraph.peek(l2.freeze().toBytes) == ((0, 5)))
    intercept[IllegalArgumentException] {
      Hnsw.FrozenGraph.peek(Array.fill[Byte](64)(9))
    }
  }

  test("insertIntoSaved rejects metric mismatch and drops already-live ids") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("id"), col("embedding")).repartition(2)
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_dupins_").toString + "/g"
    Hnsw.buildAndSave(corpus, path)
    intercept[IllegalArgumentException] {
      Hnsw.insertIntoSaved(corpus, path, metric = "cosine")
    }
    // overlapping batch: only genuinely new ids build graphs
    val overlap = emb.filter(col("vec_id").between(50, 149))
      .select(col("vec_id").as("id"), col("embedding")).repartition(2)
    assert(Hnsw.insertIntoSaved(overlap, path) == 50L)
    import spark.implicits._
    val total = spark.read.parquet(path).select(col("graph")).as[Array[Byte]]
      .collect().map(b => Hnsw.FrozenGraph.peek(b)._2.toLong).sum
    assert(total == 150L)
    // a batch that repeats an id (union with itself, 2 partitions) must
    // insert each logical id once, not once per copy
    val doubled = emb.filter(col("vec_id").between(150, 159))
      .select(col("vec_id").as("id"), col("embedding"))
    assert(Hnsw.insertIntoSaved(doubled.union(doubled).repartition(2), path) == 10L)
    val total2 = spark.read.parquet(path).select(col("graph")).as[Array[Byte]]
      .collect().map(b => Hnsw.FrozenGraph.peek(b)._2.toLong).sum
    assert(total2 == 160L)
  }

  test("guards: duplicate build ids, ragged dims, int query ids, peekIds") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") < 60)
      .select(col("vec_id").as("id"), col("embedding")).repartition(2)
    // a repeated id may not land in two blobs — loud, not dropDuplicates
    // (dedup would repartition away a routed build's co-location)
    intercept[IllegalArgumentException] {
      Hnsw.buildAndSave(corpus.union(corpus),
        java.nio.file.Files.createTempDirectory("graft_hnsw_dup_").toString + "/g")
    }
    // ragged vectors fail at the offending row, not deep inside freeze
    val g = new Graph("l2", HnswConfig())
    g.insert(1L, Array(1f, 2f, 3f))
    intercept[IllegalArgumentException] { g.insert(2L, Array(1f, 2f)) }
    // cross-blob dim gate on the incremental path
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_dim_").toString + "/g"
    Hnsw.buildAndSave(corpus, path)
    import spark.implicits._
    val wrongDim = Seq((999L, Array.fill(3)(0.5f))).toDF("id", "embedding")
    intercept[org.apache.spark.SparkException] { // require fires in a task
      Hnsw.insertIntoSaved(wrongDim, path)
    }
    // an IntegerType query id must not ClassCastException at the collect
    val qInt = Seq((7, emb.filter(col("vec_id") === 7)
        .head.getAs[scala.collection.immutable.ArraySeq[Float]]("embedding").toArray))
      .toDF("query_id", "q_embedding")
    val hit = Hnsw.searchSaved(spark, path, qInt, k = 1, efSearch = 100).collect().head
    assert(hit.getLong(1) == 7L)
    // header-only id enumeration matches the full decode
    val blob = spark.read.parquet(path).select(col("graph")).as[Array[Byte]].head()
    val full = Hnsw.FrozenGraph.fromBytes(blob)
    val ids = (0 until full.n).filterNot(full.deleted.get).map(full.ids(_)).toSet
    assert(Hnsw.FrozenGraph.peekIds(blob).toSet == ids)
    // searches reject a query of the wrong dimension loudly
    intercept[IllegalArgumentException] { full.search(Array(1f, 2f), 1, 10) }
  }

  test("persisted graphs: compactSaved merges fragmented insert batches") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_frag_").toString + "/g"
    val cfg = HnswConfig(efSearch = 100)
    Hnsw.buildAndSave(emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("id"), col("embedding")).repartition(2), path, cfg = cfg)
    // 5 incremental batches of 20 rows -> 5+ tiny blobs
    (0 until 5).foreach { b =>
      Hnsw.insertIntoSaved(emb.filter(col("vec_id").between(200 + b * 20, 219 + b * 20))
        .select(col("vec_id").as("id"), col("embedding")).repartition(1), path, cfg = cfg)
    }
    val blobsBefore = spark.read.parquet(path).count()
    assert(blobsBefore >= 7)
    val merged = Hnsw.compactSaved(spark, path, minNodes = 150, targetNodes = 300, cfg = cfg)
    assert(merged >= 5, s"merged $merged")
    val blobsAfter = spark.read.parquet(path).count()
    assert(blobsAfter < blobsBefore, s"$blobsAfter vs $blobsBefore")
    // nothing lost: every id still searchable, self-retrieval intact
    import spark.implicits._
    val total = spark.read.parquet(path).select(col("graph")).as[Array[Byte]]
      .collect().map(b => Hnsw.FrozenGraph.fromBytes(b).liveCount.toLong).sum
    assert(total == 300L)
    val q = emb.filter(col("vec_id") === 250)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val top = Hnsw.searchSaved(spark, path, q, k = 1, efSearch = 100).collect().head
    assert(top.getLong(1) == 250L && top.getDouble(2) < 1e-9)
  }

  test("saved-index swap crash recovery: every entry point finishes a stranded swap") {
    // the pre-r10 swapDir had no marker: dying between its two renames
    // left the index stranded at _old/_tmp with nothing to restore it.
    // Simulate each crash state and require the next entry point to serve.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_swapcr_").toString + "/g"
    Hnsw.buildAndSave(emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("id"), col("embedding")).repartition(2), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val q = emb.filter(col("vec_id") === 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def top1(): org.apache.spark.sql.Row =
      Hnsw.searchSaved(spark, path, q, k = 1, efSearch = 100).collect().head
    // crash state A: marker written, live moved aside, tmp complete
    fs.rename(p, new org.apache.hadoop.fs.Path(path + "_tmp"))
    fs.create(new org.apache.hadoop.fs.Path(path + "_swap.inprogress"), true).close()
    val a = top1()
    assert(a.getLong(1) == 7L && a.getDouble(2) < 1e-9)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_swap.inprogress")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_tmp")))
    // crash state B: live renamed aside, marker live, tmp consumed-into-aside
    // (the old-data-aside shape: aside holds pre-swap data, tmp the new)
    fs.rename(p, new org.apache.hadoop.fs.Path(path + "_old"))
    fs.create(new org.apache.hadoop.fs.Path(path + "_swap.inprogress"), true).close()
    // no tmp: recovery must restore the aside rather than read nothing
    val b = top1()
    assert(b.getLong(1) == 7L && b.getDouble(2) < 1e-9)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_old")))
    // maintenance entry points recover too, not only search
    fs.rename(p, new org.apache.hadoop.fs.Path(path + "_tmp"))
    fs.create(new org.apache.hadoop.fs.Path(path + "_swap.inprogress"), true).close()
    val removed = Hnsw.deleteFromSaved(spark, path, Seq(7L))
    assert(removed == 1L)
    assert(Hnsw.searchSaved(spark, path, q, k = 1, efSearch = 100)
      .collect().head.getLong(1) != 7L)
  }

  test("saved graphs: 100% self-retrieval at rank 1 (the ann_hnsw_scale oracle contract)") {
    // mirrors the driver-checked oracle locally so a graph-quality
    // regression fails here before it fails the correctness gate
    val path = graft.queries.AnnQueries.ensureHnswScaleIndex(spark, sfDir)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val top1 = Hnsw.searchSaved(spark, path, queries, k = 10, efSearch = 120)
      .filter(col("rank") === 1).collect()
    assert(top1.length == 50)
    top1.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) * 50, s"query ${r.getLong(0)} top-1 ${r.getLong(1)}")
      assert(r.getDouble(2) == 0.0)
    }
  }

  test("searchSaved with allowed-id filter: only allowed ids, recall holds via oversampling") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding")).repartition(4)
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_filt_").toString + "/g"
    Hnsw.buildAndSave(corpus, path, cfg = HnswConfig(efConstruction = 100))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val allowed = corpus.filter(col("id") % 2 === 0).select("id")
    val hits = Hnsw.searchSaved(spark, path, queries, k = 10, efSearch = 120,
      allowed = Some(allowed), oversample = 3)
    assert(hits.filter(col("id") % 2 =!= 0).isEmpty, "filter leaked a disallowed id")
    // recall vs the exact filtered oracle: k*3 oversampling at ~50%
    // selectivity must keep most of the true filtered top-k
    val exact = Knn.batch(corpus.filter(col("id") % 2 === 0), queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(hits, exact).head().getDouble(0)
    assert(recall >= 0.8, s"filtered hnsw recall $recall")
  }

  test("searchSaved blob routing: cluster-partitioned build keeps recall at probeBlobs << #blobs") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // co-locate GEOMETRICALLY similar vectors (KMeans clusters — labels are
    // semantic and scatter true neighbors): blob routing centroids then
    // genuinely differ, which is routing's precondition
    val base = emb.select(col("vec_id").as("id"), col("embedding"))
    val cents = Ivf.train(base,
      Ivf.IvfConfig(nClusters = 10, maxIterations = 10, initMode = "driver"))
    val corpus = Ivf.assign(base, cents)
      .repartition(10, col("cluster_id")).drop("cluster_id")
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_route_").toString + "/g"
    Hnsw.buildAndSave(corpus, path, cfg = HnswConfig(efConstruction = 100))
    // 20 queries: per-query routed recall at probeBlobs=3/10 swings with
    // the k-means draw (a true neighbor in a 4th-nearest blob is simply
    // missed), so gate the wider aggregate rather than a 10-query sample
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val routed = Hnsw.searchSaved(spark, path, queries, k = 10, efSearch = 120,
      probeBlobs = 3)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(routed, exact).head().getDouble(0)
    assert(recall >= 0.65, s"routed recall $recall")
    // self-retrieval survives routing: the query's own blob is its nearest
    val top1 = routed.filter(col("rank") === 1).collect()
    top1.foreach(r => assert(r.getLong(1) == r.getLong(0), s"query ${r.getLong(0)}"))
    // the query-batch bound is enforced
    intercept[IllegalArgumentException] {
      Hnsw.searchSaved(spark, path, queries, k = 10, maxQueryBatch = 5)
    }
  }

  test("distributed searchBatch: recall >= 0.9 vs exact oracle on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding")).repartition(4)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val approx = Hnsw.searchBatch(corpus, queries, k = 10,
      cfg = HnswConfig(efSearch = 100))
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    assert(recall >= 0.9, s"hnsw recall $recall")
  }

  test("searchBatch rejects an oversized query batch before collecting it") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
    val queries = emb
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val e = intercept[IllegalArgumentException] {
      Hnsw.searchBatch(corpus, queries, k = 5, maxQueryBatch = 3)
    }
    assert(e.getMessage.contains("chunk the batch upstream"), e.getMessage)
  }

  test("checkSavedIntegrity: full-decode pass, corrupt blob detected, read-only") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_integ_").toString + "/g"
    Hnsw.buildAndSave(emb.filter(col("vec_id") < 120)
      .select(col("vec_id").as("id"), col("embedding")).repartition(3), path)
    Hnsw.deleteFromSaved(spark, path, Seq(5L, 17L))
    val clean = Hnsw.checkSavedIntegrity(spark, path)
    assert(clean.isComplete && clean.badBlobs == 0L)
    assert(clean.nodes == 120L && clean.live == 118L)
    // a truncated/garbage blob row appended out-of-band fails the full
    // decode and flips isComplete — the RecoveryInfo missing_chunks analog
    Seq((999L, Array.fill[Byte](40)(7), Array.empty[Float]))
      .toDF("part_id", "graph", "centroid")
      .write.mode("append").parquet(path)
    val dirty = Hnsw.checkSavedIntegrity(spark, path)
    assert(!dirty.isComplete && dirty.badBlobs == 1L && dirty.blobs == clean.blobs + 1)
    assert(dirty.nodes == 120L) // good blobs still counted
    // absent path: reported, never created (the probe is read-only)
    val missing = java.nio.file.Files.createTempDirectory("graft_hnsw_integ2_").toString + "/none"
    assert(Hnsw.checkSavedIntegrity(spark, missing)
      == Hnsw.SavedIntegrity(0L, 0L, 0L, 0L, false))
    assert(!new java.io.File(missing).exists())
  }
}
