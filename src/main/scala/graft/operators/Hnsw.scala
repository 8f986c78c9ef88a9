package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** HNSW — the recent-tier ANN of the reference (SURVEY.md §2.9 X1-X5,
  * `/root/reference/src/hnsw/core.rs`), as a Spark-native batch operator.
  *
  * The graph is inherently sequential and pointer-chasing, so it cannot be
  * a DataFrame expression; the Spark-first formulation is: build one
  * partition-local graph per corpus partition inside `mapPartitions`
  * (JVM-heap arrays, zero driver involvement), search the whole broadcast
  * query batch against each local graph, and merge per-partition top-k
  * globally with the grouped top-k aggregator (T4). Build cost is amortized
  * over the entire query batch; recall is validated against the exact
  * oracle (per-partition graphs change topology vs the reference's single
  * global graph, so recall — not structure — is the contract).
  *
  * Algorithm parity notes (own implementation, same semantics):
  *  - geometric level assignment with mL = 1/ln(M), deterministic per id
  *    (hash-seeded, so builds are reproducible; `hnsw/core.rs:211-224`)
  *  - insert: greedy descent (ef=1) above the node's level, then
  *    ef_construction beam search + connect M (M0 at layer 0) with neighbor
  *    pruning on overflow (`hnsw/core.rs:226-378`)
  *  - search: descent to layer 0, beam width ef, soft-deleted nodes are
  *    traversed but excluded from results (F10, `hnsw/core.rs:450-461`)
  */
object Hnsw {

  /** Reference defaults `hnsw/core.rs:37-46`. */
  case class HnswConfig(m: Int = 16, m0: Int = 32, efConstruction: Int = 200,
      efSearch: Int = 50, seed: Long = 42L)

  /** Partition-local HNSW graph over dense float vectors. */
  final class Graph(metric: String, cfg: HnswConfig) extends Serializable {
    private val ids = mutable.ArrayBuffer[Long]()
    private val vecs = mutable.ArrayBuffer[Array[Float]]()
    private val levels = mutable.ArrayBuffer[Int]()
    // neighbors(node)(level) -> ArrayBuffer[node]
    private val nbrs = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
    private val deleted = mutable.BitSet()
    private var entry: Int = -1
    private var maxLevel: Int = -1
    private val mL = 1.0 / math.log(cfg.m)

    def size: Int = ids.length

    private def dist(a: Array[Float], b: Array[Float]): Double = metric match {
      case "l2" =>
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
        math.sqrt(s)
      case "cosine" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
      case m => throw new IllegalArgumentException(s"unsupported hnsw metric: $m")
    }

    /** Deterministic geometric level from the id hash. */
    private def levelFor(id: Long): Int = {
      val h = scala.util.hashing.byteswap64(id ^ cfg.seed)
      val u = ((h >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
      math.min((-math.log(u) * mL).toInt, 32)
    }

    /** Beam search on one layer from one entry point. Returns up to ef
      * (node, dist) pairs, closest first. */
    private def searchLayer(q: Array[Float], ep: Int, ef: Int, level: Int): mutable.ArrayBuffer[(Int, Double)] = {
      val visited = mutable.BitSet(ep)
      // candidates: min-heap by dist; results: max-heap bounded ef
      val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(x => -x._1))
      val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
      val d0 = dist(q, vecs(ep))
      cand.enqueue((d0, ep)); res.enqueue((d0, ep))
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (dc > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          val ns = nbrs(c)(level)
          var i = 0
          while (i < ns.length) {
            val n = ns(i)
            if (!visited.contains(n)) {
              visited.add(n)
              val dn = dist(q, vecs(n))
              if (res.size < ef || dn < res.head._1) {
                cand.enqueue((dn, n)); res.enqueue((dn, n))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      val out = mutable.ArrayBuffer.from(res.toSeq.map(x => (x._2, x._1)))
      out.sortInPlaceBy(_._2)
    }

    private def connect(a: Int, b: Int, level: Int): Unit = {
      nbrs(a)(level) += b
      nbrs(b)(level) += a
      pruneIfNeeded(a, level); pruneIfNeeded(b, level)
    }

    private def pruneIfNeeded(node: Int, level: Int): Unit = {
      val cap = if (level == 0) cfg.m0 else cfg.m
      val ns = nbrs(node)(level)
      if (ns.length > cap) {
        val v = vecs(node)
        val kept = ns.map(n => (n, dist(v, vecs(n)))).sortInPlaceBy(_._2).take(cap).map(_._1)
        nbrs(node)(level) = mutable.ArrayBuffer.from(kept)
      }
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      val node = ids.length
      val lvl = levelFor(id)
      ids += id; vecs += v; levels += lvl
      nbrs += Array.fill(lvl + 1)(mutable.ArrayBuffer[Int]())
      if (entry < 0) { entry = node; maxLevel = lvl; return }
      var curr = entry
      // greedy descent above the node's level
      var l = maxLevel
      while (l > lvl) {
        var improved = true
        var best = dist(v, vecs(curr))
        while (improved) {
          improved = false
          val ns = nbrs(curr)(l)
          var i = 0
          while (i < ns.length) {
            val d = dist(v, vecs(ns(i)))
            if (d < best) { best = d; curr = ns(i); improved = true }
            i += 1
          }
        }
        l -= 1
      }
      // beam search + connect at each level from min(lvl, maxLevel) down
      l = math.min(lvl, maxLevel)
      while (l >= 0) {
        val found = searchLayer(v, curr, cfg.efConstruction, l)
        val cap = if (l == 0) cfg.m0 else cfg.m
        found.take(cap).foreach { case (n, _) => connect(node, n, l) }
        curr = found.head._1
        l -= 1
      }
      if (lvl > maxLevel) { entry = node; maxLevel = lvl }
    }

    def markDeleted(id: Long): Boolean = {
      val idx = ids.indexOf(id)
      if (idx >= 0) { deleted.add(idx); true } else false
    }

    /** A8 graph statistics (`hnsw/operations.rs:227-272`): node/edge
      * counts, average layer-0 degree, max layer. */
    def stats: (Int, Long, Double, Int) = {
      val nodes = ids.length
      val edges = nbrs.iterator.map(_.iterator.map(_.length.toLong).sum).sum / 2
      val avgDeg = if (nodes == 0) 0.0
        else nbrs.iterator.map(n => n(0).length.toDouble).sum / nodes
      (nodes, edges, avgDeg, maxLevel)
    }

    /** k-NN search; deleted nodes traversed but filtered from results. */
    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      var curr = entry
      var l = maxLevel
      while (l > 0) {
        curr = searchLayer(q, curr, 1, l).head._1
        l -= 1
      }
      searchLayer(q, curr, math.max(ef, k), 0)
        .filterNot { case (n, _) => deleted.contains(n) }
        .take(k).map { case (n, d) => (ids(n), d) }.toSeq
    }
  }

  /** S3/S4 analog for the graph tier: build one graph per partition and
    * persist each as a serialized blob row (partition_id, graph BINARY) —
    * the counterpart of the reference's hnsw_nodes.cbor
    * (`hnsw/persistence.rs:96-185`), except the graphs load straight back
    * into executors with no O(N·C) reconstruction. */
  def buildAndSave(corpus: DataFrame, path: String, metric: String = "l2",
      cfg: HnswConfig = HnswConfig(), idCol: String = "id",
      embCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val g = new Graph(metric, cfg)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else {
          val bos = new java.io.ByteArrayOutputStream()
          val oos = new java.io.ObjectOutputStream(bos)
          oos.writeObject(g); oos.close()
          Iterator(bos.toByteArray)
        }
      }
      .toDF("graph")
      .withColumn("part_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(path)
  }

  /** Search previously persisted partition graphs: one task per graph blob,
    * global top-k merge. */
  def searchSaved(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, efSearch: Int = 50,
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding"): DataFrame = {
    import spark.implicits._
    val qRows = queries.select(col(queryIdCol), col(queryEmbCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qB = spark.sparkContext.broadcast(qRows)
    val partial = spark.read.parquet(path)
      .select(col("graph")).as[Array[Byte]]
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { bytes =>
        val g = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
          .readObject().asInstanceOf[Graph]
        qB.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k, efSearch).map { case (id, d) => (qid, id, d) }
        }
      }
      .toDF(queryIdCol, "id", "distance")
    val topk = TopK.topK(k)
    partial.groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Batch ANN search: per-partition graph build + broadcast query batch +
    * global top-k merge. Returns (query_id, id, distance, rank). */
  def searchBatch(corpus: DataFrame, queries: DataFrame, k: Int,
      metric: String = "l2", cfg: HnswConfig = HnswConfig(),
      idCol: String = "id", embCol: String = "embedding",
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(queryIdCol), col(queryEmbCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qB = spark.sparkContext.broadcast(qRows)
    val partial = corpus.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val g = new Graph(metric, cfg)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else qB.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k, cfg.efSearch).map { case (id, d) => (qid, id, d) }
        }
      }
      .toDF(queryIdCol, "id", "distance")
    val topk = TopK.topK(k)
    partial.groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).cast("long").as("rank"))
  }
}
