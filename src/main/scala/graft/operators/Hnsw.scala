package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * globally with the grouped top-k aggregator (T4). Recall is validated
  * against the exact oracle (per-partition graphs change topology vs the
  * reference's single global graph, so recall — not structure — is the
  * contract).
  *
  * Two lifecycles:
  *  - [[searchBatch]] builds throwaway graphs inside the query — only for
  *    one-shot corpora. Build cost is O(N log N) per query batch.
  *  - [[buildAndSave]] / [[searchSaved]] persist one [[FrozenGraph]] blob
  *    per partition (the counterpart of the reference's hnsw_nodes.cbor,
  *    `hnsw/persistence.rs:96-185`) and serve any number of query batches
  *    from the saved index; [[deleteFromSaved]] / [[insertIntoSaved]] /
  *    [[vacuumSaved]] maintain it incrementally the way the reference
  *    deletes from and compacts a live graph
  *    (`hnsw/operations.rs:127-200`).
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

  private def metricCode(metric: String): Int = metric match {
    case "l2" => 0
    case "cosine" => 1
    case m => throw new IllegalArgumentException(s"unsupported hnsw metric: $m")
  }

  /** Primitive-array binary min-heap over (dist, node) — replaces
    * `mutable.PriorityQueue[(Double, Int)]`, whose boxed tuple allocations
    * dominated graph-build time. For max-heap behavior push negated
    * distances. */
  private[operators] final class DIHeap(initCap: Int) {
    private var ds = new Array[Double](math.max(initCap, 8))
    private var ns = new Array[Int](ds.length)
    private var sz = 0
    def size: Int = sz
    def nonEmpty: Boolean = sz > 0
    def topDist: Double = ds(0)
    def topNode: Int = ns(0)
    def push(d: Double, node: Int): Unit = {
      if (sz == ds.length) {
        ds = java.util.Arrays.copyOf(ds, sz * 2)
        ns = java.util.Arrays.copyOf(ns, sz * 2)
      }
      var i = sz; sz += 1
      while (i > 0 && ds((i - 1) / 2) > d) {
        val p = (i - 1) / 2
        ds(i) = ds(p); ns(i) = ns(p); i = p
      }
      ds(i) = d; ns(i) = node
    }
    def pop(): Unit = {
      sz -= 1
      if (sz == 0) return
      val d = ds(sz); val n = ns(sz)
      var i = 0
      var c = 1
      var done = false
      while (!done && c < sz) {
        if (c + 1 < sz && ds(c + 1) < ds(c)) c += 1
        if (ds(c) >= d) done = true
        else { ds(i) = ds(c); ns(i) = ns(c); i = c; c = 2 * i + 1 }
      }
      ds(i) = d; ns(i) = n
    }
  }

  private def distArr(mc: Int, a: Array[Float], b: Array[Float]): Double = {
    if (mc == 0) {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    } else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 1.0 else 1.0 - dot / den
    }
  }

  /** Mutable build-time HNSW graph over dense float vectors. Freeze to a
    * [[FrozenGraph]] for searching at scale and for persistence. */
  final class Graph(metric: String, cfg: HnswConfig) extends Serializable {
    private val mc = metricCode(metric)
    private val ids = mutable.ArrayBuffer[Long]()
    private val vecs = mutable.ArrayBuffer[Array[Float]]()
    private val levels = mutable.ArrayBuffer[Int]()
    // neighbors(node)(level) -> ArrayBuffer[node]
    private val nbrs = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
    private val deleted = mutable.BitSet()
    private var entry: Int = -1
    private var maxLevel: Int = -1
    private val mL = 1.0 / math.log(cfg.m)

    // generation-stamped visited marks, reused across every searchLayer
    // call: a fresh n-bit set per call would memset O(n) on each of the
    // O(n log n) build searches
    private var visitMark = new Array[Int](1024)
    private var visitStamp = 0

    def size: Int = ids.length

    private def dist(a: Array[Float], b: Array[Float]): Double = distArr(mc, a, b)

    /** Deterministic geometric level from the id hash (splitmix64
      * finalizer — byteswap64 left small id^seed values unmixed, handing
      * one id a 13-level tower). */
    private def levelFor(id: Long): Int = {
      var z = (id ^ cfg.seed) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val u = ((z >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
      math.min((-math.log(u) * mL).toInt, 32)
    }

    /** Neighbor-diversity selection (Malkov & Yashunin alg. 4): walk the
      * candidates ascending by distance to the base, keep c only if it is
      * closer to the base than to every already-kept neighbor, then backfill
      * with the nearest rejected. Plain keep-closest pruning saturates every
      * node with one dense cluster's edges and fragments the graph (measured
      * ~8% self-retrieval misses at 3K nodes; this brings it to ~0).
      * Primitive arrays in/out — this runs on every insert level and every
      * overflow prune, so no boxed tuples. */
    private def selectDiverse(candN: Array[Int], candD: Array[Double], n: Int,
        cap: Int): mutable.ArrayBuffer[Int] = {
      val kept = new mutable.ArrayBuffer[Int](cap)
      val rejected = new mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < n && kept.length < cap) {
        val c = candN(i); val dBase = candD(i)
        val cv = vecs(c)
        var diverse = true
        var j = 0
        while (diverse && j < kept.length) {
          if (dist(cv, vecs(kept(j))) < dBase) diverse = false
          j += 1
        }
        if (diverse) kept += c else rejected += c
        i += 1
      }
      var r = 0
      while (kept.length < cap && r < rejected.length) { kept += rejected(r); r += 1 }
      kept
    }

    /** Beam search on one layer from one entry point. Fills candN/candD
      * (closest first) and returns the count — primitive arrays, no boxed
      * pairs on the build hot path. */
    private def searchLayer(q: Array[Float], ep: Int, ef: Int, level: Int,
        candN: Array[Int], candD: Array[Double]): Int = {
      if (visitMark.length < ids.length)
        visitMark = new Array[Int](math.max(ids.length * 2, 1024))
      visitStamp += 1
      val stamp = visitStamp
      visitMark(ep) = stamp
      val cand = new DIHeap(ef + 1) // min-heap by dist
      val res = new DIHeap(ef + 1)  // max-heap by dist (negated)
      val d0 = dist(q, vecs(ep))
      cand.push(d0, ep); res.push(-d0, ep)
      var break = false
      while (!break && cand.nonEmpty) {
        val dc = cand.topDist; val c = cand.topNode; cand.pop()
        if (res.size >= ef && dc > -res.topDist) break = true
        else {
          val ns = nbrs(c)(level)
          var i = 0
          while (i < ns.length) {
            val n = ns(i)
            if (visitMark(n) != stamp) {
              visitMark(n) = stamp
              val dn = dist(q, vecs(n))
              if (res.size < ef || dn < -res.topDist) {
                cand.push(dn, n); res.push(-dn, n)
                if (res.size > ef) res.pop()
              }
            }
            i += 1
          }
        }
      }
      // drain worst-first into the tail so the output reads closest-first
      val n = res.size
      var i = n - 1
      while (res.nonEmpty) {
        candN(i) = res.topNode; candD(i) = -res.topDist; res.pop(); i -= 1
      }
      n
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
        val n = ns.length
        val cn = new Array[Int](n); val cd = new Array[Double](n)
        var i = 0
        while (i < n) { cn(i) = ns(i); cd(i) = dist(v, vecs(ns(i))); i += 1 }
        // insertion sort ascending by dist (n = cap + 1, tiny)
        i = 1
        while (i < n) {
          val dk = cd(i); val nk = cn(i)
          var j = i - 1
          while (j >= 0 && cd(j) > dk) { cd(j + 1) = cd(j); cn(j + 1) = cn(j); j -= 1 }
          cd(j + 1) = dk; cn(j + 1) = nk
          i += 1
        }
        nbrs(node)(level) = selectDiverse(cn, cd, n, cap)
      }
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      // ragged input guard: a shorter vector would silently compare only
      // its prefix (wrong distances, no error); a longer one would crash
      // deep inside freeze/dist instead of at the offending row
      require(v != null && (ids.isEmpty || v.length == vecs(0).length),
        s"vector dim ${if (v == null) "null" else v.length} != graph dim " +
          s"${if (ids.isEmpty) "?" else vecs(0).length} (id $id)")
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
      // beam search + diverse-connect at each level from min(lvl, maxLevel)
      val candN = new Array[Int](cfg.efConstruction + 1)
      val candD = new Array[Double](cfg.efConstruction + 1)
      l = math.min(lvl, maxLevel)
      while (l >= 0) {
        val cnt = searchLayer(v, curr, cfg.efConstruction, l, candN, candD)
        val cap = if (l == 0) cfg.m0 else cfg.m
        selectDiverse(candN, candD, cnt, cap).foreach(n => connect(node, n, l))
        curr = candN(0)
        l -= 1
      }
      if (lvl > maxLevel) { entry = node; maxLevel = lvl }
    }

    def markDeleted(id: Long): Boolean = {
      val idx = ids.indexOf(id)
      if (idx >= 0) { deleted.add(idx); true } else false
    }

    /** A8 graph statistics, reference-EXACT (`hnsw/operations.rs:227-272`):
      * computed over ACTIVE (non-deleted) nodes only — node count, edge
      * count summed across ALL layers of live nodes (edges pointing at
      * tombstoned neighbors still count, as in the reference) with the
      * reference's integer halving, avg_degree = 2·edges/nodes, and
      * max layer over live nodes (0 when none). */
    def stats: (Int, Long, Double, Int) = {
      var nodes = 0; var edgeEnds = 0L; var maxLvl = 0
      var i = 0
      while (i < ids.length) {
        if (!deleted.contains(i)) {
          nodes += 1
          if (levels(i) > maxLvl) maxLvl = levels(i)
          val byLevel = nbrs(i)
          var l = 0
          while (l < byLevel.length) { edgeEnds += byLevel(l).length; l += 1 }
        }
        i += 1
      }
      val edges = edgeEnds / 2
      val avgDeg = if (nodes == 0) 0.0 else (edges * 2).toDouble / nodes
      (nodes, edges, avgDeg, if (nodes == 0) 0 else maxLvl)
    }

    /** k-NN search; deleted nodes traversed but filtered from results. */
    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      val beam = math.max(ef, k)
      val candN = new Array[Int](beam + 1)
      val candD = new Array[Double](beam + 1)
      var curr = entry
      var l = maxLevel
      while (l > 0) {
        searchLayer(q, curr, 1, l, candN, candD)
        curr = candN(0)
        l -= 1
      }
      val cnt = searchLayer(q, curr, beam, 0, candN, candD)
      (0 until cnt).filterNot(i => deleted.contains(candN(i)))
        .map(i => (ids(candN(i)), candD(i)))
        .sortBy { case (id, d) => (d, id) }
        .take(k)
    }

    /** Flatten into the immutable primitive-array form used for search and
      * persistence. */
    def freeze(): FrozenGraph = {
      val n = ids.length
      val dim = if (n == 0) 0 else vecs(0).length
      val idArr = ids.toArray
      val lvlArr = levels.toArray
      val slotBase = new Array[Int](n + 1)
      var i = 0
      while (i < n) { slotBase(i + 1) = slotBase(i) + lvlArr(i) + 1; i += 1 }
      val slots = slotBase(n)
      val slotOff = new Array[Int](slots + 1)
      var s = 0
      i = 0
      while (i < n) {
        var l = 0
        while (l <= lvlArr(i)) {
          s += nbrs(i)(l).length
          slotOff(slotBase(i) + l + 1) = s
          l += 1
        }
        i += 1
      }
      val adj = new Array[Int](s)
      i = 0
      while (i < n) {
        var l = 0
        while (l <= lvlArr(i)) {
          val lst = nbrs(i)(l)
          var p = slotOff(slotBase(i) + l)
          var j = 0
          while (j < lst.length) { adj(p) = lst(j); p += 1; j += 1 }
          l += 1
        }
        i += 1
      }
      val flat = new Array[Float](n * dim)
      i = 0
      while (i < n) { System.arraycopy(vecs(i), 0, flat, i * dim, dim); i += 1 }
      val del = new java.util.BitSet(n)
      deleted.foreach(del.set)
      new FrozenGraph(mc, dim, idArr, lvlArr, flat, slotBase, slotOff, adj,
        del, entry, maxLevel)
    }
  }

  /** Immutable flat-array HNSW graph: CSR-style adjacency (node n's level-l
    * neighbor list lives at `adj[slotOff(slotBase(n)+l) ..
    * slotOff(slotBase(n)+l+1))`), vectors flattened row-major, soft deletes
    * in a bitset. Custom binary (de)serialization — no Java-serialized boxed
    * collections — so a persisted partition graph loads straight back into
    * primitive arrays. */
  final class FrozenGraph(
      val mc: Int, val dim: Int,
      val ids: Array[Long], val levels: Array[Int], val vecs: Array[Float],
      val slotBase: Array[Int], val slotOff: Array[Int], val adj: Array[Int],
      val deleted: java.util.BitSet, val entry: Int, val maxLevel: Int)
    extends Serializable {

    def n: Int = ids.length
    def liveCount: Int = n - deleted.cardinality()

    /** Mean of live vectors — the blob's routing centroid (stored beside
      * the blob so [[Hnsw.searchSaved]] can route queries to the nearest
      * blobs instead of probing all of them). Zero vector when empty. */
    def liveCentroid: Array[Float] = {
      val sum = new Array[Double](dim)
      var cnt = 0; var i = 0
      while (i < n) {
        if (!deleted.get(i)) {
          val off = i * dim; var j = 0
          while (j < dim) { sum(j) += vecs(off + j); j += 1 }
          cnt += 1
        }
        i += 1
      }
      if (cnt == 0) new Array[Float](dim)
      else Array.tabulate(dim)(j => (sum(j) / cnt).toFloat)
    }

    private def dist(q: Array[Float], node: Int): Double = {
      val off = node * dim
      if (mc == 0) {
        var s = 0.0; var i = 0
        while (i < dim) { val d = q(i).toDouble - vecs(off + i).toDouble; s += d * d; i += 1 }
        math.sqrt(s)
      } else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dim) {
          val x = q(i).toDouble; val y = vecs(off + i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
      }
    }

    /** Greedy descent (ef=1) on one layer. */
    private def greedy(q: Array[Float], ep: Int, level: Int): Int = {
      var curr = ep
      var best = dist(q, curr)
      var improved = true
      while (improved) {
        improved = false
        var s = slotOff(slotBase(curr) + level)
        val e = slotOff(slotBase(curr) + level + 1)
        while (s < e) {
          val nb = adj(s)
          val d = dist(q, nb)
          if (d < best) { best = d; curr = nb; improved = true }
          s += 1
        }
      }
      curr
    }

    // generation-stamped visit marks, same trick as Graph's (a fresh
    // BitSet(n) per search memsets O(n) bytes for a walk that visits
    // ~ef*M nodes — at 100K nodes x 10K broadcast queries per blob task
    // that is ~125 MB of pure zeroing). Held in a ThreadLocal scratch so
    // the marks are MECHANICALLY thread-confined: a serving layer that
    // caches one deserialized graph across request threads (the natural
    // pattern at scale) gets correct concurrent searches instead of the
    // silently-wrong neighbors shared mutable marks produced. On the
    // Spark task path (one thread per deserialized graph) this costs one
    // array allocation per thread, reused across every search — identical
    // to the old instance-field behavior.
    //
    // The scratch deliberately does NOT nest in FrozenGraph (n arrives as
    // a constructor arg, see the companion's VisitScratch): an inner
    // class's $outer would make each thread's ThreadLocalMap VALUE
    // strongly reach this graph AND (via this.visitScratch) its own
    // ThreadLocal KEY — the weak key could then never clear, pinning
    // every graph a pooled executor/serving thread ever searched until
    // the thread dies. With an outer-free value, an unreachable graph's
    // ThreadLocal is only weakly reachable and the entry expunges.
    private val visitScratch: ThreadLocal[FrozenGraph.VisitScratch] = {
      val nn = n // capture the int, not `this`, in the initializer
      ThreadLocal.withInitial(() => new FrozenGraph.VisitScratch(nn))
    }

    /** k-NN search; deleted nodes traversed but excluded from results.
      * Returns (id, dist) ascending by (dist, id), length <= k.
      *
      * Thread-safe for CONCURRENT SEARCHES on one shared graph: the visit
      * marks live in a per-thread scratch, and everything else read here
      * is frozen at construction. MUTATIONS ([[markDeleted]], and
      * [[compact]]'s rebuild) remain single-writer — they follow the
      * store's writer-lease contract, never the serving path. */
    def search(q: Array[Float], k: Int, ef: Int): Array[(Long, Double)] = {
      if (n == 0 || entry < 0) return Array.empty
      require(q.length == dim,
        s"query dim ${q.length} != index dim $dim")
      var curr = entry
      var l = maxLevel
      while (l > 0) { curr = greedy(q, curr, l); l -= 1 }
      val beam = math.max(ef, k)
      val scratch = visitScratch.get()
      scratch.stamp += 1
      if (scratch.stamp == Int.MaxValue) { // wrapped: reset marks once
        java.util.Arrays.fill(scratch.mark, 0); scratch.stamp = 1
      }
      val stamp = scratch.stamp
      val visited = scratch.mark
      visited(curr) = stamp
      val cand = new DIHeap(beam + 1)
      val res = new DIHeap(beam + 1)
      val d0 = dist(q, curr)
      cand.push(d0, curr); res.push(-d0, curr)
      var break = false
      while (!break && cand.nonEmpty) {
        val dc = cand.topDist; val c = cand.topNode; cand.pop()
        if (res.size >= beam && dc > -res.topDist) break = true
        else {
          var s = slotOff(slotBase(c))
          val e = slotOff(slotBase(c) + 1)
          while (s < e) {
            val nb = adj(s)
            if (visited(nb) != stamp) {
              visited(nb) = stamp
              val dn = dist(q, nb)
              if (res.size < beam || dn < -res.topDist) {
                cand.push(dn, nb); res.push(-dn, nb)
                if (res.size > beam) res.pop()
              }
            }
            s += 1
          }
        }
      }
      val out = mutable.ArrayBuffer[(Long, Double)]()
      while (res.nonEmpty) {
        val node = res.topNode; val d = -res.topDist; res.pop()
        if (!deleted.get(node)) out += ((ids(node), d))
      }
      out.sortInPlaceBy { case (id, d) => (d, id) }
      out.take(k).toArray
    }

    private lazy val idIndex: java.util.HashMap[Long, Int] = {
      val m = new java.util.HashMap[Long, Int](n * 2)
      var i = 0
      while (i < n) { m.put(ids(i), i); i += 1 }
      m
    }

    /** Soft-delete by external id; returns how many were found. */
    def markDeleted(del: Iterable[Long]): Int = {
      var found = 0
      del.foreach { id =>
        val node = idIndex.getOrDefault(id, -1)
        if (node >= 0 && !deleted.get(node)) { deleted.set(node); found += 1 }
      }
      found
    }

    /** Physically remove soft-deleted nodes: renumber survivors, drop every
      * edge touching a deleted node (dangling-edge scrub, the analog of
      * `hnsw/operations.rs:127-200`), re-pick the entry as the highest-level
      * survivor. */
    def compact(): FrozenGraph = {
      if (deleted.isEmpty) return this
      val remap = new Array[Int](n)
      java.util.Arrays.fill(remap, -1)
      var kept = 0
      var i = 0
      while (i < n) { if (!deleted.get(i)) { remap(i) = kept; kept += 1 }; i += 1 }
      val nIds = new Array[Long](kept)
      val nLvl = new Array[Int](kept)
      val nVec = new Array[Float](kept * dim)
      i = 0
      while (i < n) {
        val t = remap(i)
        if (t >= 0) {
          nIds(t) = ids(i); nLvl(t) = levels(i)
          System.arraycopy(vecs, i * dim, nVec, t * dim, dim)
        }
        i += 1
      }
      val nBase = new Array[Int](kept + 1)
      i = 0
      while (i < kept) { nBase(i + 1) = nBase(i) + nLvl(i) + 1; i += 1 }
      val nOff = new Array[Int](nBase(kept) + 1)
      val adjBuf = new mutable.ArrayBuilder.ofInt
      var pos = 0
      i = 0
      while (i < n) {
        val t = remap(i)
        if (t >= 0) {
          var l = 0
          while (l <= levels(i)) {
            var s = slotOff(slotBase(i) + l)
            val e = slotOff(slotBase(i) + l + 1)
            while (s < e) {
              val nb = remap(adj(s))
              if (nb >= 0) { adjBuf += nb; pos += 1 }
              s += 1
            }
            nOff(nBase(t) + l + 1) = pos
            l += 1
          }
        }
        i += 1
      }
      var nEntry = -1
      var nMax = -1
      i = 0
      while (i < kept) { if (nLvl(i) > nMax) { nMax = nLvl(i); nEntry = i }; i += 1 }
      new FrozenGraph(mc, dim, nIds, nLvl, nVec, nBase, nOff, adjBuf.result(),
        new java.util.BitSet(kept), nEntry, nMax)
    }

    /** Graph statistics, reference-EXACT (`hnsw/operations.rs:227-272`):
      * active nodes only, all-layer edge ends halved (edges into
      * tombstones still count), avg_degree = 2·edges/nodes, max live
      * layer. Matches [[Graph.stats]] on the same logical graph. */
    def stats: (Int, Long, Double, Int) = {
      var nodes = 0; var edgeEnds = 0L; var maxLvl = 0
      var i = 0
      while (i < n) {
        if (!deleted.get(i)) {
          nodes += 1
          if (levels(i) > maxLvl) maxLvl = levels(i)
          edgeEnds += slotOff(slotBase(i + 1)) - slotOff(slotBase(i))
        }
        i += 1
      }
      val edges = edgeEnds / 2
      val avgDeg = if (nodes == 0) 0.0 else (edges * 2).toDouble / nodes
      (nodes, edges, avgDeg, if (nodes == 0) 0 else maxLvl)
    }

    def toBytes: Array[Byte] = {
      val words = deleted.toLongArray
      val slots = if (n == 0) 0 else slotBase(n)
      val size = 9 * 4 + n * 8 + n * 4 + (slots + 1) * 4 + adj.length * 4 +
        n * dim * 4 + words.length * 8
      val buf = java.nio.ByteBuffer.allocate(size)
      buf.putInt(FrozenGraph.Magic).putInt(FrozenGraph.Version)
      buf.putInt(mc).putInt(dim).putInt(n).putInt(entry).putInt(maxLevel)
      buf.putInt(adj.length).putInt(words.length)
      var i = 0
      while (i < n) { buf.putLong(ids(i)); i += 1 }
      i = 0
      while (i < n) { buf.putInt(levels(i)); i += 1 }
      i = 0
      while (i <= slots) { buf.putInt(slotOff(i)); i += 1 }
      i = 0
      while (i < adj.length) { buf.putInt(adj(i)); i += 1 }
      i = 0
      while (i < n * dim) { buf.putFloat(vecs(i)); i += 1 }
      i = 0
      while (i < words.length) { buf.putLong(words(i)); i += 1 }
      buf.array()
    }
  }

  object FrozenGraph {
    /** Per-thread search scratch (see the instance's `visitScratch`):
      * lives in the companion so it carries NO outer pointer — the
      * ThreadLocalMap value must not reach the graph or the ThreadLocal
      * key, or per-thread entries never expunge. */
    private[Hnsw] final class VisitScratch(n: Int) {
      val mark = new Array[Int](n)
      var stamp = 0
    }

    val Magic = 0x47484e57 // "GHNW"
    val Version = 2

    /** Header-only peek: (metricCode, liveCount) without materializing the
      * vector/adjacency arrays — maintenance classification over an index
      * must cost O(header), not O(index bytes). Layout: magic(0) version(4)
      * mc(8) dim(12) n(16) entry(20) maxLevel(24) adjLen(28) wordsLen(32);
      * the tombstone words are the final wordsLen longs of the blob. */
    def peek(bytes: Array[Byte]): (Int, Int) = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.getInt(0) == Magic, "not a graft HNSW graph blob")
      val v = buf.getInt(4)
      require(v == Version, s"unsupported graph format version $v")
      val mc = buf.getInt(8)
      val n = buf.getInt(16)
      val wordsLen = buf.getInt(32)
      var del = 0
      var i = 0
      while (i < wordsLen) {
        del += java.lang.Long.bitCount(buf.getLong(bytes.length - (wordsLen - i) * 8))
        i += 1
      }
      (mc, n - del)
    }

    private[operators] def metricName(mc: Int): String =
      if (mc == 0) "l2" else "cosine"

    /** Byte length of header prefix that [[peekHeader]] needs. */
    val HeaderPrefixLen = 16

    /** (metricCode, dim) from a header PREFIX (>= 16 bytes). Driver-side
      * peeks MUST ship only `substring(graph, 1, 16)` through the scan —
      * collecting a whole blob row to read 8 header bytes pays hundreds of
      * MB (targetNodes x dim x 4) per call on a production shard. */
    def peekHeader(prefix: Array[Byte]): (Int, Int) = {
      require(prefix.length >= HeaderPrefixLen,
        s"HNSW header prefix ${prefix.length}B < $HeaderPrefixLen")
      val buf = java.nio.ByteBuffer.wrap(prefix)
      require(buf.getInt(0) == Magic, "not a graft HNSW graph blob")
      val v = buf.getInt(4)
      require(v == Version, s"unsupported graph format version $v")
      (buf.getInt(8), buf.getInt(12))
    }

    /** A8 per-blob stats without materializing vectors/adjacency:
      * (nodes, live, maxLevel) from the header + tombstone words. */
    def peekStats(bytes: Array[Byte]): (Int, Int, Int) = {
      val live = peek(bytes)._2 // validates magic/version, counts tombstones
      val buf = java.nio.ByteBuffer.wrap(bytes)
      (buf.getInt(16), live, buf.getInt(24))
    }

    /** Header-only dim read (offset 12, see [[peek]]'s layout map). */
    def peekDim(bytes: Array[Byte]): Int = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.getInt(0) == Magic, "not a graft HNSW graph blob")
      buf.getInt(12)
    }

    /** LIVE external ids without materializing the graph: the id longs sit
      * at bytes 36..36+8n and the tombstone words are the final wordsLen
      * longs (same layout map as [[peek]]) — enumerating ids for the
      * insert-path anti-join must not pay fromBytes' full adjacency +
      * n*dim vector decode per blob on every incremental batch. */
    def peekIds(bytes: Array[Byte]): Iterator[Long] = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.getInt(0) == Magic, "not a graft HNSW graph blob")
      val v = buf.getInt(4)
      require(v == Version, s"unsupported graph format version $v")
      val n = buf.getInt(16)
      val wordsLen = buf.getInt(32)
      val words = new Array[Long](wordsLen)
      var i = 0
      while (i < wordsLen) {
        words(i) = buf.getLong(bytes.length - (wordsLen - i) * 8); i += 1
      }
      val deleted = java.util.BitSet.valueOf(words)
      (0 until n).iterator.filterNot(deleted.get).map(i => buf.getLong(36 + 8 * i))
    }

    /** Deserialize one blob. The returned graph is safe to SHARE across
      * search threads (search scratch is per-thread — see
      * [[FrozenGraph.search]]); mutations ([[FrozenGraph.markDeleted]])
      * remain single-writer under the index's writer lease. */
    def fromBytes(bytes: Array[Byte]): FrozenGraph = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.getInt() == Magic, "not a graft HNSW graph blob")
      val v = buf.getInt()
      require(v == Version, s"unsupported graph format version $v")
      val mc = buf.getInt(); val dim = buf.getInt(); val n = buf.getInt()
      val entry = buf.getInt(); val maxLevel = buf.getInt()
      val adjLen = buf.getInt(); val wordsLen = buf.getInt()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) { ids(i) = buf.getLong(); i += 1 }
      val levels = new Array[Int](n)
      i = 0
      while (i < n) { levels(i) = buf.getInt(); i += 1 }
      val slotBase = new Array[Int](n + 1)
      i = 0
      while (i < n) { slotBase(i + 1) = slotBase(i) + levels(i) + 1; i += 1 }
      val slots = slotBase(n)
      val slotOff = new Array[Int](slots + 1)
      i = 0
      while (i <= slots) { slotOff(i) = buf.getInt(); i += 1 }
      val adj = new Array[Int](adjLen)
      i = 0
      while (i < adjLen) { adj(i) = buf.getInt(); i += 1 }
      val vecs = new Array[Float](n * dim)
      i = 0
      while (i < n * dim) { vecs(i) = buf.getFloat(); i += 1 }
      val words = new Array[Long](wordsLen)
      i = 0
      while (i < wordsLen) { words(i) = buf.getLong(); i += 1 }
      new FrozenGraph(mc, dim, ids, levels, vecs, slotBase, slotOff, adj,
        java.util.BitSet.valueOf(words), entry, maxLevel)
    }
  }

  /** Layout written by [[buildAndSave]]; hot read paths pass it explicitly
    * so searches never pay a schema-inference job. Pre-centroid indexes
    * read `centroid` as null (parquet schema evolution), which the routing
    * guard already treats as "probe every blob". */
  val savedBlobSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("graph",
        org.apache.spark.sql.types.BinaryType, nullable = true),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = true),
      org.apache.spark.sql.types.StructField("part_id",
        org.apache.spark.sql.types.LongType, nullable = true)))

  /** S3/S4 analog for the graph tier: build one graph per partition and
    * persist each as a binary blob row (part_id, graph BINARY). Unlike the
    * reference's CBOR nodes, the blobs load straight back into primitive
    * arrays with no per-node reconstruction. */
  def buildAndSave(corpus: DataFrame, path: String, metric: String = "l2",
      cfg: HnswConfig = HnswConfig(), idCol: String = "id",
      embCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    withSavedLease(spark, path) { lease =>
    import spark.implicits._
    // a repeated id would land in MULTIPLE partition graphs and occupy
    // several top-k slots for one logical row — the invariant
    // insertIntoSaved enforces with its anti-join, enforced here with a
    // loud require rather than a silent dropDuplicates: dedup would
    // REPARTITION the corpus by id and destroy exactly the cluster
    // co-location a routed build depends on. Ids-only aggregate, one
    // partial-combined pass — index builds are once-per-corpus.
    val idStats = corpus.agg(
      count(col(idCol)), countDistinct(col(idCol))).head()
    require(idStats.getLong(0) == idStats.getLong(1),
      s"corpus has duplicate ids (${idStats.getLong(0)} rows, " +
        s"${idStats.getLong(1)} distinct): an id may only live in one blob")
    // tmp+swap like every maintenance op: mode("overwrite") straight onto
    // the target deletes the OLD index before the job is known to finish —
    // a mid-write crash while rebuilding an existing path would strand the
    // caller with neither index (or worse, a partial blob set that
    // searchSaved happily serves with missing corpus coverage)
    corpus.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val g = new Graph(metric, cfg)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else {
          val fg = g.freeze()
          Iterator((fg.toBytes, fg.liveCentroid))
        }
      }
      .toDF("graph", "centroid")
      .withColumn("part_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(path + "_tmp")
    swapDir(spark, path, lease)
    }
  }

  /** Search previously persisted partition graphs: one task per graph blob
    * (blobs are tiny relative to the corpus, so the repartition that spreads
    * them across executors is a negligible shuffle), global top-k merge.
    *
    * `allowed` (X13 on the graph path): optional relation of permitted ids
    * (single LONG `id` column, e.g. the output of a metadata filter over
    * the store). The graph topology knows nothing about metadata, so the
    * reference's filtered-search semantics apply: each blob is probed for
    * `k * oversample` candidates (`hybrid/core.rs:513-549` uses k*3), the
    * candidate stream is semi-joined against `allowed`, and the survivors
    * merge through the usual top-k. Selectivity beyond 1/oversample can
    * under-fill k — that is the documented reference behavior, not a bug;
    * use the exact or IVF path for highly selective filters.
    *
    * `probeBlobs` (> 0): route each query to its nearest blobs by the
    * stored routing centroids instead of probing every blob — the cure for
    * the O(#blobs)-per-query cost of a heavily-incremented index, PROVIDED
    * the build co-located similar vectors (e.g. corpus repartitioned by
    * cluster before [[buildAndSave]]). `maxQueryBatch` bounds the driver
    * collect + broadcast of the query set; chunk bigger batches upstream. */
  def searchSaved(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, efSearch: Int = 50,
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding",
      allowed: Option[DataFrame] = None, oversample: Int = 3,
      probeBlobs: Int = 0, maxQueryBatch: Int = 100000,
      metric: String = "l2"): DataFrame = {
    recoverSaved(spark, path) // finish any swap a crashed maintainer left
    // `metric` is only a FALLBACK for blob routing on an empty index: the
    // routing metric is read from the blob headers themselves (see below),
    // because ranking a cosine index's blobs by raw L2 would route queries
    // away from the blobs holding their true cosine neighbors whenever
    // centroid norms differ — silent recall loss, because the in-blob walk
    // (which always uses the frozen metric) still looks right.
    import spark.implicits._
    // the query set is broadcast to every probed blob — an unbounded batch
    // would be an unbounded driver collect AND an O(|queries| x |blobs|)
    // probe matrix; chunk the batch upstream or raise this deliberately.
    // The limit bounds the collect itself: the guard must fire before the
    // driver materializes the batch, not after.
    // cast the id like the corpus path does — an IntegerType query id
    // would ClassCastException at getLong otherwise
    val qRows = queries.select(col(queryIdCol).cast("long"), col(queryEmbCol))
      .limit(maxQueryBatch + 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qRows.length <= maxQueryBatch,
      s"query batch exceeds maxQueryBatch=$maxQueryBatch")
    val qB = spark.sparkContext.broadcast(qRows)
    val kProbe = if (allowed.isDefined) k * math.max(1, oversample) else k
    // explicit schema: skips the footer-inference job this hot path would
    // otherwise pay per search call
    val saved = spark.read.schema(savedBlobSchema).parquet(path)
    // blob routing: with stored routing centroids, each query probes only
    // its probeBlobs nearest blobs — O(probeBlobs) instead of O(#blobs)
    // per query. Only effective when the build co-located similar vectors
    // (corpus partitioned by cluster); on randomly-partitioned corpora all
    // blob centroids sit near the global mean and routing loses recall.
    // The centroid read is a pruned scan of the tiny (part_id, centroid)
    // columns, never the blob bytes.
    // routing table: pid -> query indices, PLUS the set of pids that have a
    // centroid at all — a blob without one (pre-centroid-format file in a
    // mixed index) must be probed by every query, never silently skipped
    val routedB: Option[org.apache.spark.broadcast.Broadcast[(Map[Long, Array[Int]], Set[Long])]] =
      if (probeBlobs <= 0 || !saved.columns.contains("centroid")) None
      else {
        val cents = saved.select(col("part_id"), col("centroid"))
          .filter(col("centroid").isNotNull).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        if (cents.length <= probeBlobs) None
        else {
          // the routing metric comes from the INDEX (one header peek —
          // the same check insertIntoSaved makes), not from the caller's
          // possibly-defaulted `metric` argument; only the 16-byte header
          // prefix crosses to the driver, never a whole blob
          val routeMc = saved
            .select(substring(col("graph"), 1, FrozenGraph.HeaderPrefixLen))
            .as[Array[Byte]].head(1)
            .headOption.map(b => FrozenGraph.peekHeader(b)._1)
            .getOrElse(metricCode(metric))
          // |queries| x |blobs| distances: partial top-probeBlobs
          // selection (insertion into a probeBlobs-length array, O(B·p)
          // with p ~ single digits — no full O(B log B) sort per query)
          // on a PARALLEL stream — at 100K queries x 1000 shards x high
          // dim a single-threaded full-sort routing pass stalls the
          // driver for minutes before any executor works. Ties keep the
          // first-seen blob, matching the stable sort this replaces.
          val p = probeBlobs
          val perQuery = new Array[Array[Long]](qRows.length)
          java.util.stream.IntStream.range(0, qRows.length).parallel().forEach { qi =>
            val qv = qRows(qi)._2
            val bestD = Array.fill(p)(Double.MaxValue)
            val bestP = new Array[Long](p)
            cents.foreach { case (pid, c) =>
              val d = distArr(routeMc, qv, c)
              if (d < bestD(p - 1)) {
                var j = p - 1
                while (j > 0 && d < bestD(j - 1)) {
                  bestD(j) = bestD(j - 1); bestP(j) = bestP(j - 1); j -= 1
                }
                bestD(j) = d; bestP(j) = pid
              }
            }
            perQuery(qi) = bestP
          }
          val byBlob = perQuery.zipWithIndex
            .flatMap { case (pids, qi) => pids.map(_ -> qi) }
            .groupBy(_._1).map { case (pid, xs) => pid -> xs.map(_._2) }
          Some(spark.sparkContext.broadcast((byBlob, cents.map(_._1).toSet)))
        }
      }
    // with routing resolved driver-side, the un-probed blobs are known
    // before the scan: keep only blobs some query routed to, plus any
    // blob without a centroid (which every query must probe). The filter
    // prunes at the parquet scan (one blob row per file -> row-group
    // stats skip whole files) AND keeps un-probed blob bytes out of the
    // spreading shuffle — the difference between "read 4 of 1000 shards"
    // and "shuffle all 1000 to search 4" on a heavily-sharded index.
    val probed = routedB match {
      case None => saved
      case Some(b) =>
        val keys = b.value._1.keys.toSeq
        saved.filter(col("part_id").isin(keys: _*) || col("centroid").isNull)
    }
    val partial = probed
      .select(col("part_id"), col("graph")).as[(Long, Array[Byte])]
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { case (pid, bytes) =>
        val sel: Option[Array[Int]] = routedB.map { b =>
          val (byBlob, centroided) = b.value
          if (!centroided.contains(pid)) null // no centroid -> probe all
          else byBlob.getOrElse(pid, Array.empty[Int])
        }.filter(_ != null)
        if (sel.exists(_.isEmpty)) Iterator.empty
        else {
          val g = FrozenGraph.fromBytes(bytes)
          val qIdx = sel.map(_.iterator).getOrElse(qB.value.indices.iterator)
          qIdx.flatMap { qi =>
            val (qid, qv) = qB.value(qi)
            // ef must cover the widened candidate set or the widening is moot
            g.search(qv, kProbe, math.max(efSearch, kProbe)).iterator
              .map { case (id, d) => (qid, id, d) }
          }
        }
      }
      .toDF(queryIdCol, "id", "distance")
    val surviving = allowed.fold(partial)(a =>
      partial.join(a.select(col("id")), Seq("id"), "left_semi"))
    val topk = TopK.topK(k)
    surviving.groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Swap `path_tmp` into `path` under [[graft.core.FsSwap]]'s
    * marker-bracketed protocol (the same contract as the store's tier
    * rewrites): the live dir is renamed aside, every rename is checked,
    * and a crash at ANY point leaves a marker that [[recoverSaved]] —
    * run at every saved-index entry point — finishes from. The bare
    * rename-aside this replaces had a real gap: dying between its two
    * renames stranded the index in `_old`/`_tmp` with nothing to put it
    * back, so every later read of `path` failed until a human intervened. */
  private def swapDir(spark: SparkSession, path: String,
      lease: graft.core.WriterLease): Unit = {
    // commit-point lease re-verification + TTL renewal, same contract as
    // VectorStore.swap: a writer that stalled past the lease TTL aborts
    // here instead of installing a rewrite that races the usurper's
    lease.renewAndVerify()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.FsSwap.commit(fs, p,
      new org.apache.hadoop.fs.Path(path + "_tmp"),
      swapMarkerPath(path), """{"swap": "hnsw_index"}""")
  }

  private def swapMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "_swap.inprogress")

  /** Single-writer enforcement for saved-index MUTATIONS (build/insert/
    * delete/vacuum/compact), the same contract `VectorStore`'s writer
    * lease enforces for store tiers: two concurrent inserters would both
    * read the same max part_id and append colliding blob ids (routing
    * tables keyed by part_id would silently merge their entries), and two
    * concurrent rewrites race the swap. The lease file sits NEXT TO the
    * index dir (`<path>_writer.lease`), never inside it — swap renames
    * the dir, and a lease inside would travel with it. Readers
    * (searchSaved/savedStats) stay lock-free. */
  private def withSavedLease[T](spark: SparkSession, path: String)(
      body: graft.core.WriterLease => T): T = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = Option(p.getParent)
      .getOrElse(new org.apache.hadoop.fs.Path("/"))
    fs.mkdirs(parent) // first build: the parent may not exist yet
    val lease = new graft.core.WriterLease(fs, parent, ttlMs = 30L * 60 * 1000,
      leaseName = p.getName + "_writer.lease")
    lease.withLease(body(lease))
  }

  /** Finish any index swap a previous process died inside — run by every
    * saved-index entry point (search and maintenance). Fast path when
    * clean: two FS exists probes, no lock file. */
  def recoverSaved(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.FsSwap.recover(fs, p,
      new org.apache.hadoop.fs.Path(path + "_tmp"), swapMarkerPath(path))
  }

  /** Rewrite every saved graph blob through `f`, dropping empty graphs;
    * returns the per-blob results of `measure` summed. tmp+swap so a failed
    * rewrite never corrupts the index. */
  private def rewriteSaved(spark: SparkSession, path: String)(
      f: FrozenGraph => (FrozenGraph, Long)): Long = withSavedLease(spark, path) { lease =>
    recoverSaved(spark, path)
    import spark.implicits._
    val mapped = spark.read.parquet(path)
      .select(col("part_id"), col("graph")).as[(Long, Array[Byte])]
      .map { case (pid, bytes) =>
        val (g, m) = f(FrozenGraph.fromBytes(bytes))
        // the rewrite already deserialized — refresh the routing centroid
        // so delete/vacuum keep it honest
        (pid, if (g.n == 0) null else g.toBytes,
          if (g.n == 0) null else g.liveCentroid, m)
      }
      .toDF("part_id", "graph", "centroid", "measure")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = mapped.agg(coalesce(sum("measure"), lit(0L))).head().getLong(0)
    mapped.filter(col("graph").isNotNull).select("part_id", "graph", "centroid")
      .write.mode("overwrite").parquet(path + "_tmp")
    mapped.unpersist()
    swapDir(spark, path, lease)
    total
  }

  /** Soft-delete ids from a persisted index (X4/F10 on the saved form):
    * marks the tombstone bit inside each graph blob so [[searchSaved]]
    * excludes them immediately. Returns how many ids were found. */
  def deleteFromSaved(spark: SparkSession, path: String, ids: Seq[Long]): Long = {
    val idSet = ids.toSet
    rewriteSaved(spark, path)(g => (g, g.markDeleted(idSet).toLong))
  }

  /** Append a batch of new vectors as additional partition graphs — the
    * saved-index analog of the reference's incremental insert
    * (`hnsw/operations.rs:49-77`): new rows build their own graphs; search
    * merges across all blobs, so results are identical to a monolithic
    * insert up to per-partition topology. The batch's metric is validated
    * against the saved blobs (a mixed-metric index would silently merge
    * incomparable distances), and ids already live in the index are
    * dropped — the dup-reject the store applies at C1, here so one logical
    * id can never occupy two top-k slots. Soft-deleted ids MAY re-insert
    * (delete-then-reinsert resurrects, matching the store). Returns the
    * number of rows actually inserted. */
  def insertIntoSaved(rows: DataFrame, path: String, metric: String = "l2",
      cfg: HnswConfig = HnswConfig(), idCol: String = "id",
      embCol: String = "embedding"): Long = {
    val spark = rows.sparkSession
    withSavedLease(spark, path) { lease =>
    recoverSaved(spark, path)
    import spark.implicits._
    val saved = spark.read.parquet(path).select(col("graph")).as[Array[Byte]]
    // one header peek gates metric AND dim: a mixed-metric index would
    // silently merge incomparable distances; a mixed-dim one would crash
    // (or silently prefix-compare) only later, at search time. Only the
    // 16-byte header prefix reaches the driver, never a whole blob.
    val indexDim = saved
      .select(substring(col("graph"), 1, FrozenGraph.HeaderPrefixLen))
      .as[Array[Byte]].head(1).headOption.map { b =>
      val (mc, d) = FrozenGraph.peekHeader(b)
      require(mc == metricCode(metric),
        s"index is ${FrozenGraph.metricName(mc)}, insert called with $metric")
      d
    }
    // ids via the header-only decode: fromBytes would pay the full
    // adjacency + n*dim vector materialization of EVERY blob just to list
    // ids — on a large index that is the vector payload re-read per batch
    val existing = saved.flatMap(FrozenGraph.peekIds).toDF(idCol)
    // Dedup within the batch too — the anti-join only guards against ids
    // already saved; a doubled id inside one batch would land in two
    // partition graphs and take two top-k slots for one logical row.
    val fresh = rows.select(col(idCol).cast("long"), col(embCol))
      .dropDuplicates(idCol)
      .join(existing, Seq(idCol), "left_anti")
      .as[(Long, Array[Float])]
      .map { r =>
        indexDim.foreach(d => require(r._2 != null && r._2.length == d,
          s"batch vector dim ${Option(r._2).map(_.length).getOrElse(-1)} " +
            s"!= index dim $d (id ${r._1})"))
        r
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = fresh.count()
    if (n > 0) {
      // monotonically_increasing_id alone would reuse the original build's
      // part_id sequence (every blob row is its partition's sole output, so
      // the value is always partitionId << 33) — offset past the existing
      // max so routing tables keyed by part_id never see duplicates
      val maxPid = spark.read.parquet(path)
        .agg(coalesce(max("part_id"), lit(0L))).head().getLong(0)
      fresh
        .mapPartitions { it =>
          val g = new Graph(metric, cfg)
          it.foreach { case (id, v) => g.insert(id, v) }
          if (g.size == 0) Iterator.empty
          else {
            val fg = g.freeze()
            Iterator((fg.toBytes, fg.liveCentroid))
          }
        }
        .toDF("graph", "centroid")
        .withColumn("part_id", monotonically_increasing_id() + lit(maxPid + 1))
        .write.mode("append").parquet(path)
    }
    fresh.unpersist()
    n
    }
  }

  /** A8 graph statistics over a persisted index (the reference's
    * `get_graph_stats`, `hnsw/core.rs` / `hybrid/maintenance.rs` analog),
    * aggregated across blobs from header + tombstone peeks only — cost
    * O(blob bytes scanned), zero graph materialization, one tiny
    * aggregate. `max_level` is exactly replayable by an oracle: level
    * assignment is the deterministic splitmix64 draw over (id, seed)
    * ([[HnswBuilder.levelFor]]), so `max(level(id))` over the live corpus
    * predicts it engine-independently. */
  def savedStats(spark: SparkSession, path: String): DataFrame = {
    recoverSaved(spark, path)
    import spark.implicits._
    spark.read.parquet(path).select(col("graph")).as[Array[Byte]]
      .map { b =>
        val (n, live, ml) = FrozenGraph.peekStats(b); (n, live, ml)
      }
      .toDF("n", "live", "ml")
      .agg(sum("n").cast("long").as("n_nodes"),
        sum("live").cast("long").as("n_live"),
        max("ml").cast("int").as("max_level"))
  }

  /** [[checkSavedIntegrity]] result — the reference HNSWPersister's
    * `RecoveryInfo` (`hnsw/persistence.rs:66-70,307-349`: expected nodes
    * vs what the chunks actually deserialize to) over this layout:
    * `badBlobs` are rows whose graph payload fails a FULL deserialization
    * or whose header counts disagree with the decoded graph. */
  case class SavedIntegrity(blobs: Long, badBlobs: Long, nodes: Long,
      live: Long, isComplete: Boolean)

  /** Structural integrity of a persisted index — the reference's
    * `check_integrity` walks every chunk and deserializes it
    * (`hnsw/persistence.rs:307-349`); here every blob is fully decoded
    * (not just header-peeked) and cross-checked against its own header, in
    * one distributed pass. READ-ONLY: unlike the maintenance ops this
    * never runs swap recovery — a store wedged mid-swap should be
    * REPORTED (blobs=0, incomplete), not silently repaired by the
    * integrity probe; any open/maintenance call runs recovery. */
  def checkSavedIntegrity(spark: SparkSession, path: String): SavedIntegrity = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      return SavedIntegrity(0L, 0L, 0L, 0L, isComplete = false)
    val row = spark.read.parquet(path).select(col("graph")).as[Array[Byte]]
      .map { b =>
        try {
          val g = FrozenGraph.fromBytes(b)
          val (hn, hLive, _) = FrozenGraph.peekStats(b)
          if (hn != g.n || hLive != g.liveCount) (1L, 1L, 0L, 0L)
          else (1L, 0L, g.n.toLong, g.liveCount.toLong)
        } catch { case scala.util.control.NonFatal(_) => (1L, 1L, 0L, 0L) }
      }
      .toDF("b", "bad", "n", "live")
      .agg(coalesce(sum("b"), lit(0L)), coalesce(sum("bad"), lit(0L)),
        coalesce(sum("n"), lit(0L)), coalesce(sum("live"), lit(0L)))
      .head()
    SavedIntegrity(row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), isComplete = row.getLong(0) > 0 && row.getLong(1) == 0)
  }

  /** Physically compact a persisted index: scrub soft-deleted nodes and
    * every edge touching them (`hnsw/operations.rs:127-200`), drop graphs
    * that end up empty. Returns the number of nodes removed. */
  def vacuumSaved(spark: SparkSession, path: String): Long =
    rewriteSaved(spark, path) { g =>
      val removed = g.deleted.cardinality().toLong
      (g.compact(), removed)
    }

  /** Defragment a persisted index: every [[insertIntoSaved]] batch adds its
    * own small partition graphs, and [[searchSaved]] probes EVERY blob per
    * query — after many increments the per-query cost is O(#blobs), not
    * O(#partitions). Blobs below `minNodes` live nodes are exploded back to
    * (id, vector) rows and rebuilt as ~`targetNodes`-sized graphs; larger
    * blobs pass through untouched. tmp+swap like the other maintenance ops.
    * The metric is derived from the blobs themselves (header peek — no
    * full deserialization of pass-through blobs); `cfg` must match the
    * original build. Returns the number of small blobs merged away. */
  def compactSaved(spark: SparkSession, path: String, minNodes: Int = 1024,
      targetNodes: Int = 4096, cfg: HnswConfig = HnswConfig()): Long = withSavedLease(spark, path) { lease =>
    recoverSaved(spark, path)
    import spark.implicits._
    val savedDf = spark.read.parquet(path)
    val hasCentroid = savedDf.columns.contains("centroid")
    val blobs = savedDf
      .select(col("part_id"), col("graph"),
        (if (hasCentroid) col("centroid")
         else lit(null).cast("array<float>")).as("centroid"))
      .as[(Long, Array[Byte], Array[Float])]
      .map { case (pid, bytes, cent) =>
        val (mc, live) = FrozenGraph.peek(bytes)
        // pre-centroid-format blobs get one on the way through (O(blob)
        // once, during a maintenance op that holds the bytes anyway)
        val c = if (cent != null) cent
          else FrozenGraph.fromBytes(bytes).liveCentroid
        (pid, bytes, c, mc, live)
      }
      .toDF("part_id", "graph", "centroid", "mc", "live")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE aggregate job over the persisted blobs for all four driver
    // scalars (guide §2.4 — this was four separate jobs: metric-code
    // distinct, small-blob count, small-node sum, and the max-part_id agg
    // inlined into the rebuilt plan below; each re-traversed the cached
    // blob relation for one number)
    val statsRow = blobs.agg(
      collect_set(col("mc")).as("mcs"),
      coalesce(sum(when(col("live") < minNodes, 1L)), lit(0L)).as("n_small"),
      coalesce(sum(when(col("live") < minNodes, col("live").cast("long"))),
        lit(0L)).as("total_small"),
      coalesce(max("part_id"), lit(0L)).as("max_pid")).head()
    val mcs = statsRow.getSeq[Int](0)
    if (mcs.isEmpty) { blobs.unpersist(); return 0L }
    require(mcs.length == 1, s"mixed metric codes in saved index: ${mcs.mkString(",")}")
    val metric = FrozenGraph.metricName(mcs.head)
    val nSmall = statsRow.getLong(1)
    if (nSmall <= 1) { blobs.unpersist(); return 0L }
    val totalSmall = statsRow.getLong(2)
    val maxPid = statsRow.getLong(3)
    // explode small blobs to live rows, rebuild into ~targetNodes graphs.
    // Rows keep their SOURCE blob id and the rebuild repartitions on it —
    // whole small blobs merge into a rebuilt blob, never a round-robin
    // row scatter: on a routed index (store builds repartition by
    // cluster_id) a row-level reshuffle would mix clusters until every
    // rebuilt centroid sits near the global mean, which is exactly the
    // shape searchSaved's routing comment warns loses recall — silently,
    // since in-blob searches still look right.
    val rows = blobs.filter(col("live") < minNodes)
      .select(col("part_id"), col("graph")).as[(Long, Array[Byte])]
      .flatMap { case (pid, bytes) =>
        val g = FrozenGraph.fromBytes(bytes)
        (0 until g.n).iterator.filterNot(g.deleted.get).map { i =>
          (pid, g.ids(i),
            java.util.Arrays.copyOfRange(g.vecs, i * g.dim, (i + 1) * g.dim))
        }
      }
    val nParts = math.max(1, (totalSmall / targetNodes).toInt)
    val rebuilt = rows.repartition(nParts, col("_1"))
      .map { case (_, id, v) => (id, v) }
      .mapPartitions { it =>
        val g = new Graph(metric, cfg)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else {
          val fg = g.freeze()
          Iterator((fg.toBytes, fg.liveCentroid))
        }
      }
      .toDF("graph", "centroid")
      // offset past the surviving blobs' max pid, not a fixed constant —
      // partitionId << 33 values from earlier appends can exceed any
      // constant and collide (maxPid rides the fused stats aggregate above)
      .withColumn("part_id", monotonically_increasing_id() + lit(maxPid + 1))
    blobs.filter(col("live") >= minNodes).select("part_id", "graph", "centroid")
      .unionByName(rebuilt.select("part_id", "graph", "centroid"))
      .write.mode("overwrite").parquet(path + "_tmp")
    blobs.unpersist()
    swapDir(spark, path, lease)
    nSmall
  }

  /** Batch ANN search with a throwaway per-partition graph build — for
    * one-shot corpora; persistent corpora should [[buildAndSave]] once and
    * [[searchSaved]] per batch. Returns (query_id, id, distance, rank). */
  def searchBatch(corpus: DataFrame, queries: DataFrame, k: Int,
      metric: String = "l2", cfg: HnswConfig = HnswConfig(),
      idCol: String = "id", embCol: String = "embedding",
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding",
      maxQueryBatch: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // same guard discipline as searchSaved: the query set is collected and
    // broadcast to every corpus partition, so an unbounded batch is an
    // unbounded driver collect — the limit bounds the collect itself so the
    // guard fires before the driver materializes the batch, not after OOM
    val qRows = queries.select(col(queryIdCol).cast("long"), col(queryEmbCol))
      .limit(maxQueryBatch + 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qRows.length <= maxQueryBatch,
      s"query batch exceeds maxQueryBatch=$maxQueryBatch; chunk the batch upstream")
    val qB = spark.sparkContext.broadcast(qRows)
    val partial = corpus.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val g = new Graph(metric, cfg)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else {
          val fg = g.freeze()
          qB.value.iterator.flatMap { case (qid, qv) =>
            fg.search(qv, k, cfg.efSearch).iterator.map { case (id, d) => (qid, id, d) }
          }
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
