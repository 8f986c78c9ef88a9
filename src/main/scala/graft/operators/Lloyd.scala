package graft.operators

/** Seeded in-driver Lloyd k-means over a bounded training sample — the
  * fast path for codebook/coarse-quantizer training when the sample is
  * small by design (PQ subspaces always, IVF when trainSize is bounded,
  * mirroring the reference's in-memory trainers `ivf/core.rs:240-334`,
  * `vector_ops.rs:405-523`). k-means++ init (the reference's own
  * `initialize_centroids`, `ivf/core.rs:336-371`: each next seed drawn
  * with probability ∝ squared distance to its nearest chosen seed) +
  * empty-cluster reseeding; assignment loop parallelized across cores.
  * MLlib KMeans remains the unbounded-data path.
  */
object Lloyd {

  /** k-means++ seeding: first seed uniform, each next ∝ D(x)² where D is
    * the distance to the nearest already-chosen seed — O(k·n·dim) via an
    * incrementally-maintained min-distance array (the reference rescans
    * all chosen seeds per round, `ivf/core.rs:345-368` — same draw, k×
    * less work). Degenerate all-duplicate samples (total weight 0) fall
    * back to uniform draws. */
  private def kmeansPlusPlusInit(data: Array[Array[Float]], k: Int,
      rnd: scala.util.Random): Array[Array[Float]] = {
    val n = data.length
    val dim = data(0).length
    val cents = new Array[Array[Float]](k)
    cents(0) = data(rnd.nextInt(n)).clone()
    if (k == 1) return cents
    val minDistSq = new Array[Double](n)
    var i = 0
    while (i < n) {
      var d = 0.0; var j = 0
      val v = data(i); val c0 = cents(0)
      while (j < dim) { val t = v(j).toDouble - c0(j).toDouble; d += t * t; j += 1 }
      minDistSq(i) = d
      i += 1
    }
    var c = 1
    while (c < k) {
      var total = 0.0
      i = 0
      while (i < n) { total += minDistSq(i); i += 1 }
      val pick =
        if (total <= 0.0) rnd.nextInt(n) // all points coincide with a seed
        else {
          val threshold = rnd.nextDouble() * total
          var cum = 0.0; var idx = 0; var found = -1
          while (found < 0 && idx < n) {
            cum += minDistSq(idx)
            if (cum >= threshold) found = idx
            idx += 1
          }
          if (found < 0) n - 1 // float-sum slack: threshold ≈ total
          else found
        }
      cents(c) = data(pick).clone()
      // fold the new seed into the min-distance array
      i = 0
      while (i < n) {
        var d = 0.0; var j = 0
        val v = data(i); val cc = cents(c)
        while (j < dim && d < minDistSq(i)) {
          val t = v(j).toDouble - cc(j).toDouble; d += t * t; j += 1
        }
        if (j == dim && d < minDistSq(i)) minDistSq(i) = d
        i += 1
      }
      c += 1
    }
    cents
  }

  def kmeans(data: Array[Array[Float]], k: Int, maxIter: Int, seed: Long,
      tol: Double = 1e-4): Array[Array[Float]] = {
    require(data.nonEmpty, "empty training sample")
    val dim = data(0).length
    val rnd = new scala.util.Random(seed)
    val cents = kmeansPlusPlusInit(data, k, rnd)
    val assign = new Array[Int](data.length)
    val nThreads = math.max(1, Runtime.getRuntime.availableProcessors() / 2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    try {
      var iter = 0; var changed = true
      while (iter < maxIter && changed) {
        // parallel assignment
        val chunk = math.max(1, data.length / nThreads)
        val futures = (0 until data.length by chunk).map { start =>
          val end = math.min(start + chunk, data.length)
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              var anyChanged = false
              var i = start
              while (i < end) {
                var best = 0; var bestD = Double.MaxValue; var c = 0
                while (c < k) {
                  var d = 0.0; var j = 0
                  val cc = cents(c); val v = data(i)
                  while (j < dim) {
                    val t = v(j).toDouble - cc(j).toDouble; d += t * t; j += 1
                  }
                  if (d < bestD) { bestD = d; best = c }
                  c += 1
                }
                if (assign(i) != best) { assign(i) = best; anyChanged = true }
                i += 1
              }
              anyChanged
            }
          })
        }
        changed = futures.map(_.get()).exists(identity)
        // sequential centroid update (k x dim, cheap)
        val sums = Array.ofDim[Double](k, dim)
        val counts = new Array[Int](k)
        var i = 0
        while (i < data.length) {
          val c = assign(i); counts(c) += 1
          var j = 0
          while (j < dim) { sums(c)(j) += data(i)(j); j += 1 }
          i += 1
        }
        // centroid-shift early stop: the documented `tol` contract — a
        // round whose largest centroid move is under tol converges even
        // while a few points still flip between equidistant centroids
        var maxShift = 0.0
        var c = 0
        while (c < k) {
          if (counts(c) == 0) {
            cents(c) = data(rnd.nextInt(data.length)).clone()
            changed = true
            maxShift = Double.MaxValue // a reseed is never converged
          } else {
            var shift = 0.0
            var j = 0
            while (j < dim) {
              val nv = (sums(c)(j) / counts(c)).toFloat
              val d = nv.toDouble - cents(c)(j).toDouble
              shift += d * d
              cents(c)(j) = nv
              j += 1
            }
            maxShift = math.max(maxShift, math.sqrt(shift))
          }
          c += 1
        }
        if (maxShift <= tol) changed = false
        iter += 1
      }
    } finally pool.shutdown()
    cents
  }
}
