package graft.operators

/** Seeded in-driver Lloyd k-means over a bounded training sample — the
  * fast path for codebook/coarse-quantizer training when the sample is
  * small by design (PQ subspaces always, IVF when trainSize is bounded,
  * mirroring the reference's in-memory trainers `ivf/core.rs:240-334`,
  * `vector_ops.rs:405-523`). Random init + empty-cluster reseeding;
  * assignment loop parallelized across cores. MLlib KMeans remains the
  * unbounded-data path.
  */
object Lloyd {

  def kmeans(data: Array[Array[Float]], k: Int, maxIter: Int, seed: Long,
      tol: Double = 1e-4): Array[Array[Float]] = {
    require(data.nonEmpty, "empty training sample")
    val dim = data(0).length
    val rnd = new scala.util.Random(seed)
    val cents = Array.fill(k)(data(rnd.nextInt(data.length)).clone())
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
