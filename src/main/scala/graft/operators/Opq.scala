package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Optimized Product Quantization (Ge et al., CVPR 2013): learn an
  * orthogonal rotation R jointly with the PQ codebooks so quantization
  * error is balanced across subspaces. Plain PQ (A2/M12,
  * `/root/reference/src/core/vector_ops.rs:405-577`) slices the raw
  * coordinate order, so a corpus whose variance is concentrated in a few
  * dimensions wastes code budget on near-constant subspaces; OPQ rotates
  * first, spending the same m x log2(k) bits where the signal is.
  *
  * Training follows the paper's two phases, both on the SAME bounded
  * sample discipline as [[Pq.train]]:
  *   1. parametric init (§4 "eigenvalue allocation"): PCA of the sample,
  *      principal directions dealt greedily to subspaces balancing the
  *      per-subspace variance product — this is the closed-form optimum
  *      under the Gaussian assumption, and crucially NOT a fixed point of
  *      phase 2 on axis-aligned data (identity init is: the Procrustes
  *      polar factor of a symmetric PSD covariance-like matrix is I);
  *   2. non-parametric refinement: alternate (a) PQ codebook fit in the
  *      rotated space ([[Lloyd.kmeans]] per subspace) with (b) the
  *      orthogonal-Procrustes update R = UV' from SVD(Y X') against the
  *      sample's reconstructions.
  *
  * Serving is the PQ machinery unchanged: rotation is a map-only codegen
  * matrix-vector product (d dots against literal rows, the [[Pca.project]]
  * pattern), encode/ADC run on the rotated coordinates, and because R is
  * orthogonal, L2 and cosine in the rotated space equal the raw-space
  * values — recall gates against the raw exact baseline stay meaningful.
  * Everything driver-side touches only the bounded training sample; the
  * corpus path is one whole-stage-codegen projection at any scale.
  */
object Opq {

  /** rotation(i) = row i of the orthogonal d x d matrix R; the stored
    * codebooks quantize R * v. */
  case class OpqModel(rotation: Array[Array[Float]], pq: Pq.PqModel) {
    def dim: Int = rotation.length
  }

  // ---- driver-side kernels over the bounded sample ----

  private def matVec(r: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val d = r.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var acc = 0.0; var j = 0; val row = r(i)
      while (j < v.length) { acc += row(j).toDouble * v(j).toDouble; j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  private def subEnd(s: Int, m: Int, subDim: Int, dim: Int): Int =
    if (s == m - 1) dim else (s + 1) * subDim

  /** Nearest-code reconstruction of one rotated sample vector under the
    * current codebooks (the Y side of the Procrustes update). */
  private def reconstruct(books: Array[Array[Array[Float]]], subDim: Int,
      dim: Int, v: Array[Float]): Array[Float] = {
    val m = books.length
    val out = new Array[Float](dim)
    var s = 0
    while (s < m) {
      val start = s * subDim
      val end = subEnd(s, m, subDim, dim)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < books(s).length) {
        val cc = books(s)(c)
        var d = 0.0; var j = start
        while (j < end) {
          val t = v(j).toDouble - cc(j - start).toDouble; d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val chosen = books(s)(best)
      var j = start
      while (j < end) { out(j) = chosen(j - start); j += 1 }
      s += 1
    }
    out
  }

  /** Orthogonal Procrustes: R = argmin_{R orthogonal} ||R X - Y||_F
    * = U V' from the SVD of M = Y X' = sum_n y_n x_n'. Driver-side over
    * the bounded sample; d x d SVD via the breeze bundled with MLlib. */
  private def procrustes(x: Array[Array[Float]],
      y: Array[Array[Float]]): Array[Array[Float]] = {
    val d = x(0).length
    val acc = Array.ofDim[Double](d, d)
    var n = 0
    while (n < x.length) {
      val xn = x(n); val yn = y(n)
      var i = 0
      while (i < d) {
        val yi = yn(i).toDouble; val row = acc(i)
        var j = 0
        while (j < d) { row(j) += yi * xn(j).toDouble; j += 1 }
        i += 1
      }
      n += 1
    }
    val mMat = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => acc(i)(j))
    val s = breeze.linalg.svd(mMat)
    val r = s.U * s.Vt
    Array.tabulate(d, d)((i, j) => r(i, j).toFloat)
  }

  /** Eigenvalue allocation (Ge et al. §4): PCA the sample covariance,
    * then deal principal directions — highest variance first — to the
    * subspace with the smallest current log-variance product (among those
    * with free slots). Returns the d x d rotation whose row blocks are the
    * allocated principal directions: subspace s of R*v holds its dealt
    * components. */
  private def eigenAllocationInit(sample: Array[Array[Float]], m: Int,
      subDim: Int, dim: Int): Array[Array[Float]] = {
    val n = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var j = 0; while (j < dim) { mean(j) += v(j); j += 1 }
    }
    var j = 0
    while (j < dim) { mean(j) /= n; j += 1 }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) {
        val ci = v(i) - mean(i); val row = cov(i)
        var k = i
        while (k < dim) { row(k) += ci * (v(k) - mean(k)); k += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < dim) {
      var k = i
      while (k < dim) { cov(i)(k) /= n; cov(k)(i) = cov(i)(k); k += 1 }
      i += 1
    }
    val eig = breeze.linalg.eigSym(
      breeze.linalg.DenseMatrix.tabulate(dim, dim)((a, b) => cov(a)(b)))
    // eigSym returns ascending eigenvalues; deal descending
    val order = (0 until dim).sortBy(ix => -eig.eigenvalues(ix))
    val capacity = Array.tabulate(m)(s => subEnd(s, m, subDim, dim) - s * subDim)
    val logProd = new Array[Double](m)
    val dealt = Array.fill(m)(List.empty[Int])
    order.foreach { ix =>
      val ev = math.max(eig.eigenvalues(ix), 1e-12)
      // smallest current product with free capacity; ties to lowest s
      var best = -1; var bestLp = Double.MaxValue
      var s = 0
      while (s < m) {
        if (dealt(s).length < capacity(s) && logProd(s) < bestLp) {
          bestLp = logProd(s); best = s
        }
        s += 1
      }
      dealt(best) = dealt(best) :+ ix
      logProd(best) += math.log(ev)
    }
    val rows = dealt.flatten
    Array.tabulate(dim, dim)((r, c) => eig.eigenvectors(c, rows(r)).toFloat)
  }

  private def fitBooks(rotated: Array[Array[Float]], m: Int, k: Int,
      subDim: Int, dim: Int, seed: Long): Array[Array[Array[Float]]] =
    Array.tabulate(m) { s =>
      val sub = rotated.map(v => v.slice(s * subDim, subEnd(s, m, subDim, dim)))
      Lloyd.kmeans(sub, k, maxIter = 25, seed = seed + s)
    }

  /** Train rotation + codebooks on a bounded sample (same sampling rule
    * as [[Pq.train]]). `iters` counts the non-parametric refinement
    * rounds after the eigenvalue-allocation init; iters = 0 is pure
    * parametric OPQ. */
  def train(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
      embCol: String = "embedding", trainSize: Int = 10000, iters: Int = 5,
      seed: Long = 42L): OpqModel = {
    require(m >= 1 && m <= dim, s"need 1 <= m <= dim, got m=$m dim=$dim")
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val subDim = dim / m
    val sample: Array[Array[Float]] = corpus.select(embCol)
      .orderBy(rand(seed)).limit(trainSize)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    // loud contract error instead of an AIOOBE deep inside the
    // covariance loops when the corpus width disagrees with dim
    sample.find(_.length != dim).foreach { v =>
      throw new IllegalArgumentException(
        s"sampled $embCol length ${v.length} != dim=$dim")
    }
    var rot = eigenAllocationInit(sample, m, subDim, dim)
    var books = fitBooks(sample.map(matVec(rot, _)), m, k, subDim, dim, seed)
    var it = 0
    while (it < iters) {
      // Procrustes against the CURRENT books' reconstructions, then refit
      // books in the updated space — the paper's alternation, one matrix
      // polar step per round
      val rotated = sample.map(matVec(rot, _))
      val recon = rotated.map(reconstruct(books, subDim, dim, _))
      rot = procrustes(sample, recon)
      books = fitBooks(sample.map(matVec(rot, _)), m, k, subDim, dim, seed + it + 1)
      it += 1
    }
    OpqModel(rot, Pq.PqModel(m, k, subDim, books))
  }

  // ---- serving: map-only rotation + the PQ machinery unchanged ----

  /** R * emb as ONE codegen matrix-vector loop over the rotation shipped
    * as a reference object ([[graft.functions.kernels.MatVec]]) — the
    * first form, d separate vecDot expressions over d array literals,
    * measured ~25x slower (the combined tree falls out of codegen
    * budgets); same arithmetic, one kernel. */
  def rotate(model: OpqModel, emb: Column): Column =
    VectorExpressions.matVec(emb, model.rotation)

  /** Driver-side rotation of one vector (query-side prep). */
  def rotateOne(model: OpqModel, v: Array[Float]): Array[Float] =
    matVec(model.rotation, v)

  /** embedding -> ARRAY<INT> of m codes in the rotated space (map-only).
    *
    * NOT `Pq.encode(pq, rotate(emb))`: each of the m nearestCentroid
    * calls would embed its own copy of the FULL rotation subtree
    * (Catalyst does no CSE across them), rotating every row m times.
    * Subspace s only needs ITS block of rotated coordinates, so each
    * argmin gets its own subLen-row [[graft.functions.kernels.MatVec]]:
    * d dot-rows total per row of input, the same arithmetic with none of
    * the duplication. */
  def encode(model: OpqModel, emb: Column): Column = {
    val m = model.pq.m
    val subDim = model.pq.subDim
    array((0 until m).map { s =>
      val rotBlock = model.rotation.slice(s * subDim,
        subEnd(s, m, subDim, model.dim))
      VectorExpressions.nearestCentroid(
        VectorExpressions.matVec(emb, rotBlock), model.pq.codebooks(s), "l2")
    }: _*)
  }

  /** Inverse rotation R' * emb (orthogonal, so transpose = inverse) —
    * the same single [[graft.functions.kernels.MatVec]] loop over the
    * transposed rows. */
  def rotateBack(model: OpqModel, emb: Column): Column =
    VectorExpressions.matVec(emb,
      Array.tabulate(model.dim, model.dim)((i, j) => model.rotation(j)(i)))

  /** Reconstruction in the RAW space: R' * decode(codes). `codesCol`
    * MUST be a materialized column reference, not an inline encode
    * expression — each of the d rotation dots embeds one copy of the
    * codebook literal, so nesting encode inside multiplies the whole
    * encode tree (rotation + m centroid tables) d-fold and the task
    * binary balloons to tens of MB. Encode into a column first, then
    * decode that column (the OpqSpec MSE test is the shape). */
  def decode(model: OpqModel, codesCol: Column): Column =
    rotateBack(model, Pq.decode(model.pq, codesCol))

  /** Batch ADC search over OPQ codes: query rotation is attached as a
    * [[graft.functions.kernels.MatVec]] column and evaluated inside the
    * bounded query-collect job that [[Pq.adcSearchBatch]] triggers (the
    * query table is small by contract; the cost is m x d dots per query,
    * once), the encoded corpus is scored by the same codegen ADC
    * table kernel as plain PQ, and the optional exact rerank runs in the
    * rotated space — orthogonality makes those distances equal the raw
    * ones. `rerank` takes the RAW corpus (idCol, embedding); the rotation
    * is applied map-side here so callers never juggle two embeddings. */
  def searchBatch(encoded: DataFrame, model: OpqModel, queries: DataFrame,
      k: Int, shortlist: Int = 100, rerank: Option[DataFrame] = None,
      idCol: String = "id", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", metric: String = "l2"): DataFrame = {
    val rotatedQueries = queries.withColumn(queryEmbCol,
      rotate(model, col(queryEmbCol)))
    val rotatedRerank = rerank.map(_.withColumn("embedding",
      rotate(model, col("embedding"))))
    Pq.adcSearchBatch(encoded, model.pq, rotatedQueries, k, shortlist,
      rotatedRerank, idCol, queryIdCol, queryEmbCol, metric)
  }

  /** Batch IVF-OPQ search — [[Pq.searchBatchIvfPq]] with the learned
    * rotation applied ONLY where the code space demands it: the coarse
    * probe runs raw query vs raw centroids (cluster ids were assigned in
    * raw space), the ADC tables are built from the driver-rotated query
    * (the codes quantize R*v), and the exact rerank is raw-vs-raw —
    * orthogonality makes rotated l2/cosine equal the raw values, so
    * neither the probe ranking nor the rerank needs the rotation, and the
    * corpus-side scan stays the unchanged 100 TB IVF-PQ shape (probed
    * partitions of the code table; no per-row rotation anywhere). */
  def searchBatchIvf(encoded: DataFrame, centroids: DataFrame,
      model: OpqModel, queries: DataFrame, k: Int, nProbe: Int,
      shortlist: Int = 100, rerank: Option[DataFrame] = None,
      idCol: String = "id", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", metric: String = "l2"): DataFrame =
    Pq.searchBatchIvfPq(encoded, centroids, model.pq, queries, k, nProbe,
      shortlist, rerank, idCol, queryIdCol, queryEmbCol, metric,
      adcQueryTransform = rotateOne(model, _))

  /** Mean squared reconstruction error of `vecs` under the model — the
    * quantity OPQ training minimizes, computed in the ROTATED space
    * (R·v vs the nearest-code reconstruction; orthogonality makes it
    * equal the raw-space error, see the object scaladoc). Driver-side
    * over a bounded sample: this is the staleness probe's kernel — a
    * rotation learned on yesterday's corpus reconstructs today's drifted
    * corpus measurably worse, eroding the ADC recall edge the tier
    * exists for, long before any search-visible symptom. */
  def reconstructionMse(model: OpqModel, vecs: Array[Array[Float]]): Double = {
    require(vecs.nonEmpty, "empty sample for reconstructionMse")
    val dim = model.dim
    var sum = 0.0
    vecs.foreach { v =>
      require(v.length == dim,
        s"sampled vector length ${v.length} != model dim=$dim")
      val rv = matVec(model.rotation, v)
      val rec = reconstruct(model.pq.codebooks, model.pq.subDim, dim, rv)
      var j = 0; var d = 0.0
      while (j < dim) {
        val t = rv(j).toDouble - rec(j).toDouble; d += t * t; j += 1
      }
      sum += d
    }
    sum / vecs.length
  }

  // ---- persistence (the PQ sidecar shape + rotation rows) ----

  def save(spark: org.apache.spark.sql.SparkSession, model: OpqModel,
      path: String): Unit = {
    import spark.implicits._
    Pq.save(spark, model.pq, path + "/codebooks")
    model.rotation.zipWithIndex.map { case (row, i) => (i, row) }.toSeq
      .toDF("i", "row").repartition(1)
      .write.mode("overwrite").parquet(path + "/rotation")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): OpqModel = {
    val pq = Pq.load(spark, path + "/codebooks")
    val rows = spark.read.parquet(path + "/rotation")
      .select(col("i"), col("row")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    require(rows.nonEmpty, s"no OPQ rotation at $path")
    val d = rows.map(_._1).max + 1
    require(rows.length == d && rows.map(_._1).toSet.size == d,
      s"rotation rows incomplete at $path: ${rows.length} for d=$d")
    val byI = rows.toMap
    OpqModel(Array.tabulate(d)(byI(_)), pq)
  }
}
