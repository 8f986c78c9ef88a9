package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Anisotropic corpus — dimension i scaled by (1 + i/8): variance piles
    * into the high-index subspaces, the shape plain PQ wastes bits on and
    * OPQ exists to fix. THE shared definition with the ann_opq row. */
  private lazy val stretched =
    graft.queries.QueryShapes.stretchedCorpus(emb).cache()

  private lazy val model = Opq.train(stretched, dim = 64, m = 8, k = 16,
    trainSize = 500, iters = 3)

  private def flatBooks(p: Pq.PqModel): Seq[Float] =
    for { b <- p.codebooks.toSeq; c <- b.toSeq; x <- c.toSeq } yield x

  test("rotation is orthogonal: R'R = I within float tolerance") {
    val r = model.rotation
    val d = r.length
    var worst = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0
      var c = 0
      while (c < d) { acc += r(c)(i).toDouble * r(c)(j).toDouble; c += 1 }
      val expect = if (i == j) 1.0 else 0.0
      worst = math.max(worst, math.abs(acc - expect))
    }
    assert(worst < 1e-4, s"R'R deviates from I by $worst")
  }

  test("rotate() column matches the driver-side matrix-vector product") {
    val v = stretched.filter(col("id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    val expect = Opq.rotateOne(model, v)
    val got = stretched.filter(col("id") === 7)
      .select(Opq.rotate(model, col("embedding"))).head().getSeq[Float](0)
    assert(got.length == 64)
    val drift = expect.zip(got).map { case (a, b) => math.abs(a - b) }.max
    assert(drift < 1e-4, s"column rotation drifts from driver kernel by $drift")
  }

  test("rotation preserves L2 distances (orthogonality in the plan)") {
    val pairs = stretched.as("a").crossJoin(stretched.as("b"))
      .filter(col("a.id") < col("b.id")).limit(200)
      .select(
        graft.functions.VectorExpressions.vecL2(
          col("a.embedding"), col("b.embedding")).as("raw"),
        graft.functions.VectorExpressions.vecL2(
          Opq.rotate(model, col("a.embedding")),
          Opq.rotate(model, col("b.embedding"))).as("rot"))
      .select(max(abs(col("raw") - col("rot")))).head().getDouble(0)
    assert(pairs < 1e-2, s"rotated L2 drifts from raw by $pairs")
  }

  test("OPQ reconstruction error beats plain PQ on the anisotropic corpus") {
    val pq = Pq.train(stretched, dim = 64, m = 8, k = 16, trainSize = 500)
    val pqErr = stretched
      .withColumn("deq", Pq.decode(pq, Pq.encode(pq, col("embedding"))))
      .agg(avg(pow(graft.functions.VectorExpressions.vecL2(
        col("embedding"), col("deq")), 2.0))).head().getDouble(0)
    // materialize codes first — decode's scaladoc contract (an inline
    // encode-inside-decode tree duplicates every literal d-fold)
    val opqErr = stretched
      .withColumn("codes", Opq.encode(model, col("embedding")))
      .withColumn("deq", Opq.decode(model, col("codes")))
      .agg(avg(pow(graft.functions.VectorExpressions.vecL2(
        col("embedding"), col("deq")), 2.0))).head().getDouble(0)
    assert(opqErr < pqErr,
      s"OPQ MSE $opqErr should beat plain PQ MSE $pqErr on stretched data")
  }

  test("eigenvalue-allocation init balances per-subspace variance (iters=0)") {
    val para = Opq.train(stretched, dim = 64, m = 8, k = 16,
      trainSize = 500, iters = 0)
    // per-subspace variance of the ROTATED corpus must be far flatter
    // than the raw order's: compare max/min subspace variance ratios
    def subVarRatio(rotated: Boolean): Double = {
      val colExpr = if (rotated) Opq.rotate(para, col("embedding"))
        else col("embedding")
      val sums = stretched.select(colExpr.as("e"))
        .select((0 until 8).flatMap { s =>
          Seq(aggregate(slice(col("e"), s * 8 + 1, 8), lit(0.0),
            (acc, x) => acc + x * x).as(s"ss$s"))
        }: _*)
        .agg(count(lit(1)).as("n"),
          (0 until 8).map(s => sum(col(s"ss$s")).as(s"v$s")): _*)
        .head()
      val vars = (0 until 8).map(s => sums.getDouble(s + 1) / sums.getLong(0))
      vars.max / math.max(vars.min, 1e-12)
    }
    val rawRatio = subVarRatio(rotated = false)
    val rotRatio = subVarRatio(rotated = true)
    assert(rotRatio < rawRatio / 2,
      s"allocation should flatten subspace energy: raw $rawRatio rot $rotRatio")
  }

  test("searchBatch recall on the stretched corpus >= plain PQ at the same budget") {
    val queries = stretched.filter(col("id") < 8)
      .select(col("id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = Knn.batch(stretched, queries, k = 10, metric = "l2",
      roundDecimals = 6)
    val pq = Pq.train(stretched, dim = 64, m = 8, k = 16, trainSize = 500)
    val pqEnc = stretched.select(col("id"),
      Pq.encode(pq, col("embedding")).as("codes"))
    val pqHits = Pq.adcSearchBatch(pqEnc, pq, queries, k = 10, shortlist = 30)
    val opqEnc = stretched.select(col("id"),
      Opq.encode(model, col("embedding")).as("codes"))
    val opqHits = Opq.searchBatch(opqEnc, model, queries, k = 10, shortlist = 30)
    val pqR = Ivf.evaluateRecall(pqHits, exact).select("avg_recall")
      .head().getDouble(0)
    val opqR = Ivf.evaluateRecall(opqHits, exact).select("avg_recall")
      .head().getDouble(0)
    assert(opqR >= pqR,
      s"OPQ recall $opqR should be >= plain PQ recall $pqR on stretched data")
    // ADC-only (no rerank) 4-bit codes on a variance-concentrated corpus:
    // the absolute bar is modest by construction; the REAL gate is the
    // comparative one above (and the rerank'd ann_opq query row)
    assert(opqR >= 0.3, s"OPQ recall $opqR under the 0.3 ADC-only gate")
  }

  test("searchBatchIvf: full probe + exact rerank equals the exact top-k") {
    import spark.implicits._
    // coarse clusters in RAW space — exactly the store's layout: the
    // probe and rerank run raw, only the ADC tables see the rotation
    val cents = Ivf.train(stretched, Ivf.IvfConfig(nClusters = 4))
    val assigned = Ivf.assign(stretched, cents, embCol = "embedding")
    val enc = assigned.select(col("id"),
      col("cluster_id").cast("long").as("cluster_id"),
      Opq.encode(model, col("embedding")).as("codes"))
    val queries = stretched.filter(col("id") < 6)
      .select(col("id").as("query_id"), col("embedding").as("q_embedding"))
    // nProbe = all clusters and a corpus-sized shortlist: the rotated ADC
    // ranking covers everything, so the raw-space rerank must reproduce
    // the exact answer bit-for-bit (ids AND distances)
    val n = stretched.count().toInt
    val got = Opq.searchBatchIvf(enc, cents, model, queries, k = 5,
      nProbe = 4, shortlist = n, rerank = Some(stretched))
      .select(col("query_id"), col("id"), round(col("distance"), 6).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Knn.batch(stretched, queries, k = 5, metric = "l2",
      roundDecimals = 6)
      .select(col("query_id"), col("id"), col("distance"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exact, "full-probe IVF-OPQ with exact rerank must equal exact")
  }

  test("save/load round-trips rotation and codebooks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_opq_").toString
    try {
      Opq.save(spark, model, dir + "/m")
      val back = Opq.load(spark, dir + "/m")
      assert(back.rotation.length == 64)
      assert(back.rotation.zip(model.rotation).forall {
        case (a, b) => a.sameElements(b)
      })
      assert(back.pq.m == model.pq.m && back.pq.k == model.pq.k)
      assert(flatBooks(back.pq) == flatBooks(model.pq))
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("train is deterministic for a fixed seed") {
    val a = Opq.train(stretched, dim = 64, m = 8, k = 16,
      trainSize = 500, iters = 2, seed = 7L)
    val b = Opq.train(stretched, dim = 64, m = 8, k = 16,
      trainSize = 500, iters = 2, seed = 7L)
    assert(a.rotation.zip(b.rotation).forall {
      case (x, y) => x.sameElements(y)
    })
    assert(flatBooks(a.pq) == flatBooks(b.pq))
  }

  test("argument validation") {
    intercept[IllegalArgumentException] {
      Opq.train(stretched, dim = 64, m = 65, k = 4, trainSize = 10)
    }
    intercept[IllegalArgumentException] {
      Opq.train(stretched, dim = 64, m = 8, k = 4, trainSize = 10, iters = -1)
    }
    intercept[IllegalArgumentException] {
      Opq.train(stretched, dim = 64, m = 8, k = 0, trainSize = 10)
    }
    // a dim that disagrees with the corpus width is a loud contract
    // error, not an AIOOBE deep inside the covariance loops
    val e = intercept[IllegalArgumentException] {
      Opq.train(stretched, dim = 32, m = 8, k = 4, trainSize = 10)
    }
    assert(e.getMessage.contains("dim"))
  }
}
