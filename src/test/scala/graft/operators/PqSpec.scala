package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val corpus = emb.select(col("vec_id").as("id"), col("embedding")).cache()
  private lazy val model = Pq.train(corpus, dim = 64, m = 8, k = 16)

  test("train produces m codebooks of k x subDim") {
    assert(model.codebooks.length == 8)
    assert(model.codebooks.forall(_.length == 16))
    assert(model.codebooks.forall(_.forall(_.length == 8)))
  }

  test("uneven dims: last subspace takes the remainder (reference split rule)") {
    // vector_ops.rs:410-421 — subvector_dim = dim/m floored, the LAST
    // subspace runs to vector_dim; dim=64 with m=7 gives widths 9..9,10
    val m7 = Pq.train(corpus, dim = 64, m = 7, k = 8)
    assert(m7.codebooks.length == 7)
    assert((0 until 6).forall(s => m7.subLen(s) == 9))
    assert(m7.subLen(6) == 10)
    val enc = corpus.withColumn("codes", Pq.encode(m7, col("embedding")))
    // decode covers all 64 dims and codes stay in range
    val r = enc.withColumn("deq", Pq.decode(m7, col("codes")))
      .select(size(col("deq")).as("dlen"),
        forall(col("codes"), c => c >= 0 && c < 8).as("ok"))
      .agg(min("dlen"), max("dlen"), min("ok")).head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 64 && r.getBoolean(2))
    // ADC distance over the uneven split equals the exact squared L2 to
    // the reconstruction (the lookup tables must cover the remainder dims)
    val q = emb.filter(col("vec_id") === 5).select("embedding")
      .head().getSeq[Float](0).toArray
    val chk = enc.limit(50)
      .withColumn("deq", Pq.decode(m7, col("codes")))
      .select(abs(Pq.adcDistSq(m7, q, col("codes")) -
        pow(graft.functions.VectorExpressions.vecL2(
          typedLit(q), col("deq")), 2.0)).as("diff"))
      .agg(max("diff")).head().getDouble(0)
    assert(chk < 1e-3, s"ADC vs reconstruction drift $chk")
    // residual variant trains and keeps the same widths
    val cents = graft.queries.QueryShapes.labelCentroids(emb)
      .select(col("label").cast("long").as("cluster_id"), col("centroid"))
    val assigned = emb.select(col("vec_id").as("id"), col("embedding"),
      col("label").cast("long").as("cluster_id"))
    val rm = Pq.trainResidual(assigned, cents, dim = 64, m = 7, k = 8)
    assert((0 until 6).forall(s => rm.subLen(s) == 9) && rm.subLen(6) == 10)
  }

  test("encode emits valid codes; decode reconstructs within tolerable error") {
    val enc = corpus.withColumn("codes", Pq.encode(model, col("embedding"))).cache()
    val codes = enc.select(explode(col("codes"))).distinct().collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 16))
    val err = enc.withColumn("deq", Pq.decode(model, col("codes")))
      .select(avg(graft.functions.VectorExpressions.vecL2(col("embedding"), col("deq")))
        .as("avg_err"),
        avg(graft.functions.VectorExpressions.vecNorm(col("embedding"))).as("avg_norm"))
      .head()
    // reconstruction error well below the vector magnitude (lossy but sane)
    assert(err.getDouble(0) < err.getDouble(1), s"err=$err")
    enc.unpersist()
  }

  test("ADC search recall vs exact on k=10") {
    // averaged over 16 queries: single-query PQ recall at this coarse
    // budget (8x16 codes on 64 dims) swings ~0.1-0.5 with the k-means
    // seed — the aggregate is the stable quantity (measured 0.31-0.39
    // across seeds 40-44 for both init schemes)
    val enc = corpus.withColumn("codes", Pq.encode(model, col("embedding")))
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val approx = Pq.adcSearchBatch(enc, model, queries, k = 10, shortlist = 10)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(approx.select("query_id", "id"), exact)
      .head().getDouble(0)
    assert(recall >= 0.25, s"ADC recall $recall") // PQ8x16 on 64-dim is coarse
  }

  test("adcSearchBatch (one plan) agrees with per-query adcSearch") {
    val enc = corpus.withColumn("codes", Pq.encode(model, col("embedding")))
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val batch = Pq.adcSearchBatch(enc.select(col("id"), col("codes")),
        model, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(h => (h._2, h._3)).toSet).toMap
    val single = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .map { case (qid, qv) =>
        qid -> Pq.adcSearch(enc, model, qv, k = 5)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      }.toMap
    assert(batch == single)
  }

  test("save/load round-trips the codebooks exactly") {
    val path = java.nio.file.Files.createTempDirectory("graft_pq_rt_").toString + "/books"
    Pq.save(spark, model, path)
    val back = Pq.load(spark, path)
    assert((back.m, back.k, back.subDim) == ((model.m, model.k, model.subDim)))
    for (s <- 0 until model.m; c <- 0 until model.k)
      assert(back.codebooks(s)(c).sameElements(model.codebooks(s)(c)), s"cell ($s,$c)")
  }

  test("IVF-PQ: ADC within probed lists + exact rerank beats plain ADC recall") {
    val cents = graft.queries.QueryShapes.labelCentroids(emb)
      .select(col("label").cast("long").as("cluster_id"), col("centroid"))
    val enc = emb.select(col("vec_id").as("id"),
      col("label").cast("long").as("cluster_id"),
      Pq.encode(model, col("embedding")).as("codes"))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val approx = Pq.searchBatchIvfPq(enc, cents, model, queries,
      k = 10, nProbe = 5, shortlist = 100, rerank = Some(corpus))
    assert(approx.filter(col("rank") === 1).count() == 8)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    assert(recall >= 0.5, s"IVF-PQ recall $recall")
    // without rerank the results are ADC-ordered but still well-formed
    val noRerank = Pq.searchBatchIvfPq(enc, cents, model, queries,
      k = 10, nProbe = 5, shortlist = 100)
    assert(noRerank.groupBy("query_id").count().collect().forall(_.getLong(1) == 10))
  }

  test("residual IVF-PQ: lower reconstruction error, recall at least plain IVF-PQ") {
    val cents = graft.queries.QueryShapes.labelCentroids(emb)
      .select(col("label").cast("long").as("cluster_id"), col("centroid"))
    val assigned = emb.select(col("vec_id").as("id"), col("embedding"),
      col("label").cast("long").as("cluster_id"))
    val rModel = Pq.trainResidual(assigned, cents, dim = 64, m = 8, k = 16)
    // reconstruction: centroid + decode(residual codes) vs plain decode —
    // residuals have less variance, so the same m x k budget fits tighter
    val centsMap = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val centLit = typedLit(Array.tabulate(centsMap.size)(i => centsMap(i.toLong)))
    def mse(df: org.apache.spark.sql.DataFrame, recon: org.apache.spark.sql.Column) =
      df.select(avg(aggregate(
        zip_with(col("embedding"), recon, (a, b) => (a - b) * (a - b)),
        lit(0.0), (a, v) => a + v))).head().getDouble(0)
    val rEnc = assigned.withColumn("codes",
      Pq.encodeResidual(rModel, cents, col("embedding"), col("cluster_id")))
    val rErr = mse(rEnc, zip_with(
      element_at(centLit, col("cluster_id").cast("int") + 1),
      Pq.decode(rModel, col("codes")), (a, b) => a + b))
    val pErr = mse(assigned.withColumn("codes", Pq.encode(model, col("embedding"))),
      Pq.decode(model, col("codes")))
    assert(rErr < pErr, s"residual mse $rErr !< plain mse $pErr")
    // search: same coarse pruning, per-(query, cluster) ADC tables
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val rApprox = Pq.searchBatchIvfPqResidual(
      rEnc.select(col("id"), col("cluster_id"), col("codes")), cents, rModel,
      queries, k = 10, nProbe = 5, shortlist = 100, rerank = Some(corpus))
    val rRecall = Ivf.evaluateRecall(rApprox, exact).head().getDouble(0)
    val pApprox = Pq.searchBatchIvfPq(
      emb.select(col("vec_id").as("id"), col("label").cast("long").as("cluster_id"),
        Pq.encode(model, col("embedding")).as("codes")),
      cents, model, queries, k = 10, nProbe = 5, shortlist = 100,
      rerank = Some(corpus))
    val pRecall = Ivf.evaluateRecall(pApprox, exact).head().getDouble(0)
    // the MSE dominance above is the robust residual-PQ claim; recall at
    // k=10 over 8 queries is a noisier estimate of the same ordering, so
    // allow one flipped hit (1/80) of seed slack rather than demanding
    // strict per-seed dominance of an on-average property
    assert(rRecall >= pRecall - 0.0125 - 1e-9,
      s"residual recall $rRecall < plain $pRecall beyond 1-hit slack")
    assert(rApprox.groupBy("query_id").count().collect().forall(_.getLong(1) == 10))
  }

  test("IVF-PQ cosine: inner-product ADC shortlist + exact cosine rerank") {
    val cents = graft.queries.QueryShapes.labelCentroids(emb)
      .select(col("label").cast("long").as("cluster_id"), col("centroid"))
    val enc = emb.select(col("vec_id").as("id"),
      col("label").cast("long").as("cluster_id"),
      Pq.encode(model, col("embedding")).as("codes"))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val nClusters = cents.count().toInt
    val approx = Pq.searchBatchIvfPq(enc, cents, model, queries,
      k = 10, nProbe = nClusters, shortlist = 100, rerank = Some(corpus),
      metric = "cosine")
    // every query is a corpus row: rank-1 must be itself at cosine
    // distance 0 (the rerank is exact even though the shortlist is PQ)
    val self = approx.filter(col("rank") === 1 && col("query_id") === col("id"))
    assert(self.count() == 8)
    assert(self.select(max(abs(col("distance")))).head().getDouble(0) < 1e-6)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "cosine")
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    // full probe + PQ8x16 inner-product shortlist at this corpus size:
    // the exact rerank recovers most of the true cosine top-k
    assert(recall >= 0.8, s"IVF-PQ cosine recall $recall")
    // approximate-only path (no rerank): well-formed, distances in [0, 2]
    val noRerank = Pq.searchBatchIvfPq(enc, cents, model, queries,
      k = 10, nProbe = nClusters, shortlist = 100, metric = "cosine")
    val rng = noRerank.agg(min("distance"), max("distance")).head()
    assert(rng.getDouble(0) >= -1e-9 && rng.getDouble(1) <= 2.0 + 1e-9, s"$rng")
  }

  test("query expansion: n variants, variant 0 intact, magnitude preserved") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val ex = QueryExpansion.expand(queries, variants = 4, noise = 0.05).cache()
    assert(ex.count() == 12)
    // variant 0 equals the original embedding
    val v0 = ex.filter(col("variant") === 0)
      .join(queries.withColumnRenamed("q_embedding", "orig"), "query_id")
      .filter(col("q_embedding") =!= col("orig")).count()
    assert(v0 == 0)
    // magnitudes preserved within float tolerance
    val norms = ex.join(queries.withColumnRenamed("q_embedding", "orig"), "query_id")
      .select(
        graft.functions.VectorExpressions.vecNorm(col("q_embedding")).as("n1"),
        graft.functions.VectorExpressions.vecNorm(col("orig")).as("n0"))
      .collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-3))
    // hash-derived noise is partition-invariant: the same queries through
    // a different layout draw byte-identical variants (rand(seed) would
    // not — its stream follows the partition index)
    val again = QueryExpansion.expand(queries.repartition(7), variants = 4, noise = 0.05)
    assert(ex.select("query_id", "variant", "q_embedding")
      .exceptAll(again.select("query_id", "variant", "q_embedding")).count() == 0)
    ex.unpersist()
  }
}
