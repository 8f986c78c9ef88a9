package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-SQ on the real 64-dim embeddings table: quantization fidelity and
  * search recall at realistic geometry (StoreIndexSpec covers the store
  * composition on toy 8-dim vectors; this pins the quality story). */
class SqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val corpus = emb.select(col("vec_id").as("id"), col("embedding")).cache()

  private lazy val enc = emb.select(col("vec_id").as("id"),
      col("label").cast("long").as("cluster_id"),
      Sq.encode(col("embedding")).as("sq"))
    .select(col("id"), col("cluster_id"), col("sq.codes").as("codes"),
      col("sq.vmin").as("vmin"), col("sq.vmax").as("vmax"))

  test("codegen encoder agrees with quantizeU8 on exact half-step ties") {
    import spark.implicits._
    // scaled value of 0.5 over range [0, 255] lands exactly on a .5 tie:
    // HALF_UP (Spark round, quantizeU8) gives code 1; rint's HALF_EVEN
    // would give 0 — the two encoders must share one tie rule
    val v = Array(0.0f, 0.5f, 2.5f, 255.0f)
    val row = Seq(Tuple1(v)).toDF("embedding")
      .select(Sq.encode(col("embedding")).as("sq"),
        graft.functions.VectorFunctions.quantizeU8(col("embedding")).as("ref"))
      .head()
    val codes = row.getStruct(0).getAs[Array[Byte]]("codes")
      .map(b => b & 0xff).toSeq
    val ref = row.getStruct(1).getSeq[Int](0)
    assert(codes == ref, s"codegen=$codes quantizeU8=$ref")
    assert(codes(1) == 1 && codes(2) == 3, codes.toString) // HALF_UP ties
  }

  test("u8 approximate distance tracks exact L2 on real embeddings") {
    val q = emb.filter(col("vec_id") === 5)
      .select("embedding").head().getSeq[Float](0).toArray
    val stats = enc.join(corpus, Seq("id"))
      .select(abs(
        graft.functions.VectorExpressions.sqDequantL2(
          typedLit(q), col("codes"), col("vmin"), col("vmax")) -
        graft.functions.VectorExpressions.vecL2(
          typedLit(q), col("embedding"))).as("err"),
        graft.functions.VectorExpressions.vecL2(
          typedLit(q), col("embedding")).as("exact"))
      .agg(max("err").as("max_err"), avg("exact").as("avg_exact")).head()
    // u8 on unit-ish 64-dim vectors: worst-case distance error stays well
    // below the typical pair distance, so rankings survive quantization
    assert(stats.getDouble(0) < stats.getDouble(1) * 0.05,
      s"max_err=${stats.getDouble(0)} avg_exact=${stats.getDouble(1)}")
  }

  test("IVF-SQ with exact rerank: self-retrieval and recall vs exact") {
    val cents = graft.queries.QueryShapes.labelCentroids(emb)
      .select(col("label").cast("long").as("cluster_id"), col("centroid"))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val approx = Sq.searchBatchIvfSq(enc, cents, queries,
      k = 10, nProbe = 5, shortlist = 100, rerank = Some(corpus))
    // rank-1 self-retrieval: the query IS a corpus row, the probed cluster
    // contains it, the u8 shortlist keeps it, the rerank puts it first
    assert(approx.filter(col("rank") === 1 && col("query_id") === col("id"))
      .count() == 8)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    // partial probe: recall is bounded by probe coverage (5 of 8 label
    // clusters), same regime as the PQ path's 0.5 gate
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    assert(recall >= 0.5, s"IVF-SQ recall $recall")
    // full probe (all 10 label-clusters) isolates the quantization: u8
    // distances are near-exact (see the error-bound test), so with every
    // cluster probed and the true neighbors inside the shortlist, the
    // exact rerank recovers exact top-k
    val nClusters = cents.count().toInt
    val full = Sq.searchBatchIvfSq(enc, cents, queries,
      k = 10, nProbe = nClusters, shortlist = 100, rerank = Some(corpus))
    val fullRecall = Ivf.evaluateRecall(full, exact).head().getDouble(0)
    assert(fullRecall >= 0.99, s"full-probe IVF-SQ recall $fullRecall")
  }

  test("labelCentroids of an empty frame is empty (no head-on-nothing crash)") {
    val none = graft.queries.QueryShapes.labelCentroids(
      emb.filter(col("vec_id") < 0))
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("label", "centroid"))
  }

  test("Sq.decode of an empty codes payload is an empty vector") {
    import spark.implicits._
    val row = Seq((Array.empty[Byte], 0f, 0f)).toDF("codes", "vmin", "vmax")
      .select(Sq.decode(col("codes"), col("vmin"), col("vmax")).as("v"))
      .head()
    assert(row.getSeq[Float](0).isEmpty)
  }

  test("u8 approximate cosine tracks exact cosine on real embeddings") {
    val q = emb.filter(col("vec_id") === 5)
      .select("embedding").head().getSeq[Float](0).toArray
    val maxErr = enc.join(corpus, Seq("id"))
      .select(abs(
        graft.functions.VectorExpressions.sqDequantCosine(
          typedLit(q), col("codes"), col("vmin"), col("vmax")) -
        (lit(1.0) - graft.functions.VectorExpressions.vecCosine(
          typedLit(q), col("embedding")))).as("err"))
      .agg(max("err")).head().getDouble(0)
    // cosine distance lives in [0, 2]; u8 dequantization moves it by well
    // under the gap between distinct neighbors at this geometry
    assert(maxErr < 0.01, s"max cosine err $maxErr")
  }

  test("IVF-SQ cosine: self-retrieval at distance 0, full-probe recall vs exact cosine") {
    val cents = graft.queries.QueryShapes.labelCentroids(emb)
      .select(col("label").cast("long").as("cluster_id"), col("centroid"))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val nClusters = cents.count().toInt
    val approx = Sq.searchBatchIvfSq(enc, cents, queries,
      k = 10, nProbe = nClusters, shortlist = 100, rerank = Some(corpus),
      metric = "cosine")
    val self = approx.filter(col("rank") === 1 && col("query_id") === col("id"))
      .select(max(abs(col("distance")))).head()
    assert(!self.isNullAt(0) && self.getDouble(0) < 1e-6,
      s"rank-1 cosine self-distance $self")
    assert(approx.filter(col("rank") === 1 && col("query_id") === col("id"))
      .count() == 8)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "cosine")
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    assert(recall >= 0.99, s"full-probe IVF-SQ cosine recall $recall")
  }
}
