package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization on the real 64-dim embeddings table:
  * packing correctness against an independent per-dim formulation, Hamming
  * kernel identity, and shortlist+rerank search quality vs exact. */
class BqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val corpus = emb.select(col("vec_id").as("id"), col("embedding"))

  test("packed words encode exactly the per-dimension sign bits") {
    // independent formulation: bit j of word w as an explicit per-dim list
    val bits = transform(sequence(lit(1), lit(64)),
      i => when(element_at(col("embedding"), i.cast("int")) >= 0f, 1L).otherwise(0L))
    val rebuilt = transform(sequence(lit(0), lit(1)), w =>
      aggregate(sequence(lit(0), lit(31)), lit(0L),
        (acc, j) => acc + element_at(bits, (w * 32 + j + 1).cast("int"))
          * pow(lit(2.0), j).cast("long")))
    val mismatches = emb
      .select(Bq.encode(col("embedding"), 64).as("a"), rebuilt.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("ragged dimension: trailing word only carries dim%32 bits") {
    import spark.implicits._
    // dim=40: word 1 must use bits 0..7 only, and all-negative packs to 0
    val df = Seq(
      (1L, Array.fill(40)(1.0f)),
      (2L, Array.fill(40)(-1.0f))).toDF("id", "embedding")
    val rows = df.select(col("id"), Bq.encode(col("embedding"), 40).as("w"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Long](1) == Seq(0xFFFFFFFFL, 0xFFL))
    assert(rows(1).getSeq[Long](1) == Seq(0L, 0L))
  }

  test("driver-side packWords is bit-identical to the encode expression") {
    // the IVF-probed path pre-packs query words on the driver; a drift
    // between the two packings would silently corrupt every hamming
    val rows = emb.select(col("vec_id"), col("embedding"),
        Bq.encode(col("embedding"), 64).as("words"))
      .collect()
    rows.foreach { r =>
      val viaExpr = r.getSeq[Long](2)
      val viaDriver = Bq.packWords(r.getSeq[Float](1).toArray).toSeq
      assert(viaExpr == viaDriver, s"vec_id=${r.getLong(0)}")
    }
    // edge values the corpus may not contain: -0.0 packs as a 1 bit (>= 0)
    // in both, ragged dims agree
    val edge = Array(-0.0f, 0.0f, -1.5f, Float.MinPositiveValue, -Float.MinPositiveValue)
    import spark.implicits._
    val e2 = Seq(Tuple1(edge)).toDF("embedding")
      .select(Bq.encode(col("embedding"), 5).as("w")).head().getSeq[Long](0)
    assert(e2 == Bq.packWords(edge).toSeq)
    // NaN: Spark SQL orders NaN as the LARGEST value so encode's `>= 0`
    // sets the bit — the driver packer must agree (Scala's >= is false
    // for NaN, the divergence that would inflate every Hamming distance)
    val nan = Array(Float.NaN, -1.0f, Float.NaN, 2.0f)
    val e3 = Seq(Tuple1(nan)).toDF("embedding")
      .select(Bq.encode(col("embedding"), 4).as("w")).head().getSeq[Long](0)
    assert(e3 == Bq.packWords(nan).toSeq, s"expr=$e3 driver=${Bq.packWords(nan).toSeq}")
  }

  test("hamming over packed words equals per-dimension sign disagreement") {
    val q = emb.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray
    val qc = typedLit(q)
    val naive = aggregate(sequence(lit(1), lit(64)), lit(0L), (acc, i) =>
      acc + when((element_at(col("embedding"), i.cast("int")) >= 0f) =!=
        (element_at(qc, i.cast("int")) >= 0f), 1L).otherwise(0L))
    val mismatches = emb
      .select(Bq.hamming(Bq.encode(col("embedding"), 64),
        Bq.encode(qc, 64)).as("a"), naive.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("hamming shortlist + exact rerank: self-retrieval and recall") {
    val enc = corpus.select(col("id"), Bq.encode(col("embedding"), 64).as("words"))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val approx = Bq.searchBatch(enc, queries, dim = 64, k = 10,
      shortlist = 50, rerank = Some(corpus))
    // the query is a corpus row: hamming 0 keeps it in every shortlist and
    // the exact rerank puts it first at distance 0
    assert(approx.filter(col("rank") === 1 && col("query_id") === col("id"))
      .count() == 8)
    val exact = Knn.batch(corpus, queries, k = 10, metric = "l2")
    val recall = Ivf.evaluateRecall(approx, exact).head().getDouble(0)
    // 1 bit/dim is the coarsest tier; with a 50-deep shortlist over 100
    // rows-ish per query the rerank recovers most true neighbors
    assert(recall >= 0.5, s"BQ recall $recall")
  }

  test("no rerank returns raw hamming distances") {
    val enc = corpus.select(col("id"), Bq.encode(col("embedding"), 64).as("words"))
    val queries = emb.filter(col("vec_id") === 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val top = Bq.searchBatch(enc, queries, dim = 64, k = 5, shortlist = 20)
      .filter(col("rank") === 1).head()
    assert(top.getLong(1) == 3L) // self at hamming 0
    assert(top.getDouble(2) == 0.0)
  }
}
