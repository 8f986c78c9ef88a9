package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (SURVEY.md §2.4 A2 + §2.8 M12,
  * `/root/reference/src/core/vector_ops.rs:405-577`): split the embedding
  * into m subspaces, k-means each subspace into k codes, store vectors as m
  * uint8 codes. Training is MLlib KMeans per subspace (distributed, sampled)
  * instead of the reference's in-memory Lloyd loop; encode/decode/ADC are
  * pure column expressions over broadcast codebook literals — map-only at
  * any scale.
  */
object Pq {

  /** codebooks(sub)(code) = centroid of that subspace cell. */
  case class PqModel(m: Int, k: Int, subDim: Int,
      codebooks: Array[Array[Array[Float]]])

  def train(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
      embCol: String = "embedding", trainSize: Int = 10000,
      seed: Long = 42L): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    // PQ codebooks train on a BOUNDED sample by design (reference
    // train_size, `vector_ops.rs:405-523`). One pass, no count(): project
    // the embedding column, per-partition top-trainSize by rand, collect.
    // The m tiny Lloyd fits (k x subDim each) run in-driver — one Spark job
    // total instead of 8 MLlib fits whose scheduling overhead dwarfs ~2.5M
    // flops of actual math.
    val sample: Array[Array[Float]] = corpus.select(embCol)
      .orderBy(org.apache.spark.sql.functions.rand(seed)).limit(trainSize)
      .collect().map(_.getSeq[Float](0).toArray)
    val books = Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      Lloyd.kmeans(sub, k, maxIter = 25, seed = seed + s)
    }
    PqModel(m, k, subDim, books)
  }

  /** Encode: embedding -> ARRAY<INT> of m codes (map-only). Each subspace
    * code is the codegen NearestCentroid argmin over its codebook —
    * no interpreted per-cell lambda. */
  def encode(model: PqModel, embCol: Column): Column =
    array((0 until model.m).map { s =>
      graft.functions.VectorExpressions.nearestCentroid(
        slice(embCol, s * model.subDim + 1, model.subDim), model.codebooks(s), "l2")
    }: _*)

  /** Decode: codes -> reconstructed ARRAY<FLOAT>. */
  def decode(model: PqModel, codesCol: Column): Column = {
    val books = typedLit(model.codebooks) // [m][k][subDim]
    flatten(zip_with(books, codesCol, (book, c) => element_at(book, c + 1)))
  }

  /** Asymmetric-distance (ADC) squared-L2 between a raw query vector and
    * encoded codes: per-subspace lookup table, summed — the classic PQ
    * search kernel, here one aggregate over a broadcast table literal. */
  def adcDistSq(model: PqModel, query: Array[Float], codesCol: Column): Column = {
    // table(sub)(code) = ||query_sub - centroid||^2, precomputed driver-side
    val table: Array[Array[Double]] = Array.tabulate(model.m) { s =>
      val qs = query.slice(s * model.subDim, (s + 1) * model.subDim)
      model.codebooks(s).map { c =>
        var acc = 0.0; var i = 0
        while (i < qs.length) { val d = qs(i).toDouble - c(i).toDouble; acc += d * d; i += 1 }
        acc
      }
    }
    val tableLit = typedLit(table)
    aggregate(zip_with(tableLit, codesCol, (row, c) => element_at(row, c + 1)),
      lit(0.0), (a, v) => a + v)
  }

  /** PQ-approximate k-NN over an encoded corpus: map-only ADC distance +
    * TakeOrderedAndProject. */
  def adcSearch(encoded: DataFrame, model: PqModel, query: Array[Float], k: Int,
      idCol: String = "id", codesCol: String = "codes"): DataFrame =
    encoded.select(col(idCol).as("id"),
        sqrt(adcDistSq(model, query, col(codesCol))).as("distance"))
      .orderBy(col("distance").asc, col("id").asc).limit(k)
}
