package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization: a fourth code tier alongside PQ
  * ([[Pq]]) and scalar-u8 ([[Sq]]). Each f32 embedding becomes one sign
  * bit per dimension, packed 32 bits per LONG word — dim/8 bytes instead
  * of 4·dim (32× compression), and candidate scoring is Hamming distance
  * via `bit_count(xor(...))`, pure integer ALU work inside whole-stage
  * codegen. The reference stops at u8 scalar quantization
  * (`/root/reference/src/core/vector_ops.rs:349-387`); sign-bit codes are
  * the natural next rung on the same ladder and the cheapest shortlist
  * filter that still correlates with cosine/L2 on centered data.
  *
  * 100 TB story: the code table is 32× smaller than the raw vectors, so a
  * full-corpus Hamming scan touches dim/8 bytes per row with no floating
  * point at all; raw embeddings are read only for the shortlist×queries
  * rerank rows. Encode is map-only (no trained model), so re-encode after
  * maintenance needs no training pass — the same property that makes the
  * SQ tier cheap to keep fresh.
  *
  * Everything here is built from codegen'd built-ins (transform /
  * aggregate / zip_with / bit_count / shiftleft) — no UDFs — and the bit
  * packing uses 32-bit sub-words in LONG so the DuckDB oracle can rebuild
  * the identical words without 64-bit shift overflow.
  */
object Bq {

  /** Words needed for `dim` sign bits at 32 bits per word. */
  def wordsFor(dim: Int): Int = (dim + 31) / 32

  private val pow2: Column =
    typedLit(Array.tabulate(32)(j => 1L << j))

  /** Encode an `ARRAY<FLOAT>` column of fixed dimension `dim` into
    * ARRAY<LONG> packed sign-bit words: bit j of word w is 1 iff
    * embedding[32w+j] >= 0 (so -0.0 and +0.0 agree across engines). */
  def encode(emb: Column, dim: Int): Column = {
    val words = wordsFor(dim)
    transform(sequence(lit(0), lit(words - 1)), w =>
      aggregate(
        // bit positions that exist in this word (guards a ragged last word)
        sequence(lit(0), least(lit(31), lit(dim - 1) - w * 32)),
        lit(0L),
        (acc, j) => acc + when(
          element_at(emb, (w * 32 + j + 1).cast("int")) >= 0f,
          element_at(pow2, j + 1)).otherwise(0L)))
  }

  /** Hamming distance between two packed sign-bit word arrays — the
    * codegen [[graft.functions.kernels.HammingWords]] kernel (zip_with/
    * aggregate would run interpreted per element and dominate the scan). */
  def hamming(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.hammingWords(a, b)

  /** Driver-side sign-bit packing — bit-identical to [[encode]] (BqSpec
    * pins the identity); used to pre-encode bounded query batches into
    * local relations so the scan-side kernel is two xor+popcounts per
    * word, never a per-candidate re-encode of the query. */
  def packWords(v: Array[Float]): Array[Long] = {
    val words = new Array[Long](wordsFor(v.length))
    var i = 0
    while (i < v.length) {
      // NaN sets the bit: Spark SQL's comparison semantics order NaN as
      // the LARGEST value, so [[encode]]'s `emb[i] >= 0f` is true for NaN
      // — Scala's `>=` is false for NaN, and the documented bit-identity
      // between driver-packed queries and scan-encoded codes would break
      // on any NaN dimension (every pair's Hamming distance inflated)
      if (v(i) >= 0f || v(i).isNaN) words(i >> 5) |= 1L << (i & 31)
      i += 1
    }
    words
  }

  /** IVF-pruned Hamming search for the store's code tier (the [[Sq]]
    * composition shape with sign-bit codes): driver-selected n_probe
    * clusters prune the code-table scan to probed partitions, candidates
    * score by xor+popcount against the pre-packed query words riding the
    * broadcast probe relation, and the per-query shortlist exact-reranks
    * against raw vectors under `metric`. 32× less IO than the raw tier and
    * integer-only ALU on the scan — the cheapest serving tier on the
    * PQ/SQ/BQ ladder.
    *
    * @param encoded (idCol, cluster_id LONG, words ARRAY<LONG>)
    */
  def searchBatchIvfBq(encoded: DataFrame, centroids: DataFrame,
      queries: DataFrame, dim: Int, k: Int, nProbe: Int, shortlist: Int = 100,
      rerank: Option[DataFrame] = None, idCol: String = "id",
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding",
      metric: String = "l2"): DataFrame = {
    val spark = queries.sparkSession
    val (pRows, pSchema) = Ivf.probeRows(centroids, queries, nProbe, metric,
      queryIdCol, queryEmbCol)
    // ride the packed query words on the probe relation (driver-packed:
    // the batch is bounded, and the scan must not re-encode per candidate)
    val pwSchema = pSchema.add(org.apache.spark.sql.types.StructField("q_words",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType),
      nullable = false))
    val pwRows = pRows.map { r =>
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        r.toSeq.toArray :+ (packWords(r.getSeq[Float](1).toArray).toSeq: Any),
        pwSchema): org.apache.spark.sql.Row
    }
    val p = spark.createDataFrame(java.util.Arrays.asList(pwRows: _*), pwSchema)
    val probedIds = pRows.map(_.getAs[Long]("cluster_id")).distinct
    val pruned = encoded.filter(col("cluster_id").isin(probedIds: _*))
    val scored = pruned
      .join(broadcast(p), pruned("cluster_id") === p("cluster_id"))
      .select(col(queryIdCol), col(idCol).as("id"),
        hamming(col("words"), col("q_words")).cast("double").as("distance"))
    val idIsString =
      encoded.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    Ivf.shortlistRerankTopK(scored,
      queries.select(col(queryIdCol), col(queryEmbCol)),
      k, shortlist, idIsString, rerank, idCol, queryIdCol, queryEmbCol, metric)
  }

  /** Batch Hamming search over packed codes with exact rerank: score every
    * code row against each query's sign bits (integer xor+popcount over a
    * 32×-compressed table), keep a per-query `shortlist` via the grouped
    * top-k aggregator (ties (hamming, id) — the oracle's ordering), then
    * rerank the shortlist against raw vectors under `metric`, rounding
    * BEFORE the final top-k (the round-then-rank convention every exact
    * query shares with its DuckDB oracle — ranking unrounded would let a
    * last-ulp summation-order difference flip near-ties).
    *
    * @param encoded (idCol, words ARRAY<LONG>) — from [[encode]]
    * @param queries (queryIdCol, queryEmbCol ARRAY<FLOAT>) — bounded batch
    * @param rerank  optional (idCol, embedding) raw vectors; None returns
    *                Hamming distances directly
    */
  def searchBatch(encoded: DataFrame, queries: DataFrame, dim: Int, k: Int,
      shortlist: Int = 100, rerank: Option[DataFrame] = None,
      idCol: String = "id", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", metric: String = "l2",
      roundDecimals: Int = -1): DataFrame = {
    val q = queries.select(col(queryIdCol), col(queryEmbCol),
      encode(col(queryEmbCol), dim).as("q_words"))
    val scored = encoded.crossJoin(broadcast(q.select(col(queryIdCol), col("q_words"))))
      .select(col(queryIdCol), col(idCol).as("id"),
        hamming(col("words"), col("q_words")).cast("double").as("distance"))
    val idIsString =
      encoded.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    val topShort = if (idIsString) TopK.topKStr(shortlist) else TopK.topK(shortlist)
    val short = scored.groupBy(queryIdCol)
      .agg(topShort(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), explode(col("hits")).as("hit"))
      .select(col(queryIdCol), col("hit.id").as("id"), col("hit.dist").as("distance"))
    val ranked = rerank match {
      case None => short
      case Some(raw) =>
        val dRaw = Knn.distance(metric, col("embedding"), col(queryEmbCol))
        val d = if (roundDecimals >= 0) round(dRaw, roundDecimals) else dRaw
        // the shortlist is bounded (|queries| x shortlist): broadcast it
        // into the raw scan instead of shuffling the corpus through a
        // sort-merge join — the rerank must touch shortlist x queries
        // rows, never re-shuffle the table it pruned
        raw.select(col(idCol).as("id"), col("embedding"))
          .join(broadcast(short.select(col(queryIdCol), col("id"))), Seq("id"))
          .join(broadcast(q.select(col(queryIdCol), col(queryEmbCol))), Seq(queryIdCol))
          .select(col(queryIdCol), col("id"), d.as("distance"))
    }
    val topk = if (idIsString) TopK.topKStr(k) else TopK.topK(k)
    ranked.groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).cast("long").as("rank"))
  }
}
