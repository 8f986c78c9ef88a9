package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Scalar (u8) quantization as a searchable storage tier (SURVEY.md §2.8
  * M11 taken to the storage layer; the reference keeps it utility-only,
  * `/root/reference/src/core/vector_ops.rs:349-387`): vectors stored as
  * per-vector affine u8 codes in a BINARY column — dim bytes instead of
  * 4·dim — searched by dequantize-on-the-fly asymmetric L2 inside a probed
  * inverted file, with exact rerank of the shortlist. No trained model:
  * the affine params (vmin, vmax) ride with each row, so encode is map-only
  * and re-encode after maintenance needs no training pass.
  */
object Sq {

  /** Encode an `ARRAY<FLOAT>` column: struct(codes BINARY, vmin FLOAT,
    * vmax FLOAT). Map-only at any scale. */
  def encode(emb: Column): Column = {
    val mn = array_min(emb)
    val mx = array_max(emb)
    struct(
      VectorExpressions.sqEncodeBytes(emb, mn, mx).as("codes"),
      mn.as("vmin"), mx.as("vmax"))
  }

  /** Decode codes back to `ARRAY<FLOAT>` (test/debug surface; search never
    * materializes decoded vectors — the distance kernel fuses dequantize).
    * BINARY has no element accessor in Spark SQL, so the bytes go through
    * hex: code_i = unsigned byte i of the payload. */
  def decode(codes: Column, vmin: Column, vmax: Column): Column = {
    val hexStr = hex(codes)
    // sequence(0, -1) would yield [0, -1] (step inference), not [] — guard
    // the empty payload so decode stays empty-in/empty-out like encode
    val ints = when(octet_length(codes) === 0,
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)))
      .otherwise(transform(
        sequence(lit(0), octet_length(codes) - 1),
        i => conv(substring(hexStr, i * 2 + 1, lit(2)), 16, 10).cast("int")))
    graft.functions.VectorFunctions.dequantizeU8(ints, vmin, vmax)
  }

  /** Batch IVF-SQ search: n_probe coarse pruning exactly like
    * [[Ivf.searchBatch]] (static cluster_id pruning + broadcast probes), but
    * candidate scoring reads the u8 code table — dim bytes per row through
    * the fused [[graft.functions.kernels.SqDequantL2]] /
    * [[graft.functions.kernels.SqDequantCosine]] codegen kernel — and
    * the per-query `shortlist` is exact-reranked against raw vectors when
    * `rerank` is given. Same 100 TB shape as IVF-PQ: the scan touches only
    * probed partitions of a 4×-smaller table; raw embeddings are read only
    * for shortlist×queries rows.
    *
    * `metric`: "l2" or "cosine" — used for probe selection, code-table
    * scoring, and the exact rerank alike, so the approximate ranking and
    * the final distances agree on what "near" means.
    *
    * @param encoded (idCol, cluster_id LONG, codes BINARY, vmin, vmax)
    * @param rerank  optional (idCol, embedding ARRAY<FLOAT>) raw vectors
    */
  def searchBatchIvfSq(encoded: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int, shortlist: Int = 100,
      rerank: Option[DataFrame] = None, idCol: String = "id",
      queryIdCol: String = "query_id", queryEmbCol: String = "q_embedding",
      metric: String = "l2"): DataFrame = {
    require(metric == "l2" || metric == "cosine",
      s"SQ code tier supports l2|cosine, got '$metric'")
    val spark = queries.sparkSession
    // tiny probe relation: driver-computed (no crossJoin/shuffle job),
    // wrapped as a local relation (no persist leak)
    val (pRows, pSchema) = Ivf.probeRows(centroids, queries, nProbe, metric,
      queryIdCol, queryEmbCol)
    val p = spark.createDataFrame(java.util.Arrays.asList(pRows: _*), pSchema)
    val probedIds = pRows.map(_.getAs[Long]("cluster_id")).distinct
    val pruned = encoded.filter(col("cluster_id").isin(probedIds: _*))
    val approx =
      if (metric == "cosine")
        VectorExpressions.sqDequantCosine(col(queryEmbCol), col("codes"),
          col("vmin"), col("vmax"))
      else
        VectorExpressions.sqDequantL2(col(queryEmbCol), col("codes"),
          col("vmin"), col("vmax"))
    val scored = pruned
      .join(broadcast(p), pruned("cluster_id") === p("cluster_id"))
      .select(col(queryIdCol), col(idCol).as("id"), approx.as("distance"))
    val idIsString =
      encoded.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    // queries is a bounded batch (probes already collected it); the shared
    // tail broadcasts it into the rerank join
    Ivf.shortlistRerankTopK(scored,
      queries.select(col(queryIdCol), col(queryEmbCol)),
      k, shortlist, idIsString, rerank, idCol, queryIdCol, queryEmbCol, metric)
  }
}
