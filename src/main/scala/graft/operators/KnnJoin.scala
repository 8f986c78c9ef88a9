package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-NN self-join — k-nearest-neighbor GRAPH construction over an embedding
  * table: for every vector, its k most-similar OTHER vectors by cosine.
  *
  * This is the primitive under semantic dedup (SemDeDup-style: cluster,
  * then drop near-neighbors), embedding-space diversity analysis, and
  * graph-based index builds (an HNSW/NSW base layer IS a k-NN graph). The
  * reference exposes pairwise search only query-at-a-time
  * (`/root/reference/src/core/vector_ops.rs:269-346`); the corpus×corpus
  * form is what a curation pipeline runs, so it gets first-class operators:
  *
  *  - [[exact]]  — all-pairs baseline. Quadratic by definition; guarded by
  *    `maxRows` so it can't silently run N² on a 100 TB corpus. This is the
  *    ground-truth/recall-eval shape, not the production path.
  *  - [[blocked]] — the scale path: candidate pairs only WITHIN a block
  *    (label today; an IVF `cluster_id` from [[Ivf.assign]] at scale, where
  *    multi-probe assignment trades recall for fan-out). One shuffle on the
  *    block key, per-block pair expansion bounded by the largest block, then
  *    the same two-phase top-k aggregate — the corpus never forms N² pairs.
  *
  * Both emit (id, neighbor_id, rank, cosine) with rank 1..k ordered by
  * (cosine desc, neighbor_id asc) on values rounded to `roundDecimals` —
  * the deterministic tie-break contract the DuckDB oracle replays.
  */
object KnnJoin {

  private def topkFromPairs(pairs: DataFrame, k: Int,
      roundDecimals: Int): DataFrame = {
    // distance = 1 - cosine so the (dist, id)-ascending TopK aggregate
    // yields cosine-descending neighbors; round FIRST so ranking ties are
    // broken identically in Spark and the double-math oracle. String ids
    // (the store's id type) ride the aggregate natively — no surrogate
    // remap joins, same contract as Knn.batch.
    val topk =
      if (pairs.schema("nid").dataType == org.apache.spark.sql.types.StringType)
        TopK.topKStr(k)
      else TopK.topK(k)
    val d = round(lit(1.0) - col("cos"), roundDecimals)
    pairs
      .select(col("id"), col("nid"), d.as("distance"))
      .groupBy("id")
      .agg(topk(col("nid"), col("distance")).as("hits"))
      .select(col("id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("id"), col("hit.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(lit(1.0) - col("hit.dist"), roundDecimals).as("cosine"))
  }

  /** All-pairs exact k-NN graph. One side is broadcast, so this is
    * strictly a BOUNDED-corpus operator (ground truth for recall eval,
    * small curated sets): the `maxRows` require is the loud guard against
    * pointing it at an unbounded table — at scale use [[blocked]].
    */
  def exact(vectors: DataFrame, k: Int, idCol: String = "id",
      embCol: String = "embedding", maxRows: Long = 1000000L,
      roundDecimals: Int = 6, maxBroadcastBytes: Long = 512L << 20): DataFrame = {
    // one job for both guard inputs; max(size(..)) is null-safe where a
    // first-row probe would NPE on a null embedding before either require
    // could fire, and it upper-bounds ragged inputs instead of sampling one
    val guardRow = vectors
      .agg(count(lit(1)), max(size(col(embCol)))).head()
    val n = guardRow.getLong(0)
    require(n <= maxRows,
      s"KnnJoin.exact is all-pairs (O(N^2)) and broadcasts one side: $n rows " +
        s"> maxRows=$maxRows. Use KnnJoin.blocked with an IVF cluster_id block.")
    // the broadcast payload scales with rows x DIM, not rows alone: 1M
    // 384-dim floats is ~1.5 GB on the broadcast path, well past what a
    // row-count gate alone admits — size the guard on bytes, the same
    // lesson as the streaming gate (Streaming.scala byte-sized broadcast)
    val dim = if (guardRow.isNullAt(1)) 0 else guardRow.getInt(1)
    val approxBytes = n * (dim.toLong * 4L + 48L) // floats + row/id overhead
    require(approxBytes <= maxBroadcastBytes,
      s"KnnJoin.exact broadcasts ~$approxBytes bytes ($n rows x $dim dims) " +
        s"> maxBroadcastBytes=$maxBroadcastBytes. Use KnnJoin.blocked.")
    // spread the streamed side: a bounded ground-truth corpus typically
    // fits ONE input split, which would put all N² pair work on one core
    // AND overflow the per-partition group budget of the object-hash
    // aggregate (sort-based fallback over N² intermediate rows — measured
    // 10x). The explicit partition count matters: a keyed repartition
    // without one is an AQE coalescing target (the pre-join side is tiny
    // by BYTES), which would silently undo both fixes.
    val parts = vectors.sparkSession.sparkContext.defaultParallelism
    val proj = vectors.select(col(idCol).as("id"), col(embCol).as("emb"))
    val slim = proj.repartition(parts, col("id"))
    // broadcast side built from the PRE-repartition projection: the
    // collected relation is identical, and hanging it off `slim` would
    // run the full corpus shuffle a second time just to feed the collect
    val right = broadcast(proj.select(col("id").as("nid"), col("emb").as("nemb")))
    val pairs = slim.join(right, col("id") =!= col("nid"))
      .select(col("id"), col("nid"),
        graft.functions.VectorExpressions.vecCosine(col("emb"), col("nemb")).as("cos"))
    topkFromPairs(pairs, k, roundDecimals)
  }

  /** Multi-probe blocked k-NN graph: each vector enters the blocks of its
    * `p` nearest centroids (the IVF codebook, passed as collected arrays —
    * bounded driver state, same contract as [[Ivf.assign]]), so a true
    * neighbor that a single-probe blocking strands across a cluster
    * boundary is reachable as long as the two vectors SHARE any probe.
    * This is the recall/cost dial: pair work multiplies by <= p² in the
    * worst case (typically ~p — most pairs share only their home block),
    * not by block size.
    *
    * Plan shape: centroid distances are a codegen literal-matrix pass
    * (array of struct(dist, cid), array_sort, slice — all scan-side), the
    * probe explode multiplies rows by p, the self-join shuffles once on
    * the probe key, and pairs colliding via several shared probes dedup in
    * the same exchange that feeds the per-vertex top-k.
    */
  def blockedMultiProbe(vectors: DataFrame, k: Int,
      centroids: Array[Array[Float]], p: Int, idCol: String = "id",
      embCol: String = "embedding", roundDecimals: Int = 6): DataFrame = {
    require(p >= 1 && p <= centroids.length,
      s"p must be in [1, ${centroids.length}], got $p")
    val probeStructs = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.VectorExpressions.vecL2(col("emb"), typedLit(c)).as("d"),
        lit(i).as("cid")) }: _*)
    val slim = vectors.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("probes",
        transform(slice(array_sort(probeStructs), 1, p), s => s.getField("cid")))
    val exploded = slim.select(col("id"), col("emb"), explode(col("probes")).as("blk"))
    val right = exploded.select(col("blk"), col("id").as("nid"), col("emb").as("nemb"))
    val pairs = exploded.join(right, Seq("blk"))
      .filter(col("id") =!= col("nid"))
      .select(col("id"), col("nid"),
        graft.functions.VectorExpressions.vecCosine(col("emb"), col("nemb")).as("cos"))
      .groupBy("id", "nid").agg(first("cos").as("cos"))
    topkFromPairs(pairs, k, roundDecimals)
  }

  /** Per-vertex recall of an approximate k-NN graph against the exact one:
    * (id, recall) where recall = fraction of the exact neighbor edges the
    * approximate graph recovered. The eval loop that sizes blocking /
    * multi-probe: run on a bounded sample (exact is all-pairs), read the
    * recall distribution, then dial the block source. One aggregate on the
    * id key; the edge join rides (id, neighbor_id). */
  def graphRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = exact.select(col("id"), col("neighbor_id"))
      .join(approx.select(col("id"), col("neighbor_id"), lit(1L).as("hit")),
        Seq("id", "neighbor_id"), "left")
    hits.groupBy("id")
      .agg((sum(coalesce(col("hit"), lit(0L))) / count(lit(1))).as("recall"))
  }

  /** Cluster-blocked approximate k-NN graph: neighbors are searched only
    * within the same `blockCol` value. At 100 TB the block is an IVF
    * cluster assignment (bounded cluster sizes via
    * [[Ivf.rebalance]]), so the join shuffles both sides once on the block
    * key and the pair expansion is Σ(block²), not N². Recall is bounded by
    * the blocking (a true neighbor in another block is unreachable) —
    * multi-probe assignment (each vector entering its p nearest clusters)
    * is the standard recall/cost dial.
    */
  def blocked(vectors: DataFrame, k: Int, blockCol: String,
      idCol: String = "id", embCol: String = "embedding",
      roundDecimals: Int = 6): DataFrame = {
    val slim = vectors.select(col(blockCol).as("blk"),
      col(idCol).as("id"), col(embCol).as("emb"))
    val right = slim.select(col("blk"), col("id").as("nid"), col("emb").as("nemb"))
    val pairs = slim.join(right, Seq("blk"))
      .filter(col("id") =!= col("nid"))
      .select(col("id"), col("nid"),
        graft.functions.VectorExpressions.vecCosine(col("emb"), col("nemb")).as("cos"))
    topkFromPairs(pairs, k, roundDecimals)
  }
}
