package graft.queries

import graft.core.Tables
import graft.functions.FilterJson
import graft.functions.VectorExpressions._
import graft.operators.{Ivf, TopK}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic (oracle-checkable) IVF pipeline over the embeddings table:
  * centroids here are per-label element-wise means (A3,
  * `/root/reference/src/ivf/core.rs:388-417`) instead of KMeans output, so
  * DuckDB can recompute them exactly; the KMeans path is covered by IvfSpec
  * recall tests. Demonstrates J3 centroid assignment, X7 n_probe search and
  * A4 cluster stats (SURVEY.md §2.9, §2.4).
  */
object IvfQueries {
  type Q = (SparkSession, String) => DataFrame

  private val DIM = 64

  private def labelCentroids(emb: DataFrame): DataFrame =
    QueryShapes.labelCentroids(emb)

  val queries: Map[String, Q] = Map(
    // A3: element-wise centroid means, one row per (label, dim)
    "ivf_centroids" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg(round(avg("v"), 6).as("centroid_val"))
        .select(col("label").cast("long").as("label"), col("pos").cast("long").as("pos"), col("centroid_val"))
        .orderBy("label", "pos")
    }),
    // J3/X6: nearest-centroid assignment, map-only against a centroid
    // matrix fused into one codegen loop (no interpreted per-centroid HOF);
    // roundTo=6 + lowest-index ties reproduce the oracle's
    // row_number() OVER (ORDER BY round(dist, 6), label) exactly
    "ivf_assign" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = QueryShapes.cachedLabelCentroids(s"$dir#full", labelCentroids(emb))
      val labLit = typedLit(cents.map(_._1.toLong))
      val idx = nearestCentroid(col("embedding"), cents.map(_._2), "l2", roundTo = 6)
      emb.select(col("vec_id"),
        element_at(labLit, idx + 1).as("assigned_cluster"))
        .orderBy("vec_id")
    }),
    // X7: n_probe=3 pruned search for query vec 0 over label-clusters
    "ivf_search" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = QueryShapes.labelCentroidsDF(s, s"$dir#full", labelCentroids(emb))
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val probed = cents.crossJoin(broadcast(q))
        .select(col("label"), round(vecL2(col("centroid"), col("q_emb")), 6).as("cdist"))
        .orderBy(col("cdist").asc, col("label").asc).limit(3)
        .select("label")
      emb.join(broadcast(probed), "label")
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(vecL2(col("embedding"), col("q_emb")), 6).as("distance"))
        .orderBy(col("distance").asc, col("vec_id").asc).limit(10)
    }),
    // X13: filtered n_probe search through the full Ivf.searchBatch path —
    // a Mongo-style metadata filter composed INSIDE the probed lists
    // (pushed pre-filter, exact-k), 8 queries, k=10, n_probe=3
    "ann_ivf_filtered" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = QueryShapes.labelCentroidsDF(s, s"$dir#full", labelCentroids(emb))
        .select(col("label").cast("long").as("cluster_id"), col("centroid"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding"),
        col("label").cast("long").as("cluster_id"),
        to_json(struct((col("vec_id") % 2).as("parity"))).as("metadata"))
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      Ivf.searchBatch(corpus, cents, qs, k = 10, nProbe = 3, metric = "l2",
        roundDecimals = 6,
        filter = Some(FilterJson.predicate("""{"parity": 0}""", col("metadata"))))
        .orderBy("query_id", "rank")
    }),
    // X10: centroid export/import round-trip through the REAL persistence
    // path — export writes the centroid table to disk, import re-reads it
    // under the dimension gate, and the values that come back must equal a
    // from-scratch recomputation (the ivf_centroids oracle). A lossy codec,
    // a dropped row, or a transposed (label, pos) on either leg would
    // mismatch. The round-trip result is bounded (labels x DIM rows), so it
    // collects once and the temp dir is deleted before returning.
    "ivf_export_import" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_cent_q_").toString
      Ivf.exportCentroids(labelCentroids(emb), s"$tmp/centroids")
      val imported = Ivf.importCentroids(s, s"$tmp/centroids", expectedDim = DIM)
      val rows = imported
        .select(col("label").cast("long").as("label"),
          posexplode(col("centroid")).as(Seq("pos", "v")))
        .select(col("label"), col("pos").cast("long").as("pos"),
          round(col("v").cast("double"), 6).as("centroid_val"))
        .orderBy("label", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      import s.implicits._
      rows.toDF("label", "pos", "centroid_val")
    }),
    // X9 cluster balance: assign to the label centroids (rounded argmin,
    // the ivf_assign contract), then cap every cluster at maxSize=40 —
    // each cluster keeps its 40 centroid-closest rows ((dist, id) rank)
    // and overflow moves to its SECOND-nearest centroid. The oracle
    // replays the whole decision: per-vector centroid ranking (rn=1 own,
    // rn=2 second), per-cluster keep-rank, and the overflow rebinding —
    // a wrong tie-break, an off-by-one cap, or overflow sent to the
    // nearest-including-own centroid all mismatch.
    "ivf_balance" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centArr = QueryShapes.cachedLabelCentroids(s"$dir#full", labelCentroids(emb))
      val centsDf = QueryShapes.labelCentroidsDF(s, s"$dir#full", labelCentroids(emb))
        .select(col("label").cast("int").as("cluster_id"), col("centroid"))
      // labels are contiguous 0-based, so the argmin INDEX is the label
      val assigned = emb.select(col("vec_id").as("id"), col("embedding"),
        nearestCentroid(col("embedding"), centArr.map(_._2), "l2", roundTo = 6)
          .as("cluster_id"))
      Ivf.balance(assigned, centsDf, maxSize = 40, roundTo = 6)
        .select(col("id").as("vec_id"), col("cluster_id").cast("long").as("cluster_id"))
        .orderBy("vec_id")
    }),
    // A4: cluster size stats over the label clustering
    "cluster_stats" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      emb.groupBy(col("label").cast("long").as("cluster_id"))
        .agg(count(lit(1)).as("size"),
          round(avg(vecNorm(col("embedding"))), 6).as("avg_norm"))
        .orderBy("cluster_id")
    }),
    // A4 summary stats, reference-EXACT (ivf/operations.rs:264-289): the
    // configured cluster range participates including EMPTY slots — sizes
    // default to 0 over 0..n_clusters-1, so avg = total/n_clusters, the
    // variance includes the zeros, and empty_clusters counts them. The 10
    // label clusters are evaluated against a configured n_clusters of 12,
    // so two empty slots actually exercise the semantics.
    "cluster_stats_summary" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val assigned = emb.select(col("label").cast("long").as("cluster_id"))
      graft.operators.Ivf.clusterStats(assigned, nClusters = 12)
    }))

  private val centSql =
    s"""cent AS (
       |  SELECT label, i, avg(embedding[i]::DOUBLE) AS m
       |  FROM embeddings, range(1, ${DIM + 1}) t(i) GROUP BY 1, 2),
       |centl AS (
       |  SELECT label, list(m::REAL::DOUBLE ORDER BY i) AS centroid
       |  FROM cent GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ivf_centroids" ->
      s"""SELECT label::BIGINT AS label, (i - 1)::BIGINT AS pos,
         |  round(avg(embedding[i]::DOUBLE), 6) AS centroid_val
         |FROM embeddings, range(1, ${DIM + 1}) t(i)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // full replay of the balance decision: rounded per-vector centroid
    // ranking (rn=1 = assignment, rn=2 = second-nearest), per-cluster
    // (own_dist, vec_id) keep-rank, cap at 40, overflow -> second-nearest
    "ivf_balance" ->
      s"""WITH $centSql,
         |d AS (
         |  SELECT e.vec_id, c.label,
         |    round(list_distance(e.embedding::DOUBLE[], c.centroid), 6) AS dist
         |  FROM embeddings e CROSS JOIN centl c),
         |r AS (
         |  SELECT vec_id, label, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, label) AS rn
         |  FROM d),
         |own AS (SELECT vec_id, label AS own_label, dist AS own_dist FROM r WHERE rn = 1),
         |sec AS (SELECT vec_id, label AS sec_label FROM r WHERE rn = 2),
         |rk AS (
         |  SELECT o.vec_id, o.own_label, s.sec_label,
         |    row_number() OVER (PARTITION BY o.own_label
         |      ORDER BY o.own_dist, o.vec_id) AS keep_rank
         |  FROM own o JOIN sec s ON o.vec_id = s.vec_id)
         |SELECT vec_id,
         |  (CASE WHEN keep_rank <= 40 THEN own_label ELSE sec_label END)::BIGINT
         |    AS cluster_id
         |FROM rk ORDER BY vec_id""".stripMargin,
    // same recomputation as ivf_centroids, through the exported table's
    // float32 representation (labelCentroids stores REAL centroids)
    "ivf_export_import" ->
      s"""SELECT label::BIGINT AS label, (i - 1)::BIGINT AS pos,
         |  round(avg(embedding[i]::DOUBLE)::REAL::DOUBLE, 6) AS centroid_val
         |FROM embeddings, range(1, ${DIM + 1}) t(i)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ivf_assign" ->
      s"""WITH $centSql,
         |d AS (
         |  SELECT e.vec_id, c.label,
         |    round(list_distance(e.embedding::DOUBLE[], c.centroid), 6) AS dist
         |  FROM embeddings e CROSS JOIN centl c),
         |r AS (
         |  SELECT vec_id, label,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, label) AS rn
         |  FROM d)
         |SELECT vec_id, label::BIGINT AS assigned_cluster FROM r WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,
    "ivf_search" ->
      s"""WITH $centSql,
         |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |probed AS (
         |  SELECT c.label FROM centl c, q
         |  ORDER BY round(list_distance(c.centroid, q.qe), 6) ASC, c.label ASC
         |  LIMIT 3)
         |SELECT e.vec_id,
         |  round(list_distance(e.embedding::DOUBLE[], q.qe), 6) AS distance
         |FROM embeddings e JOIN probed p ON e.label = p.label, q
         |ORDER BY distance ASC, e.vec_id ASC LIMIT 10""".stripMargin,
    "ann_ivf_filtered" ->
      s"""WITH $centSql,
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
         |      FROM embeddings WHERE vec_id < 8),
         |pr AS (
         |  SELECT q.query_id, c.label,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY round(list_distance(c.centroid, q.qe), 6), c.label) AS rn
         |  FROM centl c CROSS JOIN q),
         |d AS (
         |  SELECT p.query_id, e.vec_id,
         |    round(list_distance(e.embedding::DOUBLE[], q.qe), 6) AS distance
         |  FROM pr p JOIN embeddings e ON e.label = p.label
         |    JOIN q ON q.query_id = p.query_id
         |  WHERE p.rn <= 3 AND e.vec_id % 2 = 0),
         |r AS (
         |  SELECT query_id, vec_id, distance,
         |    row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rank
         |  FROM d)
         |SELECT query_id, vec_id AS id, distance, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "cluster_stats" ->
      """SELECT label::BIGINT AS cluster_id, count(*) AS size,
        |  round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
    "cluster_stats_summary" ->
      """WITH sz AS (
        |  SELECT s.range AS cluster_id, coalesce(c.size, 0) AS size
        |  FROM range(0, 12) s
        |  LEFT JOIN (SELECT label::BIGINT AS cid, count(*) AS size
        |             FROM embeddings GROUP BY 1) c ON c.cid = s.range)
        |SELECT count(*)::BIGINT AS n_clusters, sum(size)::BIGINT AS total_vectors,
        |  round(avg(size), 4) AS avg_size,
        |  round(var_pop(size), 4) AS size_variance,
        |  max(size)::BIGINT AS max_size, min(size)::BIGINT AS min_size,
        |  (count(*) FILTER (size = 0))::BIGINT AS empty_clusters
        |FROM sz""".stripMargin)
}
