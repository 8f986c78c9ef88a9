package graft.operators

import graft.operators.Knn.distance
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index — the historical-tier ANN of the reference
  * (SURVEY.md §2.9 X6-X10, `/root/reference/src/ivf/core.rs`), re-expressed
  * Spark-first:
  *
  *  - training (A1, `ivf/core.rs:240-334`): MLlib KMeans (k-means||) instead
  *    of a hand-rolled Lloyd loop — partial aggregation and distributed init
  *    come free
  *  - insert/assignment (X6/J3, `ivf/core.rs:373-386,431-455`): broadcast
  *    cross-join against the tiny centroid table + min_by, map-side reduced
  *  - the inverted list (`cluster_id -> vectors`) IS a partitioned Parquet
  *    table: `write.partitionBy("cluster_id")`; probing n_probe lists is a
  *    partition-pruned scan (X7, `ivf/core.rs:626-681`) — Spark skips the
  *    files of unprobed clusters exactly like the reference skips unloaded
  *    chunks
  *  - retrain (X8, `ivf/operations.rs:148-193`) = re-run train + assign +
  *    rewrite, a pure batch job
  */
object Ivf {

  /** Reference defaults: `src/ivf/core.rs:50-60`. */
  case class IvfConfig(
      nClusters: Int = 256,
      nProbe: Int = 16,
      trainSize: Int = 10000,
      maxIterations: Int = 25,
      tol: Double = 1e-4,
      seed: Long = 42L,
      initMode: String = "k-means||") // "random" for a cheaper coarse quantizer

  /** Train centroids on (a sample of) the corpus: MLlib KMeans by default;
    * `initMode = "driver"` runs the parallel in-driver Lloyd loop instead —
    * appropriate exactly when trainSize is bounded (the sample already fits
    * on the driver; 8+ MLlib jobs of overhead dominate the math).
    * Returns (cluster_id INT, centroid ARRAY<FLOAT>). */
  def train(corpus: DataFrame, config: IvfConfig = IvfConfig(),
      embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // uniform trainSize-row sample in ONE pass over a pushed-down
    // single-column projection (TakeOrderedAndProject by rand: each
    // partition keeps its top trainSize, driver merges) — never a count()
    // of the corpus first, so training cost is O(sample), not O(N)+O(sample)
    val sampled = corpus.select(col(embCol))
      .orderBy(rand(config.seed)).limit(config.trainSize)
    if (config.initMode == "driver") {
      val data = sampled.collect().map(_.getSeq[Float](0).toArray)
      Lloyd.kmeans(data, config.nClusters, config.maxIterations, config.seed)
        .zipWithIndex.map { case (c, i) => (i, c) }
        .toSeq.toDF("cluster_id", "centroid")
    } else {
      // re-spread the single-partition limit result before the iterative fit
      val feats = sampled.repartition(spark.sparkContext.defaultParallelism)
        .select(array_to_vector(col(embCol)).as("features"))
      val model = new KMeans()
        .setK(config.nClusters)
        .setMaxIter(config.maxIterations)
        .setTol(config.tol)
        .setSeed(config.seed)
        .setInitMode(config.initMode)
        .fit(feats)
      model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
        .toSeq.toDF("cluster_id", "centroid")
    }
  }

  /** Assign every row its nearest centroid (cluster_id) — J3/X6. The
    * centroid table is tiny (<=256 x dim floats), so it is collected once
    * and inlined as a literal: assignment becomes a map-only projection
    * (no join, no shuffle), the plan that survives a 100 TB corpus. Ties
    * resolve to the lowest cluster_id (first position). */
  def assign(corpus: DataFrame, centroids: DataFrame, embCol: String = "embedding",
      metric: String = "l2"): DataFrame = {
    val collected = centroids.select("cluster_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val cidLit = typedLit(collected.map(_._1))
    // one fused codegen loop over the centroid matrix (NearestCentroid) —
    // a transform() HOF here would run interpreted per (row x centroid)
    val idx = graft.functions.VectorExpressions.nearestCentroid(
      col(embCol), collected.map(_._2), metric)
    corpus.withColumn("cluster_id", element_at(cidLit, idx + 1))
  }

  /** Persist as an inverted file: one parquet partition per cluster.
    * The repartition co-locates each cluster into one task so every list
    * is ONE file, not (shuffle partitions) fragments — probed scans then
    * open n_probe files instead of n_probe x parallelism (a 32x task-setup
    * and footer-read tax at any scale). Very large clusters still split
    * via the writer's maxRecordsPerFile chunking. */
  def writePartitioned(assigned: DataFrame, path: String): Unit =
    assigned.repartition(col("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)

  /** One probe distance, replicating the codegen kernels' exact double
    * arithmetic (accumulate in f64, ascending index — see
    * [[graft.functions.kernels]]) so driver-selected probe sets are
    * bit-identical to plan-selected ones. */
  private def driverDistance(metric: String, q: Array[Float], c: Array[Float]): Double = {
    require(q.length == c.length,
      s"vector dimension mismatch: ${q.length} vs ${c.length}")
    metric match {
      case "l2" =>
        var s = 0.0; var i = 0
        while (i < q.length) { val d = q(i).toDouble - c(i).toDouble; s += d * d; i += 1 }
        math.sqrt(s)
      case "dot" =>
        var s = 0.0; var i = 0
        while (i < q.length) { s += q(i).toDouble * c(i).toDouble; i += 1 }
        -s
      case "cosine" | "angular" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < q.length) {
          val x = q(i).toDouble; val y = c(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        val cos = if (den == 0.0) 0.0 else dot / den
        if (metric == "cosine") 1.0 - cos
        else math.acos(math.max(-1.0, math.min(1.0, cos)))
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }
  }

  /** Spark `round(d, n)` replicated exactly (HALF_UP over the decimal
    * string form) for [[probeRows]]' oracle-parity mode. */
  private def roundHalfUp(d: Double, scale: Int): Double =
    new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The probe set of [[probes]], computed ON THE DRIVER: two tiny collects
    * (the bounded query batch — which every consumer collects anyway — and
    * the <=nClusters-row centroid table) plus an nq x nClusters loop,
    * instead of a crossJoin + shuffle + top-k Spark job. Same contract:
    * distances use the kernels' arithmetic, rank by (dist, cluster_id),
    * duplicate (id, embedding) query rows collapse like the groupBy did.
    * Returns rows shaped (queryIdCol, queryEmbCol, cluster_id LONG) plus
    * that schema, ready for a local relation. */
  private[graft] def probeRows(centroids: DataFrame, queries: DataFrame,
      nProbe: Int, metric: String = "l2", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", roundDecimals: Int = -1)
      : (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) = {
    val qDf = queries.select(col(queryIdCol), col(queryEmbCol))
    val qRows = qDf.collect().distinct
    val cRows = centroids.select(col("cluster_id").cast("long"), col("centroid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      qDf.schema.fields(0), qDf.schema.fields(1),
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = qRows.flatMap { qr =>
      val qv = qr.getSeq[Float](1).toArray
      cRows.map { case (cid, c) =>
          val d = driverDistance(metric, qv, c)
          (cid, if (roundDecimals >= 0) roundHalfUp(d, roundDecimals) else d)
        }
        .sortBy { case (cid, d) => (d, cid) }.take(nProbe)
        .map { case (cid, _) =>
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](qr.get(0), qr.get(1), cid), schema)
            : org.apache.spark.sql.Row
        }
    }
    (rows, schema)
  }

  /** (query_id, cluster_id, q_embedding) probe set: the n_probe nearest
    * centroids per query (X7 shortlist, `ivf/core.rs:645-656`). */
  def probes(centroids: DataFrame, queries: DataFrame, nProbe: Int,
      metric: String = "l2", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", roundDecimals: Int = -1): DataFrame = {
    // roundDecimals must match the caller's result rounding: an oracle that
    // ranks round(cdist, 6) with id tie-break can pick a different probe
    // set than raw-double ranking when two centroids round equal
    val dRaw = distance(metric, col(queryEmbCol), col("centroid"))
    val d = if (roundDecimals >= 0) round(dRaw, roundDecimals) else dRaw
    val topk = TopK.topK(nProbe)
    queries.crossJoin(broadcast(centroids))
      .select(col(queryIdCol), col(queryEmbCol), col("cluster_id").cast("long").as("cid"), d.as("cdist"))
      .groupBy(queryIdCol, queryEmbCol)
      .agg(topk(col("cid"), col("cdist")).as("probed"))
      .select(col(queryIdCol), col(queryEmbCol),
        explode(col("probed.id")).as("cluster_id"))
  }

  /** Batch n_probe search: join the corpus to the probe set on cluster_id
    * (partition-pruned when the corpus is cluster-partitioned), exact
    * distance within probed lists, grouped top-k.
    *
    * `filter` (X13): optional row predicate (e.g. a
    * [[graft.functions.FilterJson]] metadata predicate) applied INSIDE the
    * probed lists, before scoring — a pushed pre-filter with exact-k
    * semantics, strictly better than the reference's k*3 post-filter
    * oversampling (`hybrid/core.rs:513-549`), and it composes with the
    * partition pruning: the scan reads only probed clusters AND only rows
    * passing the predicate. */
  def searchBatch(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int, metric: String = "l2", idCol: String = "id",
      embCol: String = "embedding", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", roundDecimals: Int = -1,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // The probe relation is tiny (<= nProbe x |queries| rows) and read
    // twice (static pruning set + broadcast join), so it is computed on the
    // driver (probeRows — no crossJoin/shuffle job) and wrapped as a local
    // relation — a persist() here would outlive the returned plan and leak
    // cached blocks across calls.
    val (pRows, pSchema) = probeRows(centroids, queries, nProbe, metric,
      queryIdCol, queryEmbCol, roundDecimals)
    val p = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(pRows: _*), pSchema)
    // the probed cluster set as a STATIC isin filter: unconditional parquet
    // partition pruning on cluster_id, not dependent on dynamic-partition-
    // pruning kicking in — the exact analog of "only load the probed
    // inverted lists"
    val probedIds = pRows.map(_.getAs[Long]("cluster_id")).distinct
    val dRaw = distance(metric, col(embCol), col(queryEmbCol))
    val d = if (roundDecimals >= 0) round(dRaw, roundDecimals) else dRaw
    val pruned = corpus.filter(col("cluster_id").isin(probedIds: _*))
    val candidates = filter.fold(pruned)(pruned.filter)
    val scored = candidates
      .join(broadcast(p), candidates("cluster_id") === p("cluster_id"))
      .select(col(queryIdCol), col(idCol).as("id"), d.as("distance"))
    val topk =
      if (corpus.schema(idCol).dataType == org.apache.spark.sql.types.StringType)
        TopK.topKStr(k)
      else TopK.topK(k)
    scored.groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Shared tail of the code-tier searches (IVF-PQ / IVF-SQ): per-query
    * `shortlist` by approximate distance, optional exact rerank of the
    * shortlist against raw vectors (in `metric` — the same one that ranked
    * the shortlist), final top-k with rank. Keeping it in one place keeps
    * the two quantized paths' rerank/tie-break semantics from diverging.
    *
    * @param scored (queryIdCol, id, distance) approximate candidates
    * @param qRel   bounded (queryIdCol, queryEmbCol) relation, broadcast
    *               into the rerank join
    */
  private[operators] def shortlistRerankTopK(scored: DataFrame, qRel: DataFrame,
      k: Int, shortlist: Int, idIsString: Boolean, rerank: Option[DataFrame],
      idCol: String, queryIdCol: String, queryEmbCol: String,
      metric: String = "l2"): DataFrame = {
    val topShort = if (idIsString) TopK.topKStr(shortlist) else TopK.topK(shortlist)
    val short = scored.groupBy(queryIdCol)
      .agg(topShort(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), explode(col("hits")).as("hit"))
      .select(col(queryIdCol), col("hit.id").as("id"), col("hit.dist").as("distance"))
    val ranked = rerank match {
      case None => short
      case Some(raw) =>
        // broadcast the bounded shortlist into the raw scan (see
        // Bq.searchBatch): reranking must not re-shuffle the corpus
        raw.select(col(idCol).as("id"), col("embedding"))
          .join(broadcast(short.select(col(queryIdCol), col("id"))), Seq("id"))
          .join(broadcast(qRel), Seq(queryIdCol))
          .select(col(queryIdCol), col("id"),
            distance(metric, col("embedding"), col(queryEmbCol)).as("distance"))
    }
    val topk = if (idIsString) TopK.topKStr(k) else TopK.topK(k)
    ranked.groupBy(queryIdCol)
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), col("hit.id").as("id"),
        col("hit.dist").as("distance"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** A5 (`ivf/operations.rs:329-391`): recall AND precision of approximate
    * search against exact ground truth, averaged over queries — the
    * reference's exact formulas (`:356-377`): recall = matches/|truth|
    * (truth is the exact top-k, so the denominator is min(k, corpus) as
    * the reference writes it), precision = matches/|returned| with an
    * empty result scoring 0.0. Returns a 1-row DataFrame
    * (avg_recall DOUBLE, n_queries LONG, avg_precision DOUBLE —
    * precision appended last so positional readers of the original pair
    * are unaffected).
    *
    * Residual divergence from the reference (documented, accepted): the
    * metric is driven from the UNION of approx and exact query ids, so a
    * query whose approx AND exact result sets are BOTH empty is dropped
    * from n_queries, where the reference's per-query loop would score it
    * recall 1.0 / precision 0.0. Unreachable in practice — search returns
    * ≥ 1 row for k ≥ 1 on a non-empty corpus — and a caller who needs
    * exact parity for such degenerate batches can pass an explicit
    * query-id frame as `approx` rows instead. */
  def evaluateRecall(approx: DataFrame, exact: DataFrame,
      queryIdCol: String = "query_id"): DataFrame = {
    val hits = approx.select(col(queryIdCol), col("id"))
      .join(exact.select(col(queryIdCol), col("id")), Seq(queryIdCol, "id"))
      .groupBy(queryIdCol).agg(count(lit(1)).as("n_hit"))
    val returned = approx.select(col(queryIdCol))
      .groupBy(queryIdCol).agg(count(lit(1)).as("n_ret"))
    val totals = exact.groupBy(queryIdCol).agg(count(lit(1)).as("n_exact"))
    // drive from the UNION of query ids, not `exact` alone: the reference
    // (`:357-361`) iterates every query and scores recall 1.0 when its
    // ground truth is empty — a totals-driven left join would instead
    // silently drop queries absent from `exact` (and queries present only
    // in `approx`) from n_queries and both averages
    val qids = approx.select(col(queryIdCol))
      .union(exact.select(col(queryIdCol))).distinct()
    qids.join(totals, Seq(queryIdCol), "left")
      .join(hits, Seq(queryIdCol), "left")
      .join(returned, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        // reference `:357-361`: empty ground truth => recall 1.0
        when(coalesce(col("n_exact"), lit(0L)) === 0L, lit(1.0))
          .otherwise(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact"))
          .as("recall"),
        // reference `:373-377`: empty result set => precision 0.0
        when(coalesce(col("n_ret"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_ret"))
          .as("precision"))
      .agg(avg("recall").as("avg_recall"), count(lit(1)).as("n_queries"),
        avg("precision").as("avg_precision"))
  }

  /** X8 (`ivf/operations.rs:148-193`): retrain on the current corpus with a
    * new config and re-derive every assignment — one batch job, not the
    * reference's collect-everything loop. Returns (centroids, reassigned). */
  def retrain(corpus: DataFrame, config: IvfConfig,
      embCol: String = "embedding"): (DataFrame, DataFrame) = {
    val cents = train(corpus.drop("cluster_id"), config, embCol)
    (cents, assign(corpus.drop("cluster_id"), cents, embCol))
  }

  /** X9 (`balance_clusters`, `ivf/operations.rs:422-492`): clusters above
    * `maxSize` keep their `maxSize` centroid-closest rows; overflow rows
    * move to their second-nearest centroid. */
  def balance(assigned: DataFrame, centroids: DataFrame, maxSize: Int,
      embCol: String = "embedding", metric: String = "l2",
      idCol: String = "id", roundTo: Int = -1): DataFrame = {
    val collected = centroids.select("cluster_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    // the element_at lookups below read cluster_id as a 0-based ARRAY
    // POSITION — non-contiguous ids (a filtered/imported centroid set)
    // would silently demote rows to the wrong clusters
    require(collected.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      s"balance requires contiguous 0-based cluster ids, got ${collected.map(_._1).mkString(",")}")
    val cids = typedLit(collected.map(_._1))
    val cents = typedLit(collected.map(_._2))
    // roundTo >= 0 ranks/argmins over ROUNDED distances — the same
    // oracle-determinism dial as nearestCentroid(roundTo): cross-engine
    // double drift must not flip the keep-vs-overflow rank of two
    // near-equidistant rows when a DuckDB replay checks the result
    val distsRaw = transform(cents, c => distance(metric, col(embCol), c))
    val dists =
      if (roundTo >= 0) transform(distsRaw, d => round(d, roundTo)) else distsRaw
    val own = element_at(dists, col("cluster_id") + 1) // cluster ids are 0-based positions
    // second nearest: min over all centroids except the assigned one
    val secondIdx = array_position(
      transform(dists, (d, i) => when(i === col("cluster_id"), lit(Double.MaxValue)).otherwise(d)),
      array_min(transform(dists, (d, i) =>
        when(i === col("cluster_id"), lit(Double.MaxValue)).otherwise(d))))
    // keep/overflow WITHOUT a per-cluster row_number window: the window
    // form must shuffle every row and full-sort the biggest cluster on a
    // single task — the skew shape the grouped top-k aggregate (T3)
    // exists to avoid, and balance runs on exactly the clusters whose
    // size got out of hand. Instead find each cluster's maxSize-th
    // smallest (own_dist, id) pair with the bounded-heap aggregate
    // (map-side partial; buffer <= 4*maxSize entries per group),
    // broadcast the <= nClusters threshold rows, and compare map-only:
    // ids are unique, so (own, id) <= threshold selects EXACTLY the rows
    // row_number <= maxSize selected under the same (dist ASC, id ASC)
    // order — including the id tie-break that keeps duplicate/equidistant
    // vectors ranking identically on every run and partitioning.
    // the aggregate's long/string tie-break and the raw-column keep
    // predicate below must rank identically: a fractional id would
    // truncate inside the aggregate but compare raw in the predicate, and
    // the aggregate silently drops null-id rows the predicate would route
    // to overflow — so require the id shape the uniqueness assumption
    // already implies (non-null, string or integral) instead of diverging
    import org.apache.spark.sql.types._
    val idType = assigned.schema(idCol).dataType
    val idIsString = idType == StringType
    require(idIsString ||
        Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"balance requires a string or integral id column for the keep/" +
        s"overflow tie-break; '$idCol' is $idType")
    // data-level null guard: the threshold aggregation scans every row, so
    // raising there catches a null id anywhere in `assigned`
    val checkedId = when(col(idCol).isNull,
      raise_error(lit(s"balance requires non-null '$idCol' ids")))
      .otherwise(col(idCol))
    val topk = if (idIsString) TopK.topKStr(maxSize) else TopK.topK(maxSize)
    val th = assigned
      .select(col("cluster_id").as("_bal_cid"), checkedId.as("_bal_id"),
        own.as("_bal_own"))
      .groupBy("_bal_cid")
      .agg(topk(col("_bal_id"), col("_bal_own")).as("_bal_hits"))
      // null when the cluster holds fewer than maxSize rows => keep all
      // (try_: ANSI element_at throws on index past the array end)
      .select(col("_bal_cid"),
        try_element_at(col("_bal_hits"), lit(maxSize)).as("_bal_th"))
    assigned
      .join(broadcast(th), col("cluster_id") === col("_bal_cid"), "left")
      .withColumn("cluster_id",
        when(col("_bal_th").isNull || own < col("_bal_th.dist") ||
            (own === col("_bal_th.dist") && col(idCol) <= col("_bal_th.id")),
          col("cluster_id"))
          .otherwise(element_at(cids, secondIdx.cast("int"))))
      .drop("_bal_cid", "_bal_th")
  }

  /** X10 (`ivf/operations.rs:494-549`): centroid snapshot with dimension
    * validation on import. */
  def exportCentroids(centroids: DataFrame, path: String): Unit =
    centroids.write.mode("overwrite").parquet(path)

  def importCentroids(spark: org.apache.spark.sql.SparkSession, path: String,
      expectedDim: Int): DataFrame = {
    val c = spark.read.parquet(path)
    val dims = c.select(size(col("centroid"))).distinct().collect().map(_.getInt(0))
    require(dims.length == 1 && dims.head == expectedDim,
      s"centroid dimension ${dims.mkString(",")} != expected $expectedDim")
    c
  }

  /** A4 cluster statistics (`ivf/operations.rs:264-289`). With `nClusters`
    * given, EMPTY cluster slots 0..nClusters-1 participate exactly as in
    * the reference (`:269-280`: sizes default to 0 over the configured
    * range, so avg = total/n_clusters, the variance includes the zeros,
    * and `empty_clusters` counts them); the no-arg form keeps the
    * observed-clusters-only summary for callers without a config. The
    * `empty_clusters` column is appended last so positional readers of
    * the original columns are unaffected.
    *
    * The slot join is FULL OUTER, not left: a left join from
    * range(nClusters) would silently DROP rows assigned to a cluster_id
    * outside [0, nClusters) — total_vectors/max_size would undercount
    * exactly where the no-arg form would have surfaced the
    * misconfiguration. With full_outer an out-of-range assignment shows
    * up as an extra cluster row (n_clusters > the configured count), so
    * the mismatch is loud in the summary instead of vanishing. */
  def clusterStats(assigned: DataFrame, nClusters: Int = -1): DataFrame = {
    val observed = assigned.groupBy("cluster_id").agg(count(lit(1)).as("size"))
    val sizes = if (nClusters <= 0) observed else {
      val spark = assigned.sparkSession
      val slotType = assigned.schema("cluster_id").dataType
      spark.range(nClusters)
        .select(col("id").cast(slotType).as("cluster_id"))
        .join(observed, Seq("cluster_id"), "full_outer")
        .na.fill(0L, Seq("size"))
    }
    sizes.agg(
      count(lit(1)).as("n_clusters"),
      sum("size").as("total_vectors"),
      round(avg("size"), 4).as("avg_size"),
      round(var_pop("size"), 4).as("size_variance"),
      max("size").as("max_size"), min("size").as("min_size"),
      count(when(col("size") === 0L, 1)).as("empty_clusters"))
  }
}
