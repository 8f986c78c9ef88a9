package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** codebooks(sub)(code) = centroid of that subspace cell.
    *
    * Subspace s starts at `s * subDim`; its LENGTH is the trained
    * codebook's cell width, which for the last subspace includes the
    * remainder when dim is not divisible by m — the reference's split
    * rule exactly (`vector_ops.rs:410-421`: `subvector_dim = dim / m`
    * floored, last subspace's `end = vector_dim`). */
  case class PqModel(m: Int, k: Int, subDim: Int,
      codebooks: Array[Array[Array[Float]]]) {
    /** Width of subspace s (the remainder folds into the last one). */
    def subLen(s: Int): Int =
      if (codebooks.nonEmpty && codebooks(s).nonEmpty) codebooks(s)(0).length
      else subDim
  }

  /** Slice boundaries for subspace s of a dim-wide vector: the floor
    * split with the reference's last-takes-remainder rule. */
  private def subEnd(s: Int, m: Int, subDim: Int, dim: Int): Int =
    if (s == m - 1) dim else (s + 1) * subDim

  def train(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
      embCol: String = "embedding", trainSize: Int = 10000,
      seed: Long = 42L): PqModel = {
    require(m >= 1 && m <= dim, s"need 1 <= m <= dim, got m=$m dim=$dim")
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
      val sub = sample.map(v => v.slice(s * subDim, subEnd(s, m, subDim, dim)))
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
        slice(embCol, s * model.subDim + 1, model.subLen(s)), model.codebooks(s), "l2")
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
      val qs = query.slice(s * model.subDim, s * model.subDim + model.subLen(s))
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

  /** Per-query ADC lookup tables, driver-built for a bounded query batch:
    * l2 cells are ||query_sub - centroid||^2 (summed -> squared L2), cosine
    * cells are dot(query_sub, centroid) (summed -> dot(q, v̂)). Shared by
    * [[adcSearchBatch]] and [[searchBatchIvfPq]]. */
  private def adcTables(model: PqModel, qVecs: Array[Array[Float]],
      metric: String): Array[Array[Array[Double]]] =
    qVecs.map { q =>
      Array.tabulate(model.m) { s =>
        val qs = q.slice(s * model.subDim, s * model.subDim + model.subLen(s))
        model.codebooks(s).map { c =>
          var acc = 0.0; var i = 0
          if (metric == "l2") {
            while (i < qs.length) { val d = qs(i).toDouble - c(i).toDouble; acc += d * d; i += 1 }
          } else {
            while (i < qs.length) { acc += qs(i).toDouble * c(i).toDouble; i += 1 }
          }
          acc
        }
      }
    }

  /** The query-independent per-cell ||centroid||^2 table (one "query" slot),
    * combined with the dot tables into approximate cosine. */
  private def normSqTable(model: PqModel): Array[Array[Array[Double]]] =
    Array(Array.tabulate(model.m) { s =>
      model.codebooks(s).map { c =>
        var acc = 0.0; var i = 0
        while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
        acc
      }
    })

  /** Approximate-distance column over (codes, q_idx, q_norm) given the
    * prebuilt tables: sqrt of the L2 table sum, or 1 - dot/(|q|·|v̂|). */
  private def adcDistance(model: PqModel, metric: String,
      tables: Array[Array[Array[Double]]]): Column = {
    val adc = graft.functions.VectorExpressions.pqAdcTableDist(
      col("codes"), col("q_idx"), tables)
    if (metric == "l2") sqrt(adc) else {
      val vNorm = sqrt(graft.functions.VectorExpressions.pqAdcTableDist(
        col("codes"), lit(0), normSqTable(model)))
      val den = col("q_norm") * vNorm
      when(den === 0.0, lit(1.0)).otherwise(lit(1.0) - adc / den)
    }
  }

  /** Batch ADC search over a FLAT encoded corpus (no inverted file): one
    * scan of the code table scores every (row, query) pair through the
    * codegen table kernel — the batch form of [[adcSearch]], replacing a
    * per-query driver loop with a single plan — then the shared
    * shortlist/rerank/top-k tail. For corpus-scale serving prefer
    * [[searchBatchIvfPq]], whose coarse pruning skips unprobed partitions.
    *
    * @param encoded (idCol, codes ARRAY<INT>)
    * @param rerank  optional (idCol, embedding) raw vectors for exact rerank
    */
  def adcSearchBatch(encoded: DataFrame, model: PqModel, queries: DataFrame,
      k: Int, shortlist: Int = 100, rerank: Option[DataFrame] = None,
      idCol: String = "id", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", metric: String = "l2"): DataFrame = {
    require(metric == "l2" || metric == "cosine",
      s"PQ ADC supports l2|cosine, got '$metric'")
    val spark = queries.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(queryIdCol), col(queryEmbCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val tables = adcTables(model, qRows.map(_._2), metric)
    val p = qRows.zipWithIndex.map { case ((qid, q), i) =>
      var acc = 0.0; var j = 0
      while (j < q.length) { acc += q(j).toDouble * q(j).toDouble; j += 1 }
      (qid, i, math.sqrt(acc))
    }.toSeq.toDF(queryIdCol, "q_idx", "q_norm")
    val scored = encoded.crossJoin(broadcast(p))
      .select(col(queryIdCol), col(idCol).as("id"),
        adcDistance(model, metric, tables).as("distance"))
    val idIsString =
      encoded.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    val qRel = queryRelation(spark, qRows, queryIdCol, queryEmbCol)
    Ivf.shortlistRerankTopK(scored, qRel, k, shortlist, idIsString, rerank,
      idCol, queryIdCol, queryEmbCol, metric)
  }

  // ---- residual IVF-PQ (the FAISS formulation: PQ on r = v - centroid) ----

  /** (cluster_id -> centroid) collected from the tiny centroid relation.
    * Callers composing several residual steps (train + encode) should
    * collect once and use the Map overloads. */
  def collectCentroids(centroids: DataFrame): Map[Long, Array[Float]] =
    centroids.select(col("cluster_id").cast("long"), col("centroid")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** The (query_id LONG, q_embedding ARRAY<FLOAT>) relation every batch
    * search tail joins for rerank — one definition for all three ADC
    * entry points. */
  private def queryRelation(spark: org.apache.spark.sql.SparkSession,
      qVecs: Array[(Long, Array[Float])], queryIdCol: String,
      queryEmbCol: String): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(qVecs.map(v => Row(v._1, v._2)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(queryIdCol,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(queryEmbCol,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))

  /** Train PQ codebooks on RESIDUALS (v - its cluster centroid): residuals
    * concentrate around zero with far less variance than raw vectors, so
    * the same m x k code budget quantizes them with lower error — the
    * classic IVF-PQ refinement. `assigned` must carry (embCol, cluster_id)
    * (the output of [[Ivf.assign]]). */
  def trainResidual(assigned: DataFrame, centroids: DataFrame, dim: Int,
      m: Int = 8, k: Int = 16, embCol: String = "embedding",
      trainSize: Int = 10000, seed: Long = 42L): PqModel =
    trainResidual(assigned, collectCentroids(centroids), dim, m, k,
      embCol, trainSize, seed)

  /** [[trainResidual]] over an already-collected centroid map. */
  def trainResidual(assigned: DataFrame, cents: Map[Long, Array[Float]],
      dim: Int, m: Int, k: Int, embCol: String,
      trainSize: Int, seed: Long): PqModel = {
    require(m >= 1 && m <= dim, s"need 1 <= m <= dim, got m=$m dim=$dim")
    val subDim = dim / m
    val sample: Array[Array[Float]] = assigned
      .select(col(embCol), col("cluster_id").cast("long"))
      .orderBy(org.apache.spark.sql.functions.rand(seed)).limit(trainSize)
      .collect().map { r =>
        val v = r.getSeq[Float](0).toArray
        val c = cents(r.getLong(1))
        Array.tabulate(v.length)(i => v(i) - c(i))
      }
    val books = Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * subDim, subEnd(s, m, subDim, dim)))
      Lloyd.kmeans(sub, k, maxIter = 25, seed = seed + s)
    }
    PqModel(m, k, subDim, books)
  }

  /** Residual-encode: [[encode]] of (embedding - centroid(cluster_id)),
    * map-only via a broadcast centroid literal — the residual is let-bound
    * so the subtraction runs once per row, not once per subspace. */
  def encodeResidual(model: PqModel, centroids: DataFrame,
      embCol: Column, clusterCol: Column): Column =
    encodeResidual(model, collectCentroids(centroids), embCol, clusterCol)

  /** [[encodeResidual]] over an already-collected centroid map. */
  def encodeResidual(model: PqModel, cents: Map[Long, Array[Float]],
      embCol: Column, clusterCol: Column): Column = {
    val n = cents.keys.max.toInt + 1
    require(cents.size == n, s"centroid ids not contiguous 0..${n - 1}")
    val centLit = typedLit(Array.tabulate(n)(i => cents(i.toLong)))
    val residual = zip_with(embCol,
      element_at(centLit, clusterCol.cast("int") + 1), (a, b) => a - b)
    graft.functions.ColumnOps.bindOnce(residual)(r => encode(model, r))
  }

  /** Batch residual IVF-PQ search (l2): approximate distance is
    * ||(q - centroid_c) - decode(codes)||, so the ADC lookup table depends
    * on the (query, probed cluster) PAIR — built per probe pair on the
    * driver (|tables| = nq x nProbe x m x k doubles, bounded) and served
    * by the same codegen table kernel through the pair index. Coarse
    * pruning, shortlist and exact rerank are identical to
    * [[searchBatchIvfPq]]. */
  /** Per-plan budget for driver-built ADC lookup tables (doubles). The
    * residual path embeds nq x nProbe x m x k doubles as a plan literal;
    * unbounded, a 10k-query, nProbe=16 batch would ship a ~650 MB task
    * binary. 4M doubles = 32 MB/plan. */
  private val maxAdcTableDoubles = 4 << 20

  def searchBatchIvfPqResidual(encoded: DataFrame, centroids: DataFrame,
      model: PqModel, queries: DataFrame, k: Int, nProbe: Int,
      shortlist: Int = 100, rerank: Option[DataFrame] = None,
      idCol: String = "id", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", metric: String = "l2"): DataFrame = {
    require(metric == "l2" || metric == "cosine",
      s"residual PQ supports l2|cosine, got '$metric'")
    val pRows = Ivf.probeRows(centroids, queries, nProbe, metric,
      queryIdCol, queryEmbCol)._1
    val cents = collectCentroids(centroids)
    val pairs = pRows.map { r =>
      (r.getAs[Long](queryIdCol),
        r.getAs[scala.collection.Seq[Float]](queryEmbCol).toArray,
        r.getAs[Long]("cluster_id"))
    }
    // per-query top-k is independent across queries, so a large batch
    // splits into chunks whose ADC tables fit the per-plan budget; the
    // probed scan runs once per chunk — bounded memory traded for
    // re-reads, the right side of that trade for a code-tier scan.
    // (cosine builds per-QUERY + per-CLUSTER tables, not per-pair, so its
    // per-query footprint has no nProbe factor)
    val perQueryDoubles = math.max(1,
      (if (metric == "l2") nProbe else 1) * model.m * model.k)
    val chunkQ = math.max(1, maxAdcTableDoubles / perQueryDoubles)
    def chunk(ps: Array[(Long, Array[Float], Long)]): DataFrame =
      if (metric == "l2")
        residualChunk(encoded, model, cents, ps, k, shortlist, rerank,
          idCol, queryIdCol, queryEmbCol)
      else
        residualCosineChunk(encoded, model, cents, ps, k, shortlist, rerank,
          idCol, queryIdCol, queryEmbCol)
    val qids = pairs.map(_._1).distinct
    if (qids.isEmpty) chunk(pairs) // empty batch: schema-correct empty
    else qids.grouped(chunkQ)
      .map { qs =>
        val qSet = qs.toSet
        chunk(pairs.filter(p => qSet.contains(p._1)))
      }
      .reduce(_ unionByName _)
  }

  /** One bounded chunk of [[searchBatchIvfPqResidual]]: builds the
    * (query, probed cluster) pair tables and runs prune → ADC → shortlist
    * → rerank → top-k for just these pairs. */
  private def residualChunk(encoded: DataFrame, model: PqModel,
      cents: Map[Long, Array[Float]],
      pairs: Array[(Long, Array[Float], Long)], k: Int, shortlist: Int,
      rerank: Option[DataFrame], idCol: String, queryIdCol: String,
      queryEmbCol: String): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val tables: Array[Array[Array[Double]]] = pairs.map { case (_, q, c) =>
      val cent = cents(c)
      val res = Array.tabulate(q.length)(i => q(i) - cent(i))
      Array.tabulate(model.m) { s =>
        val rs = res.slice(s * model.subDim, s * model.subDim + model.subLen(s))
        model.codebooks(s).map { cell =>
          var acc = 0.0; var i = 0
          while (i < rs.length) { val d = rs(i).toDouble - cell(i).toDouble; acc += d * d; i += 1 }
          acc
        }
      }
    }
    val p = pairs.zipWithIndex
      .map { case ((qid, _, c), i) => (qid, i, c) }
      .toSeq.toDF(queryIdCol, "q_idx", "cluster_id")
    val probedIds = pairs.map(_._3).distinct
    val pruned = encoded.filter(col("cluster_id").isin(probedIds: _*))
    val scored = pruned
      .join(broadcast(p), pruned("cluster_id") === p("cluster_id"))
      .select(col(queryIdCol), col(idCol).as("id"),
        sqrt(graft.functions.VectorExpressions.pqAdcTableDist(
          col("codes"), col("q_idx"), tables)).as("distance"))
    val idIsString =
      encoded.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    val qRel = queryRelation(spark,
      pairs.map(pr => (pr._1, pr._2)).distinctBy(_._1), queryIdCol, queryEmbCol)
    Ivf.shortlistRerankTopK(scored, qRel, k, shortlist, idIsString, rerank,
      idCol, queryIdCol, queryEmbCol, "l2")
  }

  /** One bounded chunk of [[searchBatchIvfPqResidual]] under COSINE.
    * With v̂ = centroid_c + decode(codes), the approximate cosine distance
    * decomposes into table lookups the existing codegen kernel serves:
    *
    *   dot(q, v̂)  = dot(q, c)            (per-pair constant)
    *              + Σ_s dot(q_s, cell_s)  (per-QUERY table — cluster-free,
    *                                       residual codebooks are global)
    *   |v̂|²       = |c|²                 (per-pair constant)
    *              + Σ_s (2·dot(c_s, cell_s) + |cell_s|²)  (per-CLUSTER table)
    *
    * so the plan embeds nq + nProbedClusters tables instead of the l2
    * path's nq x nProbe pair tables — strictly smaller. Shortlist is
    * ranked by 1 - dot/(|q|·|v̂|); the exact rerank (same metric) fixes
    * the final distances like every code-tier path. */
  private def residualCosineChunk(encoded: DataFrame, model: PqModel,
      cents: Map[Long, Array[Float]],
      pairs: Array[(Long, Array[Float], Long)], k: Int, shortlist: Int,
      rerank: Option[DataFrame], idCol: String, queryIdCol: String,
      queryEmbCol: String): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qVecs = pairs.map(p => (p._1, p._2)).distinctBy(_._1)
    val qIdx = qVecs.map(_._1).zipWithIndex.toMap
    val qTables = adcTables(model, qVecs.map(_._2), "cosine") // dot cells
    val qNorm = qVecs.map { case (_, v) =>
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
    val probed = pairs.map(_._3).distinct
    val cIdx = probed.zipWithIndex.toMap
    val cTables: Array[Array[Array[Double]]] = probed.map { cid =>
      val c = cents(cid)
      Array.tabulate(model.m) { s =>
        val cs = c.slice(s * model.subDim, s * model.subDim + model.subLen(s))
        model.codebooks(s).map { cell =>
          var dot = 0.0; var nsq = 0.0; var i = 0
          while (i < cs.length) {
            dot += cs(i).toDouble * cell(i).toDouble
            nsq += cell(i).toDouble * cell(i).toDouble
            i += 1
          }
          2.0 * dot + nsq
        }
      }
    }
    val p = pairs.map { case (qid, qv, cid) =>
        val c = cents(cid)
        var dqc = 0.0; var cn = 0.0; var i = 0
        while (i < qv.length) {
          dqc += qv(i).toDouble * c(i).toDouble
          cn += c(i).toDouble * c(i).toDouble
          i += 1
        }
        (qid, qIdx(qid), cIdx(cid), dqc, cn, qNorm(qIdx(qid)), cid)
      }
      .toSeq.toDF(queryIdCol, "q_idx", "c_idx", "dot_qc", "c_normsq",
        "q_norm", "cluster_id")
    val pruned = encoded.filter(col("cluster_id").isin(probed: _*))
    val tq = graft.functions.VectorExpressions.pqAdcTableDist(
      col("codes"), col("q_idx"), qTables)
    val tc = graft.functions.VectorExpressions.pqAdcTableDist(
      col("codes"), col("c_idx"), cTables)
    val num = col("dot_qc") + tq
    // greatest(0): |v̂|² is mathematically >= 0 but the three-term float
    // sum can round a hair negative — sqrt(NaN) must not eat a candidate
    val den = col("q_norm") * sqrt(greatest(lit(0.0), col("c_normsq") + tc))
    val scored = pruned
      .join(broadcast(p), pruned("cluster_id") === p("cluster_id"))
      .select(col(queryIdCol), col(idCol).as("id"),
        when(den === 0.0, lit(1.0)).otherwise(lit(1.0) - num / den)
          .as("distance"))
    val idIsString =
      encoded.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    val qRel = queryRelation(spark,
      pairs.map(pr => (pr._1, pr._2)).distinctBy(_._1), queryIdCol, queryEmbCol)
    Ivf.shortlistRerankTopK(scored, qRel, k, shortlist, idIsString, rerank,
      idCol, queryIdCol, queryEmbCol, "cosine")
  }

  // ---- model persistence (the X10 analog for quantization state: the
  // reference persists codebooks with the index, `ivf/persistence.rs`) ----

  /** Save codebooks as plain parquet rows (sub, code, centroid) — the shape
    * is self-describing, so [[load]] needs no sidecar. */
  def save(spark: org.apache.spark.sql.SparkSession, model: PqModel,
      path: String): Unit = {
    import spark.implicits._
    val rows = for {
      s <- model.codebooks.indices
      c <- model.codebooks(s).indices
    } yield (s, c, model.codebooks(s)(c))
    rows.toDF("sub", "code", "centroid").repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(path)
      .select(col("sub"), col("code"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, s"no PQ codebooks at $path")
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val byCell = rows.map(r => (r._1, r._2) -> r._3).toMap
    require(byCell.size == m * k, s"codebook grid incomplete: ${byCell.size} != $m x $k")
    val books = Array.tabulate(m, k)((s, c) => byCell((s, c)))
    PqModel(m, k, books(0)(0).length, books)
  }

  // ---- IVF-PQ composition (X7 + A2: ADC within probed inverted lists) ----

  /** Batch IVF-PQ search: n_probe coarse pruning exactly like
    * [[Ivf.searchBatch]] (static cluster_id pruning + broadcast probes),
    * but candidate scoring is PQ asymmetric distance — per-query lookup
    * tables over the codebooks, O(m) per row in whole-stage codegen — and
    * an optional exact rerank of the per-query `shortlist` against the raw
    * vectors. This is the 100 TB pattern: the scan touches only probed
    * partitions of the 8-byte-per-vector code table; raw embeddings are
    * read only for shortlist×queries rows.
    *
    * @param encoded (idCol LONG or STRING, cluster_id LONG, codes ARRAY<INT>)
    * @param rerank  optional (idCol, embedding ARRAY<FLOAT>) raw
    *                vectors; when given, results carry exact distances of
    *                the ADC shortlist re-ranked, top-k
    * @param adcQueryTransform applied to each collected query vector
    *                BEFORE the ADC tables are built — the OPQ hook
    *                ([[Opq.searchBatchIvf]] passes the learned rotation):
    *                the codes live in the transformed space, while the
    *                coarse probe and the exact rerank stay in RAW space
    *                (the store's cluster ids and embeddings are raw; an
    *                orthogonal transform preserves l2/cosine, so the two
    *                spaces rank identically). Identity for plain PQ.
    */
  def searchBatchIvfPq(encoded: DataFrame, centroids: DataFrame,
      model: PqModel, queries: DataFrame, k: Int, nProbe: Int,
      shortlist: Int = 100, rerank: Option[DataFrame] = None,
      idCol: String = "id", queryIdCol: String = "query_id",
      queryEmbCol: String = "q_embedding", metric: String = "l2",
      adcQueryTransform: Array[Float] => Array[Float] = identity): DataFrame = {
    require(metric == "l2" || metric == "cosine",
      s"PQ code tier supports l2|cosine, got '$metric'")
    val spark = queries.sparkSession
    val pRows = Ivf.probeRows(centroids, queries, nProbe, metric,
      queryIdCol, queryEmbCol)._1
    // one ADC table per distinct query, driver-built (query batches are
    // bounded; |tables| = nq x m x k doubles) — see [[adcTables]] for the
    // l2/cosine cell contents, [[adcDistance]] for the combination.
    val qVecs = pRows.map(r =>
        r.getAs[Long](queryIdCol) -> r.getAs[scala.collection.Seq[Float]](queryEmbCol))
      .distinct
    val qIdx = qVecs.map(_._1).zipWithIndex.toMap
    // tables (and the cosine |q| below) come from the TRANSFORMED query —
    // that is the space the codes quantize
    val qAdcVecs = qVecs.map(v => adcQueryTransform(v._2.toArray))
    val tables = adcTables(model, qAdcVecs, metric)
    import spark.implicits._
    val qNorm = qAdcVecs.map { emb =>
      var acc = 0.0; var i = 0
      while (i < emb.length) { acc += emb(i).toDouble * emb(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
    val p = pRows.map { r =>
        val qid = r.getAs[Long](queryIdCol)
        (qid, qIdx(qid), qNorm(qIdx(qid)), r.getAs[Long]("cluster_id"))
      }
      .toSeq.toDF(queryIdCol, "q_idx", "q_norm", "cluster_id")
    val probedIds = pRows.map(_.getAs[Long]("cluster_id")).distinct
    val pruned = encoded.filter(col("cluster_id").isin(probedIds: _*))
    // l2: sqrt inside adcDistance (not after the shortlist) so the shared
    // tail sees a true distance — monotonic, so the shortlist ranking is
    // unchanged. cosine: 1 - dot/(|q|·|v̂|) against the shared norm table.
    val scored = pruned
      .join(broadcast(p), pruned("cluster_id") === p("cluster_id"))
      .select(col(queryIdCol), col(idCol).as("id"),
        adcDistance(model, metric, tables).as("distance"))
    // string ids (the store's natural keys) ride through the aggregates
    // natively, same as Knn.batch / Ivf.searchBatch
    val idIsString =
      encoded.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    val qRel = queryRelation(spark, qVecs.map(v => (v._1, v._2.toArray)),
      queryIdCol, queryEmbCol)
    Ivf.shortlistRerankTopK(scored, qRel, k, shortlist, idIsString, rerank,
      idCol, queryIdCol, queryEmbCol, metric)
  }
}
