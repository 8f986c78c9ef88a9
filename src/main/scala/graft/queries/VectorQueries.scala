package graft.queries

import graft.core.Tables
import graft.functions.VectorExpressions._
import graft.operators.Knn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact k-NN search queries over the embeddings table — the Spark-native
  * form of the reference's brute-force kernels (SURVEY.md §2.9 X17:
  * `batch_search_parallel`, `src/core/vector_ops.rs:310-346`) expressed as a
  * broadcast theta-join (J1) + codegen distance kernels + top-k (T1/T3).
  *
  * Distances are computed in double and rounded to 6 decimals on both sides;
  * ordering ties broken by vec_id so Spark and the DuckDB oracle select the
  * identical top-k set.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  private def knn(s: SparkSession, dir: String, metric: String, k: Int): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val dist = metric match {
      case "cosine" => round(vecCosine(col("embedding"), col("q_emb")), 6).as("cos_sim")
      case "l2" => round(vecL2(col("embedding"), col("q_emb")), 6).as("l2_dist")
      case "dot" => round(vecDot(col("embedding"), col("q_emb")), 6).as("dot")
    }
    val scored = e.crossJoin(broadcast(q)).select(col("vec_id"), dist)
    metric match {
      case "cosine" => scored.orderBy(desc("cos_sim"), asc("vec_id")).limit(k)
      case "l2" => scored.orderBy(asc("l2_dist"), asc("vec_id")).limit(k)
      case "dot" => scored.orderBy(desc("dot"), asc("vec_id")).limit(k)
    }
  }

  /** Embeddings with a synthetic JSON metadata column derived
    * deterministically from existing columns, so the filter language can be
    * exercised against a plain-SQL oracle. */
  private def withMeta(df: DataFrame): DataFrame =
    df.withColumn("metadata", to_json(struct(
      col("label"),
      when(col("vec_id") % 2 === 0, "even").otherwise("odd").as("parity"))))

  val queries: Map[String, Q] = Map(
    "knn_cosine" -> ((s, dir) => knn(s, dir, "cosine", 10)),
    "knn_l2" -> ((s, dir) => knn(s, dir, "l2", 10)),
    "knn_dot" -> ((s, dir) => knn(s, dir, "dot", 10)),
    // X17 batch search: 8 queries x corpus through the grouped top-k
    // aggregator (T3) — map-side partial top-k, no full window sort.
    "knn_batch_topk" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      Knn.batch(corpus, queries, k = 10, metric = "l2", roundDecimals = 6)
        .select(col("query_id"), col("id"), col("distance"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // Scale-out throughput demo comparable with the reference's 100K-vector
    // baseline (BASELINE.md): a 50x deterministically-perturbed replication
    // of the embeddings table (100K rows at sf0.1) searched by 100 queries
    // through the same broadcast-join + kernel + grouped-top-k plan.
    "knn_scale" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      // serve the scale corpus from its persisted table (built once per
      // corpus version, same values as QueryShapes.scaleCorpus — assign
      // only adds cluster_id): the timed query measures warm steady-state
      // exact search, not the interpreted transform() corpus perturbation
      val base = AnnQueries.ensureIvfScaleIndex(s, dir)
      val corpus = s.read.parquet(s"$base/data").select(col("id"), col("embedding"))
      val queries = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      Knn.batch(corpus, queries, k = 10, metric = "l2", roundDecimals = 6)
        .select(col("query_id"), col("id"), col("distance"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // X13/F1-F7: filtered search — pre-filter (exact-k) instead of the
    // reference's k*3 post-filter oversampling.
    "knn_filtered" -> ((s, dir) => {
      val e = withMeta(Tables.load(s, dir, "embeddings"))
        .select(col("vec_id").as("id"), col("embedding"), col("metadata"))
      val qv = Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      Knn.search(e, qv, k = 10, metric = "cosine",
        filterJson = Some("""{"$and": [{"label": {"$gte": 3, "$lte": 7}}, {"parity": "even"}]}"""),
        roundDecimals = 6)
        .withColumn("score", round(col("score"), 6))
        .orderBy("distance", "id")
    }),
    // F1-F7 as a hash-checked MATRIX: a battery of filter JSONs covering
    // the whole language (type-exact equality, array containment with
    // mixed-type elements, $in, ranges incl. the reference's lenient
    // non-numeric-bound fallback, $and/$or, dot-paths, missing paths)
    // runs through the REAL Catalyst translation (JSON parse -> variant
    // raw-token predicates) over metadata synthesized from doc_id
    // arithmetic — so DuckDB predicts every matched set in closed form
    // without parsing JSON at all. Each filter emits (filter_id,
    // n_matched, id_sum); a semantic drift in ANY operator flips a row.
    "filter_matrix" -> ((s, dir) => {
      import graft.functions.FilterJson
      val docs = Tables.load(s, dir, "documents").select("doc_id")
      // mixed-TYPE tags array (string, string, number) — exactly the
      // shape a typed from_json would destroy and raw tokens preserve
      val meta = concat(
        lit("{\"category\":\"c"), col("doc_id") % 4, lit("\","),
        lit("\"rank\":"), col("doc_id") % 100, lit(","),
        lit("\"rank_s\":\""), col("doc_id") % 100, lit("\","),
        lit("\"flag\":"),
        when(col("doc_id") % 2 === 0, "true").otherwise("false"), lit(","),
        lit("\"tags\":[\"t"), col("doc_id") % 5, lit("\",\"common\","),
        col("doc_id") % 7, lit("],"),
        lit("\"user\":{\"id\":\"u"), col("doc_id") % 10, lit("\",\"score\":"),
        col("doc_id") % 50, lit("}}"))
      val base = docs.select(col("doc_id"), meta.as("m"))
      val filters = Seq(
        "f01_eq_string" -> """{"category": "c1"}""",
        "f02_eq_number" -> """{"rank": 7}""",
        "f03_num_vs_stored_string" -> """{"rank_s": 7}""",
        "f04_string_vs_stored_string" -> """{"rank_s": "7"}""",
        "f05_eq_boolean" -> """{"flag": true}""",
        "f06_array_contains_string" -> """{"tags": "common"}""",
        "f07_array_contains_t2" -> """{"tags": "t2"}""",
        "f08_array_contains_number" -> """{"tags": 3}""",
        "f09_array_string_vs_number_elem" -> """{"tags": "3"}""",
        "f10_range_gte_lt" -> """{"rank": {"$gte": 10, "$lt": 20}}""",
        "f11_in_numbers" -> """{"rank": {"$in": [1, 2, 3]}}""",
        "f12_dot_path" -> """{"user.id": "u3"}""",
        "f13_dot_path_range" -> """{"user.score": {"$gt": 40}}""",
        "f14_or" -> """{"$or": [{"category": "c0"}, {"rank": {"$gte": 95}}]}""",
        "f15_and" -> """{"$and": [{"flag": true}, {"tags": "t1"}]}""",
        "f16_missing_path" -> """{"missing.path": "x"}""",
        "f17_lenient_bound_ignored" -> """{"rank": {"$gte": "x", "$lt": 5}}""",
        "f18_implicit_and" -> """{"category": "c2", "flag": true}""")
      filters.map { case (fid, f) =>
        base.filter(FilterJson.predicate(f, col("m")))
          .agg(lit(fid).as("filter_id"),
            count(lit(1)).as("n_matched"),
            coalesce(sum("doc_id"), lit(0L)).as("id_sum"))
      }.reduce(_.unionByName(_)).orderBy("filter_id")
    }),
    // k-NN GRAPH construction (the SemDeDup/semantic-dedup primitive):
    // every vector's top-3 neighbors. Exact all-pairs = the bounded ground
    // truth; blocked = the IVF-cluster-at-scale shape, replayed exactly by
    // the oracle because the block key (label) is deterministic.
    "knn_join" -> ((s, dir) => {
      graft.operators.KnnJoin.exact(Tables.load(s, dir, "embeddings"),
          k = 3, idCol = "vec_id")
        .orderBy("id", "rank")
    }),
    "knn_join_blocked" -> ((s, dir) => {
      graft.operators.KnnJoin.blocked(Tables.load(s, dir, "embeddings"),
          k = 3, blockCol = "label", idCol = "vec_id")
        .orderBy("id", "rank")
    }),
    // graph recall: how much of the exact k-NN graph the blocked build
    // recovers — the eval that sizes blocking/multi-probe BEFORE a 100 TB
    // graph job commits to a block source. On this synthetic corpus the
    // verdict is itself the demo: `label` is not a cosine-coherent
    // clustering (avg recall ~0.10), i.e. the eval correctly rejects a
    // bad block source — KnnJoinSpec shows the same eval scoring 1.0
    // under a coherent blocking, and at scale the block is an IVF-trained
    // cluster_id, not a metadata column.
    "knn_join_recall" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val exact = graft.operators.KnnJoin.exact(e, k = 3, idCol = "vec_id")
      val approx = graft.operators.KnnJoin.blocked(e, k = 3,
        blockCol = "label", idCol = "vec_id")
      graft.operators.KnnJoin.graphRecall(exact, approx)
        .agg(round(avg("recall"), 6).as("avg_recall"),
          round(min("recall"), 6).as("min_recall"),
          count(lit(1)).as("n_ids"))
    }),
    // M13 query expansion: hash-deterministic noise draws (never rand())
    // make the whole 1->N generator engine-replayable — DuckDB re-derives
    // the same per-element noise from the same md5 formula, applies the
    // same float32 perturb + renormalize chain with the same strict-order
    // folds, and the rounded norm/sum aggregates hash-match bit-for-bit.
    // The contract pinned: variant 0 unperturbed, every variant rescaled
    // to the original magnitude.
    "query_expansion" -> ((s, dir) => {
      val qs = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      graft.operators.QueryExpansion.expand(qs, variants = 3, noise = 0.1)
        .select(col("query_id"), col("variant"),
          size(col("q_embedding")).as("n_elems"),
          round(sqrt(aggregate(col("q_embedding"), lit(0.0),
            (a, x) => a + x.cast("double") * x.cast("double"))), 6).as("vec_norm"),
          round(aggregate(col("q_embedding"), lit(0.0),
            (a, x) => a + x.cast("double")), 6).as("elem_sum"))
        .orderBy("query_id", "variant")
    }),
    // M6 inner-product -> cosine correction: recover cosine from a raw dot
    // score and the two norms (the store serves dot-scored shortlists that
    // downstream rescoring normalizes). The oracle computes cosine from
    // scratch — if the correction formula drifted (wrong denominator,
    // missing zero-norm guard), the recovered values would not match.
    "ip_to_cosine" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      e.filter(col("vec_id") < 50).crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.functions.VectorFunctions.innerProductToCosine(
            vecDot(col("embedding"), col("q_emb")),
            vecNorm(col("embedding")), vecNorm(col("q_emb"))), 6)
            .as("cos_from_ip"))
        .orderBy("vec_id")
    }))

  private val qSub =
    "(SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0) q"

  /** filter_matrix's closed-form replay: the metadata is pure doc_id
    * arithmetic, so every filter's matched set is an arithmetic predicate
    * — DuckDB never parses JSON, which is the point: a drift in the
    * Catalyst filter translation cannot be mirrored by a drift here. */
  private val filterMatrixOracle: String = {
    val preds = Seq(
      "f01_eq_string" -> "doc_id % 4 = 1",
      "f02_eq_number" -> "doc_id % 100 = 7",
      "f03_num_vs_stored_string" -> "FALSE",
      "f04_string_vs_stored_string" -> "doc_id % 100 = 7",
      "f05_eq_boolean" -> "doc_id % 2 = 0",
      "f06_array_contains_string" -> "TRUE",
      "f07_array_contains_t2" -> "doc_id % 5 = 2",
      "f08_array_contains_number" -> "doc_id % 7 = 3",
      "f09_array_string_vs_number_elem" -> "FALSE",
      "f10_range_gte_lt" -> "doc_id % 100 >= 10 AND doc_id % 100 < 20",
      "f11_in_numbers" -> "doc_id % 100 IN (1, 2, 3)",
      "f12_dot_path" -> "doc_id % 10 = 3",
      "f13_dot_path_range" -> "doc_id % 50 > 40",
      "f14_or" -> "doc_id % 4 = 0 OR doc_id % 100 >= 95",
      "f15_and" -> "doc_id % 2 = 0 AND doc_id % 5 = 1",
      "f16_missing_path" -> "FALSE",
      "f17_lenient_bound_ignored" -> "doc_id % 100 < 5",
      "f18_implicit_and" -> "doc_id % 4 = 2 AND doc_id % 2 = 0")
    preds.map { case (fid, p) =>
      s"SELECT '$fid' AS filter_id, count(*)::BIGINT AS n_matched, " +
        s"coalesce(sum(doc_id), 0)::BIGINT AS id_sum FROM documents WHERE $p"
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY filter_id")
  }

  val oracles: Map[String, String] = Map(
    "filter_matrix" -> filterMatrixOracle,
    "knn_cosine" ->
      s"""SELECT e.vec_id,
         |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS cos_sim
         |FROM embeddings e, $qSub
         |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "knn_l2" ->
      s"""SELECT e.vec_id,
         |  round(list_distance(e.embedding::DOUBLE[], q.q_emb), 6) AS l2_dist
         |FROM embeddings e, $qSub
         |ORDER BY l2_dist ASC, e.vec_id LIMIT 10""".stripMargin,
    "knn_dot" ->
      s"""SELECT e.vec_id,
         |  round(list_inner_product(e.embedding::DOUBLE[], q.q_emb), 6) AS dot
         |FROM embeddings e, $qSub
         |ORDER BY dot DESC, e.vec_id LIMIT 10""".stripMargin,
    "knn_scale" ->
      """WITH corpus AS (
        |  SELECT e.vec_id * 50 + t.i AS id,
        |    list_transform(e.embedding, x -> (x::DOUBLE + t.i * 0.001)::REAL) AS emb
        |  FROM embeddings e, range(0, 50) t(i)),
        |q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 100),
        |scored AS (
        |  SELECT q.query_id, c.id,
        |    round(list_distance(c.emb::DOUBLE[], q.qe), 6) AS distance
        |  FROM corpus c CROSS JOIN q),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, id) AS rank
        |  FROM scored)
        |SELECT query_id, id, distance, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "knn_batch_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    round(list_distance(e.embedding::DOUBLE[], q.qe), 6) AS distance
        |  FROM embeddings e CROSS JOIN q),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, id) AS rank
        |  FROM scored)
        |SELECT query_id, id, distance, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "knn_filtered" ->
      s"""SELECT e.vec_id AS id,
         |  round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS distance,
         |  round(1.0 / (1.0 + round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6)), 6) AS score
         |FROM embeddings e, $qSub
         |WHERE e.label BETWEEN 3 AND 7 AND e.vec_id % 2 = 0
         |ORDER BY distance, id LIMIT 10""".stripMargin,
    "knn_join" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nid,
        |    round(1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS d
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, nid) AS rank FROM p)
        |SELECT id, nid AS neighbor_id, rank, round(1.0 - d, 6) AS cosine
        |FROM r WHERE rank <= 3 ORDER BY id, rank""".stripMargin,
    "knn_join_blocked" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nid,
        |    round(1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS d
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, nid) AS rank FROM p)
        |SELECT id, nid AS neighbor_id, rank, round(1.0 - d, 6) AS cosine
        |FROM r WHERE rank <= 3 ORDER BY id, rank""".stripMargin,
    "knn_join_recall" ->
      """WITH ep AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nid,
        |    round(1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS d
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |ex AS (SELECT id, nid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, nid) AS rank FROM ep)
        |  WHERE rank <= 3),
        |bp AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nid,
        |    round(1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS d
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |ap AS (SELECT id, nid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, nid) AS rank FROM bp)
        |  WHERE rank <= 3),
        |perid AS (SELECT ex.id,
        |    sum(CASE WHEN ap.nid IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*) AS recall
        |  FROM ex LEFT JOIN ap ON ex.id = ap.id AND ex.nid = ap.nid
        |  GROUP BY ex.id)
        |SELECT round(avg(recall), 6) AS avg_recall,
        |  round(min(recall), 6) AS min_recall, count(*) AS n_ids
        |FROM perid""".stripMargin,
    // full replay of the expansion generator: same md5-derived noise per
    // (query, variant, element, seed), same float32 perturb cast, same
    // STRICT-ORDER double folds (list_reduce over list_prepend — SQL
    // sum() is order-free and would drift in the last bits), same
    // (x * orig / new) rescale association, applied to variant 0 too
    "query_expansion" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS emb
        |  FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT query_id, emb, v::INT AS variant FROM q, range(0, 3) r(v)),
        |el AS (SELECT query_id, variant, i, emb[i::INT + 1]::DOUBLE AS x
        |  FROM v, range(0, 4096) r(i) WHERE i < len(emb)),
        |nz AS (SELECT query_id, variant, i, x,
        |  CASE WHEN variant = 0 THEN x::FLOAT
        |  ELSE (x + (('0x' || substr(md5(query_id::VARCHAR || ':'
        |      || variant::VARCHAR || ':' || i::VARCHAR || ':42'), 1, 8))::UBIGINT::DOUBLE
        |      / 4294967296.0 * 2.0 - 1.0) * 0.1)::FLOAT END AS nx
        |  FROM el),
        |lists AS (SELECT query_id, variant,
        |    list(x ORDER BY i) AS xs, list(nx::DOUBLE ORDER BY i) AS nxs
        |  FROM nz GROUP BY 1, 2),
        |norms AS (SELECT query_id, variant, nxs,
        |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(xs, a -> a * a)), (a, b) -> a + b)) AS orig_norm,
        |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(nxs, a -> a * a)), (a, b) -> a + b)) AS new_norm
        |  FROM lists),
        |fin AS (SELECT query_id, variant,
        |    CASE WHEN new_norm = 0 THEN list_transform(nxs, a -> a::FLOAT)
        |    ELSE list_transform(nxs, a -> (a * orig_norm / new_norm)::FLOAT)
        |    END AS fv
        |  FROM norms)
        |SELECT query_id, variant, len(fv)::INT AS n_elems,
        |  round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(fv, a -> a::DOUBLE * a::DOUBLE)), (a, b) -> a + b)), 6) AS vec_norm,
        |  round(list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(fv, a -> a::DOUBLE)), (a, b) -> a + b), 6) AS elem_sum
        |FROM fin ORDER BY query_id, variant""".stripMargin,
    // cosine recomputed from first principles as dot/(|a||b|) — the same
    // arithmetic M6 performs on a served dot score
    "ip_to_cosine" ->
      s"""SELECT e.vec_id,
         |  round(list_inner_product(e.embedding::DOUBLE[], q.q_emb) /
         |    (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
         |     * sqrt(list_inner_product(q.q_emb, q.q_emb))), 6) AS cos_from_ip
         |FROM embeddings e,
         |  (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0) q
         |WHERE e.vec_id < 50 ORDER BY e.vec_id""".stripMargin)
}
