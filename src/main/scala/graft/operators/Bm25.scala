package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword relevance over a documents table — the full-text half
  * of hybrid keyword+vector search, expressed relationally so Catalyst owns
  * the plan:
  *
  *  - query-time scoring ([[score]]/[[search]]): ONE corpus scan. Tokens are
  *    filtered to the (broadcast-literal) query-term set map-side, BEFORE
  *    the explode, so the only wide exchange carries query-matched postings
  *    — at 100 TB the shuffle volume is O(matched postings), never
  *    O(corpus tokens). Document frequencies for the query terms and the
  *    (N, avgdl) corpus scalars come from the same matched-postings pass
  *    plus one scalar aggregate.
  *  - a persisted inverted index ([[buildIndex]]/[[searchIndex]]) for
  *    serving: postings parquet sorted by token so a term lookup prunes to
  *    the row groups containing the query terms (min/max pushdown), plus a
  *    (N, avgdl, df) sidecar so serving never rescans the corpus. This is
  *    the scale path: index once, serve many.
  *
  * Scoring is the standard Robertson/Sparck-Jones formulation:
  * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * `w(t,d) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`.
  * Tokenization matches [[TextFunctions.tokens]] (lowercased whitespace
  * split), so scores are oracle-checkable in ANSI SQL.
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  private def termSet(query: String): Seq[String] =
    query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** (id, term, tf, dl) for the query terms only: tokens filtered to the
    * term set map-side before the explode. */
  private def matchedPostings(docs: DataFrame, terms: Seq[String],
      textCol: String, idCol: String): DataFrame = {
    val termsLit = typedLit(terms)
    docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), size(col("toks")).as("dl"),
        filter(col("toks"), t => array_contains(termsLit, t)).as("mt"))
      .filter(size(col("mt")) > 0)
      .select(col("id"), col("dl"), explode(col("mt")).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"))
  }

  /** BM25 score per (id) for every document matching at least one query
    * term. Returns (id, score) — unrounded; callers slice top-k. */
  def score(docs: DataFrame, query: String, k1: Double = DefaultK1,
      b: Double = DefaultB, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val terms = termSet(query)
    require(terms.nonEmpty, "BM25 query must contain at least one term")
    val posts = matchedPostings(docs, terms, textCol, idCol)
    // corpus scalars: one aggregate over (id, dl) — broadcast as a 1-row
    // relation, never collected through the driver
    val stats = docs
      .select(size(TextFunctions.tokens(col(textCol))).as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    // per-term document frequency from the matched postings (each (id,term)
    // row is distinct, so df = row count per term) — a <=|terms|-row relation
    val dfs = posts.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    posts
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), (idf * tfNorm).as("w"))
      .groupBy("id").agg(sum("w").as("score"))
  }

  /** Top-k BM25 search: (id, score), score desc, id asc — the ordering is
    * a TakeOrdered (heap top-k per partition, never a full sort). */
  def search(docs: DataFrame, query: String, k: Int,
      k1: Double = DefaultK1, b: Double = DefaultB,
      textCol: String = "text", idCol: String = "doc_id",
      roundDecimals: Int = -1): DataFrame = {
    // round-then-rank (the repo-wide convention, see Knn/Bq): cutting on
    // the unrounded score would let a sub-1e-6 summation-order difference
    // flip rows across the top-k boundary vs an oracle ranking rounded
    // values — a nondeterministic hash flake waiting on a near-tie
    val sc = score(docs, query, k1, b, textCol, idCol)
    val ranked =
      if (roundDecimals >= 0) sc.withColumn("score", round(col("score"), roundDecimals))
      else sc
    ranked.orderBy(col("score").desc, col("id").asc).limit(k)
  }

  /** Persist an inverted index: `path/postings` = (token, id, tf, dl)
    * sorted by token (term lookups prune to the matching row groups via
    * parquet min/max), `path/df` = (token, df), `path/meta` = one row
    * (n_docs, avgdl). Index once, serve many — the corpus text is never
    * read again at query time. */
  def buildIndex(docs: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id", numFiles: Int = 0): Unit = {
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // pin the aggregated postings: three artifacts derive from them (the
    // postings file, df, and — via per-doc dl rows — meta), and without
    // the pin each write re-runs the full-corpus tokenize + (id, token)
    // aggregation, tripling the cost of the very step 'index once, serve
    // many' exists to amortize
    val posts = toks
      .select(col("id"), size(col("toks")).as("dl"), explode(col("toks")).as("token"))
      .groupBy("id", "token")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val spark = docs.sparkSession
      val files = if (numFiles > 0) numFiles
        else spark.sparkContext.defaultParallelism
      posts
        .repartitionByRange(files, col("token"))
        .sortWithinPartitions("token")
        .write.mode("overwrite").parquet(s"$path/postings")
      posts.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
        .write.mode("overwrite").parquet(s"$path/df")
      // corpus scalars from the pinned postings (one row per (id, token):
      // dl is constant per id, so per-doc dl = first(dl) grouped by id).
      // Token-less docs are absent here and were absent from the postings
      // too — n_docs counts docs that can ever score, consistent with df.
      posts.groupBy("id").agg(first("dl").as("dl"))
        .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
        .write.mode("overwrite").parquet(s"$path/meta")
    } finally posts.unpersist(blocking = false)
  }

  /** Top-k search against a [[buildIndex]] artifact: the postings scan
    * carries an `In(token, terms)` pushed filter against the token-sorted
    * files, df/meta are broadcast sidecars. */
  def searchIndex(spark: SparkSession, path: String, query: String, k: Int,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val terms = termSet(query)
    require(terms.nonEmpty, "BM25 query must contain at least one term")
    val posts = spark.read.parquet(s"$path/postings")
      .filter(col("token").isin(terms: _*))
    val dfs = spark.read.parquet(s"$path/df")
      .filter(col("token").isin(terms: _*))
    val stats = spark.read.parquet(s"$path/meta")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    posts
      .join(broadcast(dfs), "token")
      .crossJoin(broadcast(stats))
      .select(col("id"), (idf * tfNorm).as("w"))
      .groupBy("id").agg(sum("w").as("score"))
      .orderBy(col("score").desc, col("id").asc).limit(k)
  }
}
