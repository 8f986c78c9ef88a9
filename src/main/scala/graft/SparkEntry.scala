package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-domain modules in graft.queries;
  * every implemented SURVEY.md §2 operator has an entry here and (where
  * SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (VectorQueries.queries, VectorQueries.oracles),
      (IvfQueries.queries, IvfQueries.oracles),
      (AggQueries.queries, AggQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (AnnQueries.queries, AnnQueries.oracles),
      (StoreQueries.queries, StoreQueries.oracles),
      (CurationQueries.queries, CurationQueries.oracles),
      (MultimodalQueries.queries, MultimodalQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_cosine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
