package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational demo queries over the TPC-H-ish testdata: scan/filter/agg/join
  * building blocks the engine composes its vector pipelines from
  * (SURVEY.md §2.3 J2, §2.4).
  *
  * All float aggregates are rounded on BOTH the Spark and the DuckDB oracle
  * side so summation-order FP noise cannot flip the hash compare.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // J2-style enrichment join: results <- metadata (broadcast-hash on the
    // small side; `customer` is the dim table).
    "q2_join_enrich" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
      val nation = Tables.load(s, dir, "nation")
      orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .groupBy("n_name", "c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name", "c_mktsegment")
    }))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_join_enrich" ->
      """SELECT n_name, c_mktsegment,
        |  round(sum(o_totalprice), 2) AS total_price, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
