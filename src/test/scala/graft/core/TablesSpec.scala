package graft.core

import graft.SparkSpec

/** Pins the driver-data contract: every table loads at every SF with its
  * load-bearing columns and types. The testdata is driver-owned and has
  * been regenerated between rounds with schema drift (events.ts shipped
  * as TIMESTAMP(NANOS)-as-int64, then TIMESTAMP(MICROS)); this spec is
  * the early-warning tripwire — if it fails at round start, fix
  * [[Tables.load]]'s dispatch before debugging 80 downstream queries. */
class TablesSpec extends SparkSpec {

  private val expected: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey"),
    "part" -> Set("p_partkey", "p_name"),
    "orders" -> Set("o_orderkey", "o_custkey"),
    "lineitem" -> Set("l_orderkey", "l_quantity", "l_returnflag"),
    "events" -> Set("event_type", "value", "ts", "user_id"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"all tables load at $sf with their load-bearing columns") {
      for ((name, cols) <- expected) {
        val df = Tables.load(spark, s"/root/testdata/$sf", name)
        val missing = cols -- df.columns.toSet
        assert(missing.isEmpty, s"$name at $sf missing: $missing")
        assert(df.limit(1).count() == 1, s"$name at $sf is empty")
      }
    }
  }

  test("events.ts is a timestamp regardless of the shipped parquet type") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType, df.schema("ts").dataType)
    // and it carries a sane epoch (not nanos-as-micros or similar drift):
    // every generated event lives between 2020 and 2100
    val bad = df.filter(
      org.apache.spark.sql.functions.year(org.apache.spark.sql.functions.col("ts"))
        .between(2020, 2100) === false)
    assert(bad.count() == 0, bad.take(3).mkString("; "))
  }

  test("embeddings carry float vectors of one consistent dimension per sf") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dims = df.select(size(col("embedding")).as("d")).distinct().collect()
      .map(_.getInt(0)).toSet
    assert(dims.size == 1 && dims.head > 0, s"dims: $dims")
  }
}
