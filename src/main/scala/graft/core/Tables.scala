package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read one
  * parquet per table. At cluster scale these would be partitioned table
  * paths; the API shape (dir + name) is the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as TIMESTAMP(NANOS) parquet (which Spark
      // refuses by default — read the raw int64 nanos and convert; integer
      // division because epoch-nanos overflow double precision) and, since
      // the 2026-08-13 regeneration, as TIMESTAMP(MICROS) (which Spark
      // reads natively as TIMESTAMP_NTZ). Handle both by inspecting the
      // loaded type; the NTZ cast is wall-clock-identical under the
      // session's UTC timezone, matching what DuckDB reads for the oracle.
      //
      // The nanosAsLong flag is session-global and is consulted at SCAN
      // planning, so it cannot be safely set/restored around this lazy
      // read (a later action would re-plan under the restored value).
      // DOCUMENTED TRADE-OFF: after the first events load, any other
      // TIMESTAMP(NANOS) parquet read in the session also surfaces as
      // long nanos instead of failing fast. No other repo table or store
      // artifact writes NANOS, so within this engine the flag is inert —
      // but it is deliberate session state, not an accident; applications
      // embedding the library alongside their own NANOS data should set
      // the flag themselves at session build and own the convention.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
