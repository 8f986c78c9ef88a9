package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Grouped top-k: native TypedImperativeAggregate vs udaf Aggregator vs
  * window ground truth (FIXTURES.md §6 top-k invariants).
  */
class TopKSpec extends SparkSpec {

  private lazy val scored = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 50000).map { i =>
      (i % 8L, i.toLong, math.rint(rnd.nextDouble() * 1e6) / 1e6)
    }.toDF("g", "id", "dist").cache()
  }

  private def groundTruth(k: Int): Map[(Long, Long), Double] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("dist").asc, col("id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  private def viaAgg(fn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column, k: Int): Map[(Long, Long), Double] =
    scored.groupBy("g").agg(fn(col("id"), col("dist")).as("hits"))
      .select(col("g"), explode(col("hits")).as("h"))
      .collect().map(r => (r.getLong(0), r.getStruct(1).getLong(0)) -> r.getStruct(1).getDouble(1)).toMap

  test("native imperative top-k matches window ground truth") {
    val gt = groundTruth(10)
    val got = viaAgg(TopK.topK(10), 10)
    assert(got == gt)
  }

  test("typed Aggregator top-k matches too") {
    val gt = groundTruth(10)
    val got = viaAgg(TopK.topKTyped(10), 10)
    assert(got == gt)
  }

  test("string-id top-k matches window ground truth (serde across the shuffle)") {
    // same 50K rows, string ids with zero-padding so lexicographic ties
    // match the long ordering exactly; 8 groups * many partitions forces
    // partial-buffer serialize/deserialize/merge through the exchange
    val sScored = scored.select(col("g"), format_string("id%07d", col("id")).as("id"), col("dist"))
    val gt = groundTruth(10).map { case ((g, id), d) => (g, f"id$id%07d") -> d }
    val got = sScored.groupBy("g").agg(TopK.topKStr(10)(col("id"), col("dist")).as("hits"))
      .select(col("g"), explode(col("hits")).as("h"))
      .collect().map(r => (r.getLong(0), r.getStruct(1).getString(0)) -> r.getStruct(1).getDouble(1)).toMap
    assert(got == gt)
  }

  test("string-id top-k: ties break lexicographically, nulls skipped") {
    import spark.implicits._
    val df = Seq(
      (1L, "b", 0.5), (1L, "a", 0.5), (1L, null, 0.1), (1L, "c", 0.2)
    ).toDF("g", "id", "dist")
    val hits = df.groupBy("g").agg(TopK.topKStr(2)(col("id"), col("dist")).as("hits"))
      .select(explode(col("hits")).as("h")).collect()
      .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getDouble(1)))
    assert(hits.toSeq == Seq(("c", 0.2), ("a", 0.5)))
  }

  test("k larger than group size returns whole group sorted") {
    import spark.implicits._
    val small = Seq((1L, 10L, 0.3), (1L, 11L, 0.1), (1L, 12L, 0.2)).toDF("g", "id", "dist")
    val hits = small.groupBy("g").agg(TopK.topK(10)(col("id"), col("dist")).as("hits"))
      .select(explode(col("hits")).as("h")).collect()
      .map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getDouble(1)))
    assert(hits.toSeq == Seq((11L, 0.1), (12L, 0.2), (10L, 0.3)))
  }
}
