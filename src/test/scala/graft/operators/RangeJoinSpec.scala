package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized range join: exact matches vs a brute-force reference,
  * inclusive bounds, cross-bucket intervals, single-emission, and the
  * no-nested-loop plan guarantee. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]) =
    (for {
      (pid, t) <- points
      (iid, lo, hi) <- ivs
      if t >= lo && t <= hi
    } yield (pid, iid)).toSet

  test("matches equal brute force; bounds inclusive; one row per match") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 100L), (4L, 1000L), (5L, 99L))
    // intervals spanning multiple buckets, touching bounds, and empty
    val ivs = Seq((10L, 0L, 10L), (20L, 5L, 250L), (30L, 999L, 2000L),
      (40L, 3000L, 3001L))
    for (w <- Seq(1L, 7L, 100L, 10000L)) {
      val got = RangeJoin.intervalJoin(
        points.toDF("pid", "t"), ivs.toDF("iid", "lo", "hi"),
        "t", "lo", "hi", bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate emission at width $w")
      assert(got.toSet == brute(points, ivs), s"wrong matches at width $w")
    }
  }

  test("plans an equi-join on the bucket, never a nested loop") {
    val p = spark.range(100).select(col("id").as("pid"), (col("id") * 13 % 997).as("t"))
    val i = spark.range(50).select(col("id").as("iid"),
      (col("id") * 20).as("lo"), (col("id") * 20 + 60).as("hi"))
    val plan = RangeJoin.intervalJoin(p, i, "t", "lo", "hi", 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    intercept[IllegalArgumentException](
      RangeJoin.intervalJoin(p, i, "t", "lo", "hi", 0))
    intercept[IllegalArgumentException](
      RangeJoin.intervalJoin(p, p.select(col("pid").as("x"), col("t")), "t", "x", "x", 1))
  }
}
