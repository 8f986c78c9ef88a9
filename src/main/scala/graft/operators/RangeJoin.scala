package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval-containment) join — the operator Spark
  * itself has no good plan for: `points.join(intervals, pt BETWEEN lo AND
  * hi)` is a pure theta-join, which Catalyst can only execute as a
  * BroadcastNestedLoopJoin (every point × every interval — quadratic, and
  * a broadcast of a side that may not fit) or a CartesianProduct. The
  * standard fix (used by time-series joins everywhere): discretize the
  * domain into width-`bucketWidth` buckets, explode each interval to the
  * buckets it covers, bucket each point once, EQUI-join on the bucket key,
  * and re-check the exact predicate. The shuffle is then hash-partitioned
  * on the bucket — ordinary, skew-tolerant, AQE-planable — and each
  * point meets only the intervals overlapping its bucket.
  *
  * Matches are emitted exactly once (a point lives in exactly one bucket;
  * the interval's explosion covers that bucket at most once), so no
  * distinct pass is needed. Choose `bucketWidth` near the typical interval
  * length: cost scales with points × intervals-per-bucket, and an interval
  * explodes to ~(len/bucketWidth + 1) rows — the classic space/selectivity
  * dial. Column sets of the two sides must be disjoint (standard join
  * hygiene; rename upstream).
  */
object RangeJoin {

  /** Inner interval-containment join: rows of `points` paired with every
    * row of `intervals` whose [loCol, hiCol] (inclusive both ends)
    * contains ptCol. All three columns must be integral (epoch seconds,
    * positions, offsets — cast upstream). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"point/interval column sets must be disjoint, both have: $shared")
    val p = points.withColumn("_bkt", floor(col(ptCol) / bucketWidth))
    val i = intervals.withColumn("_bkt",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    p.join(i, Seq("_bkt"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bkt")
  }
}
