package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("nearest prior row per key, null before first right row") {
    val left = Seq(
      (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(5), "c"),
      (2L, ts(10), "d")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(8), 100.0), (1L, ts(15), 200.0), (3L, ts(1), 999.0)
    ).toDF("k", "t", "v")
    val r = AsOfJoin.nearestPrior(left, right, "k", "t")
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(r("a") == Some(100.0)) // t=10 -> right t=8
    assert(r("b") == Some(200.0)) // t=20 -> right t=15
    assert(r("c") == None) // t=5 before first right row
    assert(r("d") == None) // key 2 has no right rows
  }

  test("equal timestamps match (<= semantics) and tolerance bounds staleness") {
    val left = Seq((1L, ts(8), "x"), (1L, ts(100), "y")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(8), 7.0)).toDF("k", "t", "v")
    val exact = AsOfJoin.nearestPrior(left, right, "k", "t")
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(exact("x") == Some(7.0)) // same-second match
    val bounded = AsOfJoin.nearestPrior(left, right, "k", "t", tolerance = Some(30))
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(bounded("x") == Some(7.0))
    assert(bounded("y") == None) // 92s stale > 30s tolerance
  }
}
