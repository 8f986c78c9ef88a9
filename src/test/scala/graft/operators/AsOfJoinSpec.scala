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

  test("the nearest right row is carried WHOLE: no cross-row value stitching") {
    import spark.implicits._
    // nearest-prior right row (t=5) has price=null, qty=3; a per-column
    // carry would resurrect price=5.0 from the OLDER t=1 row — a row that
    // never existed. The whole-row contract returns (null, 3).
    val left = Seq((1L, ts(10), "a")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(1), Some(5.0), 2L), (1L, ts(5), Option.empty[Double], 3L)
    ).toDF("k", "t", "price", "qty")
    val r = AsOfJoin.nearestPrior(left, right, "k", "t").head()
    assert(r.isNullAt(r.fieldIndex("price")), r.toString)
    assert(r.getLong(r.fieldIndex("qty")) == 3L, r.toString)
  }

  test("tolerance works on NUMERIC (epoch) ts columns, not just timestamps") {
    import spark.implicits._
    val left = Seq((1L, 1000L, "x"), (1L, 2000L, "y")).toDF("k", "t", "tag")
    val right = Seq((1L, 990L, 7.0)).toDF("k", "t", "v")
    val bounded = AsOfJoin.nearestPrior(left, right, "k", "t", tolerance = Some(30))
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    // 10s stale passes; 1010s stale must be nulled — unix_timestamp() on
    // a LONG column would null-parse and silently void this bound
    assert(bounded("x") == Some(7.0) && bounded("y") == None, bounded.toString)
  }

  test("tolerance on a STRING ts column is rejected loudly (fail-open guard)") {
    import spark.implicits._
    // a string ts casts to null, which would silently VOID the staleness
    // bound (null > t falls through to keep-the-value) — the dtype gate
    // must throw instead; without a tolerance strings still order fine
    val left = Seq((1L, "2026-01-02", "x")).toDF("k", "t", "tag")
    val right = Seq((1L, "2026-01-01", 7.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nearestPrior(left, right, "k", "t", tolerance = Some(30))
    }
    assert(e.getMessage.contains("numeric or timestamp"))
    val unbounded = AsOfJoin.nearestPrior(left, right, "k", "t")
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(unbounded("x") == Some(7.0))
  }
}
