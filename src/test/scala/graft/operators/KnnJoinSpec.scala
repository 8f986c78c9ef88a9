package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-NN graph construction: exact all-pairs ground truth on a hand-checked
  * fixture, blocked == exact within blocks, and the quadratic guard. */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  // four 2-d points on a line: 0 @ x=0, 1 @ x=1, 2 @ x=3, 3 @ x=10, plus a
  // block column splitting {0,1} / {2,3}. Cosine of same-direction 2-d
  // vectors with a fixed second coordinate orders by angle — use distinct
  // directions instead for unambiguous cosine ranking.
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(0.1f, 0.9f), 1)
  ).toDF("id", "embedding", "blk")

  test("exact: nearest neighbor is the closest direction, ranks deterministic") {
    val g = KnnJoin.exact(vecs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSet // (id, rank, neighbor)
    // id 0 (1,0): nearest 1 (0.9,0.1), then 3 is (0.1,0.9) vs 2 (0,1):
    // cos(0,3) = .1/sqrt(.82) ≈ .110, cos(0,2) = 0 → rank2 = 3
    assert(g.contains((0L, 1L, 1L)))
    assert(g.contains((0L, 2L, 3L)))
    // id 2 (0,1): nearest 3 (0.1,0.9), then 1 (0.9,0.1) beats 0 (1,0)
    assert(g.contains((2L, 1L, 3L)))
    assert(g.contains((2L, 2L, 1L)))
  }

  test("exact emits exactly k rows per id, rank 1..k, cosine non-increasing") {
    val g = KnnJoin.exact(vecs, k = 3)
    val perId = g.groupBy("id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi")).collect()
    assert(perId.length == 4)
    perId.foreach { r =>
      assert(r.getLong(1) == 3 && r.getLong(2) == 1L && r.getLong(3) == 3L)
    }
    // within each id, cosine must be non-increasing in rank
    val bad = g.as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).values.flatMap { rows =>
        val sorted = rows.sortBy(_._3)
        sorted.zip(sorted.tail).filter { case (a, b) => a._4 < b._4 }
      }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("blocked equals exact restricted to the block") {
    val blocked = KnnJoin.blocked(vecs, k = 1, blockCol = "blk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // within block {0,1} each is the other's only neighbor; same for {2,3}
    assert(blocked == Map(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 2L))
  }

  test("graphRecall: 1.0 under a coherent blocking, degraded under a bad one") {
    // two tight direction bundles; blk groups them coherently, badblk
    // splits each bundle across blocks
    val bundles = Seq(
      (0L, Array(1.0f, 0.00f), 0, 0), (1L, Array(1.0f, 0.01f), 0, 1),
      (2L, Array(1.0f, 0.02f), 0, 0), (3L, Array(0.0f, 1.00f), 1, 1),
      (4L, Array(0.01f, 1.0f), 1, 0), (5L, Array(0.02f, 1.0f), 1, 1)
    ).toDF("id", "embedding", "blk", "badblk")
    val exact = KnnJoin.exact(bundles, k = 2)
    val good = KnnJoin.graphRecall(exact, KnnJoin.blocked(bundles, k = 2, blockCol = "blk"))
      .agg(avg("recall")).head().getDouble(0)
    assert(good == 1.0, s"coherent blocking should recover the full graph, got $good")
    val bad = KnnJoin.graphRecall(exact, KnnJoin.blocked(bundles, k = 2, blockCol = "badblk"))
      .agg(avg("recall")).head().getDouble(0)
    assert(bad < 0.7, s"incoherent blocking must show degraded recall, got $bad")
  }

  test("multi-probe rescues a neighbor pair stranded across a block boundary") {
    // b and c are each other's true nearest but fall on opposite sides of
    // the c0/c1 boundary; a and d anchor the two clusters
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // a -> c0
      (1L, Array(0.72f, 0.70f)), // b -> c0 (barely)
      (2L, Array(0.70f, 0.72f)), // c -> c1 (barely)
      (3L, Array(0.0f, 1.0f))    // d -> c1
    ).toDF("id", "embedding")
    def top1(p: Int): Map[Long, Long] =
      KnnJoin.blockedMultiProbe(vecs, k = 1, centroids = cents, p = p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = top1(1)
    // p=1: c's block only holds d, so its best neighbor is wrong
    assert(single(2L) == 3L && single(1L) == 0L)
    val multi = top1(2)
    // p=2: b and c share a probe; the true pair surfaces for both
    assert(multi(2L) == 1L && multi(1L) == 2L)
    // and multi-probe recall over the exact graph strictly improves
    val exact = KnnJoin.exact(vecs, k = 1)
    def rec(m: org.apache.spark.sql.DataFrame): Double =
      KnnJoin.graphRecall(exact, m).agg(avg("recall")).head().getDouble(0)
    assert(rec(KnnJoin.blockedMultiProbe(vecs, 1, cents, 2)) >
      rec(KnnJoin.blockedMultiProbe(vecs, 1, cents, 1)))
  }

  test("exact refuses an over-limit corpus loudly") {
    val e = intercept[IllegalArgumentException] {
      KnnJoin.exact(vecs, k = 2, maxRows = 3)
    }
    assert(e.getMessage.contains("blocked"))
  }

  test("exact's broadcast guard is byte-aware: few rows x high dim trips it") {
    // 4 rows passes any sane row gate, but at dim=4096 the payload is
    // rows x dim x 4 bytes — a tight byte budget must refuse it while the
    // same corpus under a generous budget runs fine
    val wide = (0 until 4).map(i =>
      (s"w$i", Array.tabulate(4096)(j => (i + j % 7).toFloat)))
      .toDF("id", "embedding")
    val e = intercept[IllegalArgumentException] {
      KnnJoin.exact(wide, k = 1, maxBroadcastBytes = 16L << 10)
    }
    assert(e.getMessage.contains("maxBroadcastBytes"))
    assert(KnnJoin.exact(wide, k = 1).count() == 4)
  }
}
