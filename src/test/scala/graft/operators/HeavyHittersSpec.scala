package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-pass exact heavy hitters: the Misra-Gries guarantee (no true heavy
  * hitter evicted), two-phase partial/merge correctness across shuffled
  * partitions, and the exact recount against a plain groupBy baseline. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact() matches the full-groupBy baseline on a skewed stream") {
    // zipf-ish: item i appears ~ 4000/i times, i = 1..60, deterministic
    val rows = (1 to 60).flatMap(i => Seq.fill(4000 / i)(s"item$i"))
    val df = spark.createDataset(
      new scala.util.Random(7).shuffle(rows)).toDF("item").repartition(13)
    val got = HeavyHitters.exact(df, "item", denominator = 50L, sketchK = 128)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.size.toLong
    val minCount = math.ceil(n.toDouble / 50).toLong
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toSeq
      .sortBy { case (item, c) => (-c, item) }
    assert(got.toSeq == want)
    // counts are EXACT, not MG lower bounds
    assert(got.head == (("item1", 4000L)))
  }

  test("MG guarantee: a just-above-threshold item survives adversarial noise") {
    // one item at exactly threshold mass among max-cardinality noise (the
    // decrement-heavy worst case for MG), spread across many partitions
    val heavy = Seq.fill(400)("needle")
    val noise = (1 to 19600).map(i => s"noise$i") // all distinct
    val df = spark.createDataset(
      new scala.util.Random(11).shuffle(heavy ++ noise)).toDF("item")
      .repartition(17)
    // threshold = ceil(20000/50) = 400 = the needle's exact count
    val got = HeavyHitters.exact(df, "item", denominator = 50L, sketchK = 128)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("needle", 400L)))
  }

  test("guarantee precondition is checked; empty input yields empty output") {
    val df = Seq("a", "b").toDF("item")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, "item", denominator = 100L, sketchK = 50)
    }
    assert(e.getMessage.contains("does not cover"))
    val empty = spark.createDataset(Seq.empty[String]).toDF("item")
    assert(HeavyHitters.exact(empty, "item", denominator = 10L).count() == 0L)
  }

  test("exactPerGroup: per-group thresholds, matches per-group baselines") {
    // group A: skewed with a clear heavy hitter; group B: uniform with
    // NO heavy hitter at the threshold; thresholds must not cross groups
    val a = Seq.fill(300)("hot") ++ (1 to 700).map(i => s"a$i")
    val b = (1 to 1000).flatMap(i => Seq(s"b$i"))
    val df = (a.map(("A", _)) ++ b.map(("B", _)))
    val shuffled = new scala.util.Random(5).shuffle(df)
    val items = spark.createDataset(shuffled).toDF("src", "item").repartition(9)
    val got = HeavyHitters.exactPerGroup(items, "src", "item",
        denominator = 10L, sketchK = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // A's threshold = ceil(1000/10) = 100; only "hot" (300) clears it.
    // B's threshold = 100; every item counts 1 — nothing clears it.
    assert(got.toSeq == Seq(("A", "hot", 300L)))
  }

  test("fuzz: MG bound holds on 20 random streams at varied k and skew") {
    // Theoretical contract under the two-phase merge: every stored count
    // underestimates the truth by at most N/(k+1), and any item with
    // true count > N/(k+1) is present. 20 seeded random streams across
    // skew shapes x k — a merge-rule bug (wrong cut rank, bad pointwise
    // add) breaks one of these within a few streams.
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val k = Seq(4, 16, 64)(seed % 3)
      val vocab = 1 + rnd.nextInt(400)
      // zipf-ish skew exponent varies: near-uniform to heavily skewed
      val stream = Seq.fill(2000 + rnd.nextInt(3000)) {
        val r = math.pow(rnd.nextDouble(), 1.0 + (seed % 4)) // skew dial
        s"w${(r * vocab).toInt}"
      }
      val n = stream.size.toLong
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val parts = 1 + rnd.nextInt(16)
      val cand = spark.createDataset(stream).toDF("item").repartition(parts)
        .agg(HeavyHitters.mgCandidates(k)(col("item")).as("c"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cand.size <= k, s"seed=$seed: ${cand.size} > k=$k")
      val bound = n.toDouble / (k + 1)
      cand.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t && est >= t - bound - 1,
          s"seed=$seed item=$item est=$est truth=$t bound=$bound")
      }
      truth.foreach { case (item, t) =>
        if (t > bound)
          assert(cand.contains(item),
            s"seed=$seed: heavy item $item (count $t > $bound) evicted")
      }
    }
  }

  test("exactPerGroup recount joins the candidate relation by broadcast") {
    val df = (1 to 2000).map(i => ("S", s"i${i % 40}")).toSeq
    val items = spark.createDataset(df).toDF("src", "item").repartition(5)
    val out = HeavyHitters.exactPerGroup(items, "src", "item",
      denominator = 50L, sketchK = 128)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("exactPerGroup falls back to a shuffle join past the candidate cap") {
    // same data through both recount plans: the threshold is measured
    // (candidate rows counted), not guessed, so forcing the cap to 1
    // exercises the non-broadcast plan — results must be identical and
    // the plan must NOT carry a broadcast of the candidate relation
    // 3 groups x 50 items, exactly 20 occurrences per (group, item) pair;
    // a skewed extra run of "hot" in g0 gives each group's threshold bite
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"i${i % 50}")).toSeq ++
      Seq.fill(100)(("g0", "hot"))
    val items = spark.createDataset(df).toDF("src", "item").repartition(7)
    val viaBroadcast = HeavyHitters.exactPerGroup(items, "src", "item",
      denominator = 12L, sketchK = 128)
    val viaShuffle = HeavyHitters.exactPerGroup(items, "src", "item",
      denominator = 12L, sketchK = 128, broadcastMaxCandidates = 1)
    val a = viaBroadcast.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val b = viaShuffle.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(a == b && a.nonEmpty)
    // the switch is about the HINT (AQE may still broadcast a tiny test
    // relation at runtime on its own statistics — that's fine): past the
    // cap the candidate side must carry no broadcast hint, under it one
    assert(!viaShuffle.queryExecution.analyzed.toString.contains("ResolvedHint"),
      viaShuffle.queryExecution.analyzed.toString)
    assert(viaBroadcast.queryExecution.analyzed.toString.contains("ResolvedHint"),
      viaBroadcast.queryExecution.analyzed.toString)
  }

  test("mgCandidates is bounded by k and carries lower-bound counts") {
    val rows = Seq.fill(500)("hot") ++ (1 to 2000).map(i => s"cold$i")
    val df = spark.createDataset(new scala.util.Random(3).shuffle(rows))
      .toDF("item").repartition(7)
    val cand = df.agg(HeavyHitters.mgCandidates(16)(col("item")).as("c"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(cand.size <= 16)
    val hot = cand.find(_.getString(0) == "hot")
    assert(hot.isDefined, "true heavy hitter evicted from the MG summary")
    // MG count is a LOWER bound on the true count
    assert(hot.get.getLong(1) <= 500L && hot.get.getLong(1) > 0L)
  }
}
