package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class TuningSpec extends AnyFunSuite {
  test("ef suggestion scales with corpus size, floored sensibly") {
    assert(Tuning.suggestEf(100, 10) == 50)
    assert(Tuning.suggestEf(1000000, 10) >= 100)
    assert(Tuning.suggestEf(100, 40) == 80)
  }
  test("n_probe bounded by cluster count and recall target") {
    assert(Tuning.suggestNProbe(256, 100000) >= 16)
    assert(Tuning.suggestNProbe(256, 100000, targetRecall = 0.99) >= 64)
    assert(Tuning.suggestNProbe(4, 100) <= 4)
  }
  test("cluster count ~ sqrt(N), clamped") {
    assert(Tuning.suggestNClusters(100) == 10)
    assert(Tuning.suggestNClusters(1000000) == 1000)
    assert(Tuning.suggestNClusters(1) == 4)
  }
  test("oversample ~ 1/selectivity, floored at the reference x3, capped") {
    assert(Tuning.suggestOversample(1.0) == 3)     // unselective: reference default
    assert(Tuning.suggestOversample(0.5) == 3)
    assert(Tuning.suggestOversample(0.1) == 15)    // 10% keep -> 1.5/0.1
    assert(Tuning.suggestOversample(0.01) == 100)  // capped
    assert(Tuning.suggestOversample(0.0) == 100)   // unknown/zero: worst case
    assert(Tuning.suggestOversample(0.001, cap = 500) == 500)
    intercept[IllegalArgumentException](Tuning.suggestOversample(0.5, cap = 2))
  }

  test("reference QueryOptimizer step function, bit-exact") {
    // search_integration.rs:395-421: the literal thresholds a migrating
    // caller may want unchanged — boundaries included
    assert(Tuning.referenceSuggestions(0L) == ((5, 50)))
    assert(Tuning.referenceSuggestions(999L) == ((5, 50)))
    assert(Tuning.referenceSuggestions(1000L) == ((10, 100)))
    assert(Tuning.referenceSuggestions(9999L) == ((10, 100)))
    assert(Tuning.referenceSuggestions(10000L) == ((20, 200)))
    assert(Tuning.referenceSuggestions(100000000L) == ((20, 200)))
    // suggest_config's by-k steps (search_integration.rs:418-448), with
    // empty tiers disabled in the same call
    assert(Tuning.referenceConfigForK(9, 1, 1) == ((5, 50, true, true)))
    assert(Tuning.referenceConfigForK(10, 1, 1) == ((10, 100, true, true)))
    assert(Tuning.referenceConfigForK(49, 1, 1) == ((10, 100, true, true)))
    assert(Tuning.referenceConfigForK(50, 1, 0) == ((20, 200, true, false)))
    assert(Tuning.referenceConfigForK(100, 0, 5) == ((20, 200, false, true)))
  }

  test("empty tiers are skipped") {
    assert(Tuning.tiersToSearch(0, 10) == Seq("historical"))
    assert(Tuning.tiersToSearch(5, 0) == Seq("recent"))
    assert(Tuning.tiersToSearch(0, 0).isEmpty)
  }

  test("LSH band planner hits the S-curve threshold under the hash budget") {
    // the repo's own dedup defaults: 8 hashes at ~0.3 -> 4 bands x 2 rows
    // ((1/4)^(1/2) = 0.5 is the closest achievable cut from 8 hashes
    // among b*r <= 8 shapes biased toward recall)
    val (b, r) = Tuning.suggestLshBands(0.5, 8)
    assert(b * r <= 8 && math.abs(math.pow(1.0 / b, 1.0 / r) - 0.5) < 0.01)
    // a high threshold wants long bands (few, selective)
    val (bHi, rHi) = Tuning.suggestLshBands(0.9, 128)
    assert(math.pow(1.0 / bHi, 1.0 / rHi) > 0.75 && bHi * rHi <= 128)
    // a low threshold wants many short bands (recall-heavy)
    val (bLo, rLo) = Tuning.suggestLshBands(0.2, 128)
    assert(math.pow(1.0 / bLo, 1.0 / rLo) < 0.4 && bLo >= bHi)
    // the curve audit: more similar pairs always collide more often
    val p1 = Tuning.lshCollisionProb(0.3, bHi, rHi)
    val p2 = Tuning.lshCollisionProb(0.95, bHi, rHi)
    assert(p2 > p1 && p2 > 0.5)
    intercept[IllegalArgumentException](Tuning.suggestLshBands(1.0, 8))
    intercept[IllegalArgumentException](Tuning.suggestLshBands(0.5, 1))
  }

  test("graph block planner: clusters scale with N, pair work linear in N") {
    val (k1, w1) = Tuning.suggestGraphBlocks(100000L)
    val (k10, w10) = Tuning.suggestGraphBlocks(1000000L)
    assert(k1 == 100 && k10 == 1000)          // clusters ∝ N at fixed block
    assert(math.abs(w10 / w1 - 10.0) < 1e-9)  // pair work linear in N
    // multi-probe multiplies estimated work by p, not by block size
    val (_, wp) = Tuning.suggestGraphBlocks(100000L, probes = 3)
    assert(math.abs(wp / w1 - 3.0) < 1e-9)
    // the 100 TB posture: a multi-trillion-row corpus must clamp, never
    // Int-wrap into a 1-cluster (full N^2) recommendation
    val (kHuge, _) = Tuning.suggestGraphBlocks(2_200_000_000_000L)
    assert(kHuge == Int.MaxValue)
    intercept[IllegalArgumentException](Tuning.suggestGraphBlocks(0L))
    intercept[IllegalArgumentException](
      Tuning.suggestGraphBlocks(1000L, skewFactor = 0.5))
  }
}
