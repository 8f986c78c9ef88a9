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

  test("empty tiers are skipped") {
    assert(Tuning.tiersToSearch(0, 10) == Seq("historical"))
    assert(Tuning.tiersToSearch(5, 0) == Seq("recent"))
    assert(Tuning.tiersToSearch(0, 0).isEmpty)
  }
}
