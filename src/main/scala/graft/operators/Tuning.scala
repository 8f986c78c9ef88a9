package graft.operators

/** Adaptive search-parameter heuristics (SURVEY.md §4 "QueryOptimizer",
  * `/root/reference/src/hybrid/search_integration.rs:375-449`): suggest
  * ef / n_probe from corpus statistics. Driver-side pure functions — Spark's
  * AQE owns runtime plan adaptivity; these own the ANN quality knobs.
  */
object Tuning {

  /** ef grows with log of corpus size, floored at k and the default 50. */
  def suggestEf(corpusSize: Long, k: Int): Int = {
    val base = math.max(50, k * 2)
    val scaled = (math.log10(math.max(corpusSize, 10).toDouble) * 20).toInt
    math.max(base, scaled)
  }

  /** n_probe: ~sqrt share of clusters, bounded [1, nClusters]; more probes
    * for small corpora (probing is cheap when each inverted list is short —
    * under ~1K rows per cluster the whole scan costs less than a recall
    * miss) and for high-recall regimes. */
  def suggestNProbe(nClusters: Int, corpusSize: Long, targetRecall: Double = 0.9): Int = {
    val frac = if (targetRecall >= 0.99) 0.5 else if (targetRecall >= 0.9) 0.25 else 0.1
    val bySqrt = math.ceil(math.sqrt(nClusters.toDouble)).toInt
    val byFrac = math.ceil(nClusters * frac).toInt
    // small corpora: rows-per-cluster under ~1K makes probing nearly free,
    // so lean on recall — double the probe budget
    val smallBoost = if (corpusSize > 0 && corpusSize / nClusters < 1000) 2 else 1
    math.min(nClusters, math.max(1, math.max(bySqrt, byFrac) * smallBoost))
  }

  /** Cluster count: ~sqrt(N), clamped to [4, 65536] (the IVF rule of
    * thumb; the reference fixes 256 at any size). */
  def suggestNClusters(corpusSize: Long): Int =
    math.min(65536, math.max(4, math.ceil(math.sqrt(corpusSize.toDouble)).toInt))

  /** The reference QueryOptimizer's LITERAL (n_probe, ef) suggestions
    * (`search_integration.rs:395-421`): a step function of total corpus
    * size — <1000 → (5, 50), <10000 → (10, 100), else (20, 200).
    * [[suggestEf]]/[[suggestNProbe]] are this repo's better-argued
    * continuous curves; this is the bit-exact knob source for a migrating
    * caller that wants the reference's numbers unchanged. */
  def referenceSuggestions(totalVectors: Long): (Int, Int) =
    if (totalVectors < 1000) (5, 50)
    else if (totalVectors < 10000) (10, 100)
    else (20, 200)

  /** The reference QueryOptimizer's `suggest_config` step function BY K
    * (`search_integration.rs:418-448`): (ivf_n_probe, hnsw_ef,
    * search_recent, search_historical) — probe depth steps on the
    * requested k, and an empty tier is disabled outright (its
    * `stats.recent_vectors == 0` branches), which is [[tiersToSearch]]
    * folded into the same call. Bit-exact for migrating callers. */
  def referenceConfigForK(k: Int, recentCount: Long,
      historicalCount: Long): (Int, Int, Boolean, Boolean) = {
    val (nProbe, ef) =
      if (k < 10) (5, 50) else if (k < 50) (10, 100) else (20, 200)
    (nProbe, ef, recentCount > 0, historicalCount > 0)
  }

  /** Per-tier disable when empty (search_integration.rs: skip empty index). */
  def tiersToSearch(recentCount: Long, historicalCount: Long): Seq[String] =
    (if (recentCount > 0) Seq("recent") else Nil) ++
      (if (historicalCount > 0) Seq("historical") else Nil)

  /** Oversample factor for post-filtered (code-tier / saved-HNSW) search:
    * ~1/selectivity so the k×oversample candidate pool is expected to hold
    * ≥ k matching rows, floored at the reference's fixed ×3
    * (`hybrid/core.rs:513-549`) and capped to keep the rerank bounded.
    * `selectivity` = fraction of rows the filter keeps (estimate from a
    * sample or sidecar stats). */
  def suggestOversample(selectivity: Double, cap: Int = 100): Int = {
    require(cap >= 3, s"cap $cap below the minimum oversample of 3")
    if (selectivity <= 0.0) cap
    else math.min(cap, math.max(3, math.ceil(1.5 / selectivity).toInt))
  }

  /** LSH banding plan for a target Jaccard threshold under a signature
    * budget: choose (bands, rowsPerBand) with bands*rows <= numHashes
    * whose S-curve threshold (1/b)^(1/r) — the similarity at which the
    * collision probability 1-(1-s^r)^b crosses ~50% — sits closest to the
    * requested cut. Breaks ties toward MORE bands (higher recall at the
    * threshold, the usual dedup preference: missed dups are permanent,
    * false candidates just cost a verify). */
  def suggestLshBands(threshold: Double, numHashes: Int): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    require(numHashes >= 2, s"need at least 2 hashes, got $numHashes")
    val options = for {
      r <- 1 to numHashes
      b = numHashes / r
      if b >= 1
    } yield (b, r)
    options.minBy { case (b, r) =>
      (math.abs(math.pow(1.0 / b, 1.0 / r) - threshold), -b)
    }
  }

  /** Expected LSH candidate-collision probability at similarity s for a
    * (bands, rowsPerBand) plan: 1 - (1 - s^r)^b — the S-curve itself, for
    * callers that want to audit a plan before paying for a corpus pass. */
  def lshCollisionProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Block plan for a k-NN GRAPH build ([[KnnJoin.blocked]]): cluster
    * count + estimated pair work. The sizing rule is the opposite of
    * probed search's sqrt(N) clusters: the graph build must keep BLOCK
    * SIZE fixed (clusters ∝ N), which makes total pair work
    * N x targetBlock x probes — linear in N (SCALING.md measures it).
    * `skewFactor` is E[block²]/E[block]² of the clustering (1.0 =
    * perfectly balanced; IVF-trained blocks typically land 1.5-3 — cap
    * the largest clusters via rebalance when it drifts higher, since the
    * biggest block dominates both total work and the worst task). */
  def suggestGraphBlocks(corpusSize: Long, targetBlock: Int = 1000,
      probes: Int = 1, skewFactor: Double = 2.0): (Int, Double) = {
    require(corpusSize > 0 && targetBlock > 0 && probes >= 1 && skewFactor >= 1.0,
      s"bad graph-block plan args: n=$corpusSize block=$targetBlock " +
        s"p=$probes skew=$skewFactor")
    // Long math first, clamp last: corpusSize/targetBlock exceeds Int range
    // exactly at the corpus sizes this planner exists for, and a silent
    // wrap would recommend ONE block (full N² work) with no signal
    val nClusters = math.min(math.max(1L, corpusSize / targetBlock),
      Int.MaxValue.toLong).toInt
    val estPairs = corpusSize.toDouble * targetBlock * skewFactor * probes
    (nClusters, estPairs)
  }
}
