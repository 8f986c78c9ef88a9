package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact fixed-bin histogram — the quantile face of the streaming
  * profiling family (Misra–Gries summarizes frequencies; this summarizes
  * the value distribution). The production latency-percentile pattern:
  * a FIXED binning whose per-bin counts are EXACT and merge by vector
  * addition, so the streaming fold is trivially exactly-once-checkable
  * (any dropped or double-applied batch shifts a count) and the whole
  * answer — counts AND interpolated quantile estimates — replays
  * bit-exactly in the oracle. Rank accounting is exact; only the VALUE
  * resolution is quantized (one bin width), and each estimate's bin
  * carries its exact rank interval, so the error story is explicit
  * rather than probabilistic.
  *
  * Why not a GK/percentile_approx fold: measured in this repo (r14),
  * Spark's catalyst `QuantileSummaries` saturates merged samples' deltas
  * at EXACTLY its compressImmut threshold (maxDelta -> 2eps*N), so a
  * long-lived per-batch fold either grows linearly (5,195 sampled tuples
  * after 30x400-row batches at eps=0.01 — half the stream retained) or,
  * recompressed at a larger budget, breaks the rank invariant (observed
  * 3eps*N query error). The sketch is fine one-shot (the batch
  * `sketch_quantiles` row keeps using percentile_approx); it is not a
  * foldable state.
  *
  * Cross-engine determinism: bin assignment and quantile interpolation
  * use only IEEE-exact double ops (subtract, divide, multiply, floor),
  * identical in Spark and DuckDB — no ln/log2 whose libm rounding could
  * drift a boundary value into the next bin.
  *
  * 100 TB posture: one map-side-combined groupBy over <= nBins+2 keys per
  * batch/partition, O(nBins) state, O(nBins) driver fold. */
object HistogramSketch {

  /** Equi-width binning of [lo, hi) into nBins bins, with explicit
    * underflow (v < lo, bin -1) and overflow (v >= hi, bin nBins). */
  case class HistogramSpec(lo: Double, hi: Double, nBins: Int) {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(java.lang.Double.isFinite(lo) && java.lang.Double.isFinite(hi),
      s"bounds must be finite, got [$lo, $hi)")
    val width: Double = (hi - lo) / nBins

    /** Bin index of a double column: -1 underflow, nBins overflow, else
      * floor((v - lo) / width) clamped to nBins-1 (the clamp absorbs the
      * one-ulp case where fp division lands an in-range v on nBins). */
    def binExpr(v: Column): Column =
      when(v < lo, lit(-1))
        .when(v >= hi, lit(nBins))
        .otherwise(least(floor((v - lit(lo)) / lit(width)).cast("int"),
          lit(nBins - 1)))

    /** The same assignment as [[binExpr]] for the DuckDB oracle —
      * generated from the one spec so the arithmetic cannot drift. */
    def binSql(v: String): String =
      s"CASE WHEN $v < $lo THEN -1 WHEN $v >= $hi THEN $nBins " +
        s"ELSE least(CAST(floor(($v - $lo) / (($hi - $lo) / $nBins)) " +
        s"AS INT), ${nBins - 1}) END"

    /** Driver-side bin of one value (the spec's unit-test face). NaN
      * lands in the OVERFLOW bin explicitly: both engines' comparison
      * semantics order NaN above every value (Spark's nan-safe compare,
      * DuckDB's total order), so `v >= hi` routes NaN to overflow there —
      * Java primitive comparisons would instead fall through both
      * branches and floor(NaN) to bin 0, silently diverging from the
      * fold by the full histogram range. */
    def binOf(v: Double): Int =
      if (java.lang.Double.isNaN(v)) nBins
      else if (v < lo) -1
      else if (v >= hi) nBins
      else math.min(math.floor((v - lo) / width).toInt, nBins - 1)
  }

  /** Sample-derived binning: bounds from the rank quantiles of a bounded
    * random sample (the [[Pq.train]] collect discipline — `orderBy(rand)
    * .limit`, never a full scan), sized so ~`coverage` of the
    * distribution lands in range. The tails are split evenly: lo is the
    * sample's (1-coverage)/2 quantile, hi the mirror — nudged up one ulp
    * so the sample's upper-quantile value itself falls INSIDE the
    * half-open [lo, hi). A manual range stays first-class (the oracle
    * rows keep their explicit binning); this is the operator aid for the
    * misconfigured-range failure mode, where a guessed [lo, hi) silently
    * parks mass in under/overflow — pair it with the envelope's
    * `out_of_range_mass_fraction` alert, which flags drift AFTER the
    * bounds are chosen.
    *
    * NaN and ±Infinity values are excluded from the sample (NaN carries
    * no order information; an Infinity at a quantile index would fail
    * HistogramSpec's finiteness contract — at fold time NaN and +Inf
    * land in the overflow bin, -Inf in underflow, all counting toward
    * the out-of-range alert). All-equal samples get a unit span
    * [v, v+1) rather than a degenerate zero-width refusal — the fold
    * still counts everything, in one bin. */
  def fromSample(df: DataFrame, valueCol: String, nBins: Int,
      coverage: Double = 0.99, sampleSize: Int = 10000,
      seed: Long = 42L): HistogramSpec = {
    require(coverage > 0.0 && coverage <= 1.0,
      s"coverage must be in (0, 1], got $coverage")
    require(sampleSize > 0, s"sampleSize must be positive, got $sampleSize")
    val sample = df
      .select(col(valueCol).cast("double").as("v"))
      // strict open-interval bounds exclude NULL, NaN (compares greater
      // than everything in Spark's ordering, so it fails the upper
      // bound), and both infinities in one predicate
      .filter(col("v") > Double.NegativeInfinity &&
        col("v") < Double.PositiveInfinity)
      .orderBy(rand(seed)).limit(sampleSize)
      .collect().map(_.getDouble(0))
    require(sample.nonEmpty,
      s"cannot derive a binning: no non-null finite values in " +
        s"'$valueCol'")
    fromValues(sample.toSeq, nBins, coverage)
  }

  /** The [[fromSample]] arithmetic over ALREADY-LOCAL values — the ONE
    * definition (rank-quantile tails, one-ulp-open hi, unit span on a
    * degenerate spread) shared by the DataFrame face above, the
    * streaming bootstrap (`StreamingHistogram.ingestAutoBinned`), and
    * the REST derive face, so the three entry points cannot drift.
    * Non-finite values (NaN/±Inf) are excluded, as in [[fromSample]]. */
  def fromValues(values: Seq[Double], nBins: Int,
      coverage: Double = 0.99): HistogramSpec = {
    require(coverage > 0.0 && coverage <= 1.0,
      s"coverage must be in (0, 1], got $coverage")
    val finite = values.filter(java.lang.Double.isFinite)
    require(finite.nonEmpty,
      "cannot derive a binning: no finite values in the sample")
    val sorted = finite.sorted
    val tail = (1.0 - coverage) / 2.0
    val loIdx = math.floor(tail * (sorted.length - 1)).toInt
    val hiIdx = math.ceil((1.0 - tail) * (sorted.length - 1)).toInt
    val lo = sorted(loIdx)
    // one ulp past the upper-quantile value: [lo, hi) is half-open, and
    // the chosen hi must itself be covered. Degenerate spread (upper
    // quantile == lo — all-equal or near-constant sample) gets a unit
    // span rather than a one-ulp sliver whose width underflows.
    val hi =
      if (sorted(hiIdx) > lo) math.nextUp(sorted(hiIdx)) else lo + 1.0
    HistogramSpec(lo, hi, nBins)
  }

  /** Exact histogram counts: (bin, cnt) rows, bin in [-1, nBins], NULL
    * values skipped (the percentile convention). One map-side-combined
    * aggregation over at most nBins+2 keys.
    *
    * The null filter runs on the CAST value, not the raw column: under
    * ANSI (this engine's default) a malformed string cast fails LOUDLY —
    * the right contract for exact counts — but in a non-ANSI session it
    * yields NULL, and a NULL reaching binExpr would slip through both
    * range branches and then Spark's null-skipping least(), silently
    * counting garbage in the top in-range bin. Filtering after the cast
    * closes that door in both modes. */
  def counts(df: DataFrame, valueCol: String,
      spec: HistogramSpec): DataFrame =
    df.select(col(valueCol).cast("double").as("__hist_v"))
      .filter(col("__hist_v").isNotNull)
      .select(spec.binExpr(col("__hist_v")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** [[counts]] per group: (group STRING, bin, cnt) rows — ONE
    * map-side-combined aggregation over at most groups x (nBins+2) keys.
    * Rows whose group key is NULL are excluded (per-group semantics have
    * no null-group answer — the streaming fold's rule; its
    * `excludedNullRows` counter is the observability face), as are NULL
    * values within a group. This is the batch cross-check behind the
    * grouped streaming fold's verify face (`GET /admin/histogram?
    * verify=true`): recomputing the per-(group, bin) counts one-shot over
    * the stream's source corpus and comparing cell-for-cell catches
    * bounds drift, a corrupted state, or a source/state mismatch. */
  def countsPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      spec: HistogramSpec): DataFrame =
    df.select(col(groupCol).cast("string").as("group"),
        col(valueCol).cast("double").as("__hist_v"))
      .filter(col("group").isNotNull && col("__hist_v").isNotNull)
      .select(col("group"), spec.binExpr(col("__hist_v")).as("bin"))
      .groupBy("group", "bin").agg(count(lit(1)).as("cnt"))

  /** Interpolated quantile estimate from exact counts — ONE definition of
    * the arithmetic, replayed verbatim by the oracle SQL:
    * target rank t = 1 + (n-1)*p over the FULL mass (underflow first,
    * then in-range bins in order, then overflow); the bin b holding t
    * yields lo + width*(b + (t - cumBefore)/cnt_b); a t inside the
    * underflow (overflow) mass clamps to lo (hi) — the honest "outside
    * the configured range" answer. Estimates are exact-rank: only value
    * resolution is quantized (one bin width).
    *
    * @param bins (bin -> exact count), -1/nBins keys for under/overflow
    * @return (prob, estimate) per requested prob; empty when n == 0 */
  def quantiles(spec: HistogramSpec, bins: Map[Int, Long],
      probs: Seq[Double]): Seq[(Double, Double)] = {
    probs.foreach(p => require(p >= 0.0 && p <= 1.0,
      s"quantile prob must be in [0,1], got $p"))
    bins.foreach { case (b, c) =>
      require(b >= -1 && b <= spec.nBins, s"bin $b outside the spec")
      require(c >= 0L, s"negative count $c in bin $b")
    }
    val n = bins.valuesIterator.sum
    if (n == 0L) Seq.empty
    else {
      val under = bins.getOrElse(-1, 0L)
      val inRange = (0 until spec.nBins).map(b => bins.getOrElse(b, 0L))
      probs.map { p =>
        val t = 1.0 + (n - 1).toDouble * p
        if (t <= under) p -> spec.lo
        else {
          var cum = under.toDouble
          var b = 0
          var est = spec.hi // fall-through: t lands in the overflow mass
          var done = false
          while (!done && b < spec.nBins) {
            val c = inRange(b)
            if (c > 0L && t <= cum + c) {
              val frac = (t - cum) / c
              est = spec.lo + spec.width * (b + frac)
              done = true
            }
            cum += c
            b += 1
          }
          p -> est
        }
      }
    }
  }
}
