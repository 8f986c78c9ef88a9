package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Dense-vector math over `ARRAY<FLOAT>` columns, computed in DOUBLE for
  * oracle parity (DuckDB computes list distance kernels in double once the
  * lists are cast to DOUBLE[]).
  *
  * Capability map (SURVEY.md §2.8): dot product M1
  * (reference `src/core/vector_ops.rs:35-37`), cosine similarity M2
  * (`src/core/types.rs:79-103`, zero-norm => 0.0 per
  * `src/core/vector_ops.rs:44-48`), Euclidean M3 (`src/core/types.rs:105-120`),
  * magnitude/normalize M4 (`src/core/types.rs:66-77`), angular distance M5
  * (`src/core/vector_ops.rs:592-597`), distance->score M7
  * (`src/api/rest.rs:653`), time-decay M8 / popularity M9 / combined M10
  * (`src/hybrid/search_integration.rs:319-371`), scalar quantization M11
  * (`src/core/vector_ops.rs:349-387`).
  *
  * v1 uses Spark higher-order functions (aggregate/zip_with); the hot-path
  * kernels are swapped for codegen Catalyst expressions in
  * [[graft.functions.VectorExpressions]] — these column builders are kept as
  * the reference semantics (and used by tests to cross-check the codegen
  * versions).
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Sum of element-wise products, in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x) * d(x))

  /** L2 norm (magnitude). */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; zero-norm operand => 0.0 (reference semantics,
    * `src/core/vector_ops.rs:44-48`). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0.0, 0.0).otherwise(dotProduct(a, b) / den)
  }

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Squared Euclidean distance. */
  def euclideanSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean (L2) distance. */
  def euclideanDistance(a: Column, b: Column): Column = sqrt(euclideanSq(a, b))

  /** Angular distance acos(clamp(cos, -1, 1)). */
  def angularDistance(a: Column, b: Column): Column =
    acos(greatest(lit(-1.0), least(lit(1.0), cosineSimilarity(a, b))))

  /** Unit-normalize; zero vector passes through unchanged (reference
    * `Embedding::normalize` no-ops on zero norm, `src/core/types.rs:71-77`). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (d(x) / n).cast("float")))
  }

  /** M6 inner-product -> cosine correction
    * (`src/core/vector_ops.rs:581-590`): given a dot-product score and both
    * norms, recover cosine; zero-norm => 0. */
  def innerProductToCosine(dot: Column, normA: Column, normB: Column): Column =
    when(normA * normB === 0.0, 0.0).otherwise(dot / (normA * normB))

  // ---- scoring (M7-M10) ----

  /** score = 1 / (1 + distance)  (`src/api/rest.rs:653`). */
  def distanceToScore(dist: Column): Column = lit(1.0) / (lit(1.0) + dist)

  /** score = 1 - distance (`src/hybrid/search_integration.rs:162`). */
  def oneMinusDistance(dist: Column): Column = lit(1.0) - dist

  /** Time-decay 0.5^(age_seconds / half_life_seconds)
    * (`src/hybrid/search_integration.rs:319-339`); `now` passed explicitly so
    * results are deterministic/oracle-checkable. Age clamps at 0 exactly as
    * the reference's `.to_std().unwrap_or(0)` does (`:328-330`): a FUTURE
    * timestamp decays by 1.0 (no boost) — the unclamped form would raise
    * 0.5 to a negative power and score future rows above present ones. */
  def timeDecay(ts: Column, now: Column, halfLifeSeconds: Double): Column = {
    // clamp via when, NOT greatest: Spark's greatest SKIPS nulls, so a
    // NULL timestamp would clamp to age 0 and score an undated row as
    // maximally fresh — the null must propagate (pre-clamp semantics)
    val age = (unix_timestamp(now) - unix_timestamp(ts)).cast("double")
    pow(lit(0.5), when(age < 0.0, 0.0).otherwise(age) / halfLifeSeconds)
  }

  /** Popularity boost 1 + ln(1 + views)/10
    * (`src/hybrid/search_integration.rs:340-354`). */
  def popularityBoost(views: Column): Column =
    lit(1.0) + log1p(d(views)) / 10.0

  /** Metadata boost on a base score (the CosineSimilarity scorer's boost
    * path, `src/hybrid/search_integration.rs:314-327`): a parseable
    * `boost` metadata value multiplies the base score; an absent or
    * unparseable one leaves it unchanged (the reference's parse::<f32>
    * failure falls through to the unboosted score — try_cast's
    * null-on-malformed + coalesce is the same leniency; a plain cast
    * would THROW under ANSI mode instead of falling through). */
  def boostedScore(base: Column, boostStr: Column): Column =
    base * coalesce(boostStr.try_cast(FloatType).cast("double"), lit(1.0))

  /** Weighted combination of per-method scores (M10, the Combined scorer,
    * `src/hybrid/search_integration.rs:355-370`): reference-exact
    * normalization by the TOTAL weight — `Σ(score_i·w_i)/Σw_i`, so weights
    * need not sum to 1 — with the reference's zero/negative-total fallback
    * to the plain base score (`:365-369`, its `1.0 - distance`), passed by
    * the caller as `fallback`. Weights are plan-time constants, so the
    * fallback branch resolves at plan build, not per row. */
  def combinedScore(sim: Column, recency: Column, popularity: Column,
      wSim: Double, wRec: Double, wPop: Double, fallback: Column): Column = {
    val total = wSim + wRec + wPop
    if (total > 0.0) (sim * wSim + recency * wRec + popularity * wPop) / total
    else fallback
  }

  // ---- scalar quantization (M11, `src/core/vector_ops.rs:349-387`) ----

  /** Per-vector min/max affine quantization to u8 codes (stored as INT
    * array; the codes are 0..255). Returns struct(codes, vmin, vmax). */
  def quantizeU8(a: Column): Column = {
    val mn = d(array_min(a))
    val mx = d(array_max(a))
    val range = when(mx - mn === 0.0, 1.0).otherwise(mx - mn)
    struct(
      transform(a, x => round((d(x) - mn) / range * 255.0).cast("int")).as("codes"),
      mn.as("vmin"), mx.as("vmax"))
  }

  /** Inverse of [[quantizeU8]]. */
  def dequantizeU8(codes: Column, vmin: Column, vmax: Column): Column = {
    val range = when(d(vmax) - d(vmin) === 0.0, 1.0).otherwise(d(vmax) - d(vmin))
    transform(codes, c => (d(c) / 255.0 * range + d(vmin)).cast("float"))
  }
}
