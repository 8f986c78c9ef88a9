package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the per-shard quality report a curation
  * run ships next to its output: row count, null count, distinct count,
  * and min/max per column. Min/max are cast to string AFTER aggregating
  * (never before — lexicographic min of a numeric column is wrong), so
  * the output schema is uniform across column types.
  *
  * The distinct counts are SKETCHED by default (`approx_count_distinct`,
  * HyperLogLog++): every partial is a fixed-size sketch, so the whole
  * report is one map-side-combined pass at any corpus size — profiling a
  * per-row-unique column (doc_id at 100 TB) still shuffles only sketches.
  * `exactDistinct = true` is the explicit opt-in for bounded-cardinality
  * corpora where the report must carry exact distincts: Spark plans
  * multi-column DISTINCT aggregates as an Expand whose first exchange is
  * keyed on (gid, value) — that shuffle carries every distinct VALUE, ~N
  * rows for a unique column, which is why exactness is not the default.
  *
  * The reference ships index stats, not table profiles
  * (`src/hybrid/core.rs:703-757` hybrid stats); this is the corpus-side
  * complement a 100 TB documents table needs.
  */
object Profile {

  /** One row per profiled column: (col_name, n, n_null, n_distinct, min,
    * max). `cols` defaults to every column of `df`. `n_distinct` is an
    * HLL++ estimate at `rsd` relative error by default (fixed-size
    * partials — the scale path; sparse-mode exact at small
    * cardinalities); pass `exactDistinct = true` to opt in to exact
    * distincts (an Expand + value-keyed shuffle — see the object
    * scaladoc for why that is opt-in). */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      exactDistinct: Boolean = false, rsd: Double = 0.02): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    require(targets.nonEmpty, "profile: no columns to profile")
    require(targets.forall(df.columns.contains),
      s"profile: unknown columns ${targets.filterNot(df.columns.contains).mkString(",")}")
    require(rsd > 0.0 && rsd < 1.0,
      s"profile: rsd must be in (0, 1), got $rsd")
    // every name -> Column round-trip goes through backticks: a profiled
    // column named "a.b" (or carrying any parser-special char) must
    // resolve as the top-level column the validation above accepted, not
    // parse as a nested-field path and fail the select
    def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")
    def distinctAgg(c: String): Column =
      if (exactDistinct) countDistinct(qcol(c))
      else approx_count_distinct(qcol(c), rsd)
    val aggs: Seq[Column] = targets.flatMap { c =>
      Seq(
        sum(when(qcol(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg(c).as(s"${c}__distinct"),
        min(qcol(c)).cast("string").as(s"${c}__min"),
        max(qcol(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = targets.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n"),
        qcol(s"${c}__nulls").as("n_null"),
        qcol(s"${c}__distinct").as("n_distinct"),
        qcol(s"${c}__min").as("min"), qcol(s"${c}__max").as("max"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** The moments aggregate columns — ONE definition shared by the batch
    * faces below and the streaming folds
    * ([[graft.streaming.StreamingMoments]] /
    * [[graft.streaming.StreamingGroupedMoments]]), so the four corners of
    * the moments square cannot drift arithmetically.
    *
    * Exactness is the point: the value column is INTEGRAL (cast to long —
    * token counts, char counts, byte sizes; the natural numeric-profile
    * targets of a training-data pipeline), and the sums accumulate as
    * decimal(38,0), so sum and sum-of-squares are EXACT integers — no FP
    * rounding, no addition-order dependence — which is what lets a folded
    * stream state equal the one-shot batch answer bit-for-bit and lets
    * DuckDB replay both (HUGEINT arithmetic). Squares of longs fit
    * decimal(38,0) (max long² ≈ 8.5e37 < 1e38); a sum that would overflow
    * 38 digits comes back NULL and the callers refuse loudly rather than
    * serving a wrapped number. Mean/variance are DERIVED, FP-only views
    * computed from the exact sums at read time — never part of state or
    * merge arithmetic. Doubles (or any non-integral column) belong on the
    * histogram face, whose rank accounting stays exact under quantized
    * values. */
  private[graft] def momentsAggs(valueCol: String): Seq[Column] = {
    val v = col("`" + valueCol.replace("`", "``") + "`").cast("long")
    val d = v.cast("decimal(38,0)")
    Seq(count(lit(1)).as("n_rows"), count(v).as("n"),
      (count(lit(1)) - count(v)).as("n_null"),
      min(v).as("vmin"), max(v).as("vmax"),
      sum(d).as("vsum"), sum(d * d).as("vsum_sq"))
  }

  /** Exact integer moments of one integral column, one row:
    * (n_rows, n, n_null, vmin, vmax, vsum, vsum_sq) — counts and min/max
    * as long, the two sums as decimal(38,0) (exact; see [[momentsAggs]]).
    * vmin/vmax/vsum/vsum_sq are NULL when every value is null. One
    * map-side-combined aggregate over one scan at any corpus size. */
  def moments(df: DataFrame, valueCol: String): DataFrame = {
    require(df.columns.contains(valueCol),
      s"moments: unknown column '$valueCol'")
    val a = momentsAggs(valueCol)
    df.agg(a.head, a.tail: _*)
  }

  /** Per-group exact integer moments: [[moments]] grouped by `groupCol`,
    * NULL group keys excluded (no identity to profile under — the
    * grouped-family rule; callers wanting them as a stratum should
    * coalesce first). Output ordered by group. Still one aggregate, one
    * scan; the result is one row per group. */
  def momentsPerGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    require(df.columns.contains(groupCol),
      s"momentsPerGroup: unknown group column '$groupCol'")
    require(df.columns.contains(valueCol),
      s"momentsPerGroup: unknown value column '$valueCol'")
    val g = col("`" + groupCol.replace("`", "``") + "`")
    val a = momentsAggs(valueCol)
    df.filter(g.isNotNull)
      .groupBy(g.as("group"))
      .agg(a.head, a.tail: _*)
      .orderBy("group")
  }

  /** The co-moments aggregate columns — ONE definition shared by the
    * bivariate batch faces below and the streaming folds
    * ([[graft.streaming.StreamingComoments]] /
    * [[graft.streaming.StreamingGroupedComoments]]), the bivariate
    * sibling of [[momentsAggs]] with the same exactness posture: both
    * columns are INTEGRAL (cast to long), all five sums accumulate as
    * decimal(38,0) — EXACT integers, no FP rounding, no addition-order
    * dependence — so a folded stream state equals the one-shot batch
    * answer bit-for-bit and DuckDB replays both with HUGEINT arithmetic.
    * A cross product of two longs fits decimal(38,0) (|xy| ≤ long² ≈
    * 8.5e37 < 1e38); a sum past 38 digits comes back NULL and callers
    * refuse loudly. Covariance and Pearson correlation are DERIVED,
    * FP-only views computed from the exact sums at read time.
    *
    * Semantics are PAIRWISE-COMPLETE: a row contributes to n and to
    * every min/max/sum only when BOTH columns are non-null, so all
    * eleven statistics describe the SAME sample and the derived
    * covariance/correlation are internally consistent. Rows missing
    * either side are excluded but exactly counted per axis (n_null_x /
    * n_null_y over ALL rows), so a column rotting to NULL is visible on
    * the envelope rather than silently thinning the pair sample. */
  private[graft] def comomentsAggs(xCol: String, yCol: String): Seq[Column] = {
    val x = col("`" + xCol.replace("`", "``") + "`").cast("long")
    val y = col("`" + yCol.replace("`", "``") + "`").cast("long")
    val both = x.isNotNull && y.isNotNull
    val xp = when(both, x)
    val yp = when(both, y)
    val xd = xp.cast("decimal(38,0)")
    val yd = yp.cast("decimal(38,0)")
    Seq(count(lit(1)).as("n_rows"), count(xp).as("n"),
      (count(lit(1)) - count(x)).as("n_null_x"),
      (count(lit(1)) - count(y)).as("n_null_y"),
      min(xp).as("xmin"), max(xp).as("xmax"),
      min(yp).as("ymin"), max(yp).as("ymax"),
      sum(xd).as("xsum"), sum(yd).as("ysum"),
      sum(xd * xd).as("xsum_sq"), sum(yd * yd).as("ysum_sq"),
      sum(xd * yd).as("xysum"))
  }

  /** Exact integer co-moments of two integral columns, one row:
    * (n_rows, n, n_null_x, n_null_y, xmin, xmax, ymin, ymax, xsum, ysum,
    * xsum_sq, ysum_sq, xysum) — counts and min/max as long, the five sums
    * as decimal(38,0) (exact; see [[comomentsAggs]]). The pair stats are
    * NULL when no row has both values. One map-side-combined aggregate
    * over one scan at any corpus size. */
  def comoments(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    require(df.columns.contains(xCol), s"comoments: unknown column '$xCol'")
    require(df.columns.contains(yCol), s"comoments: unknown column '$yCol'")
    val a = comomentsAggs(xCol, yCol)
    df.agg(a.head, a.tail: _*)
  }

  /** Per-group exact co-moments: [[comoments]] grouped by `groupCol`,
    * NULL group keys excluded (the grouped-family rule). Output ordered
    * by group; still one aggregate, one scan, one row per group. */
  def comomentsPerGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    require(df.columns.contains(groupCol),
      s"comomentsPerGroup: unknown group column '$groupCol'")
    require(df.columns.contains(xCol),
      s"comomentsPerGroup: unknown column '$xCol'")
    require(df.columns.contains(yCol),
      s"comomentsPerGroup: unknown column '$yCol'")
    val g = col("`" + groupCol.replace("`", "``") + "`")
    val a = comomentsAggs(xCol, yCol)
    df.filter(g.isNotNull)
      .groupBy(g.as("group"))
      .agg(a.head, a.tail: _*)
      .orderBy("group")
  }
}
