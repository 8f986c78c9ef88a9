package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the per-shard quality report a curation
  * run ships next to its output: row count, null count, exact distinct
  * count, and min/max per column. One aggregate over one scan; the
  * multi-column distinct counts expand map-side (Spark's Expand node) and
  * every partial is a counter, so the report costs one pass at any corpus
  * size. Min/max are cast to string AFTER aggregating (never before —
  * lexicographic min of a numeric column is wrong), so the output schema
  * is uniform across column types.
  *
  * The reference ships index stats, not table profiles
  * (`src/hybrid/core.rs:703-757` hybrid stats); this is the corpus-side
  * complement a 100 TB documents table needs.
  */
object Profile {

  /** One row per profiled column: (col_name, n, n_null, n_distinct, min,
    * max). `cols` defaults to every column of `df`. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    require(targets.nonEmpty, "profile: no columns to profile")
    require(targets.forall(df.columns.contains),
      s"profile: unknown columns ${targets.filterNot(df.columns.contains).mkString(",")}")
    val aggs: Seq[Column] = targets.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = targets.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min"), col(s"${c}__max").as("max"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
