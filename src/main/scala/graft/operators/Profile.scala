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
    // every name -> Column round-trip goes through backticks: a profiled
    // column named "a.b" (or carrying any parser-special char) must
    // resolve as the top-level column the validation above accepted, not
    // parse as a nested-field path and fail the select
    def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")
    val aggs: Seq[Column] = targets.flatMap { c =>
      Seq(
        sum(when(qcol(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(qcol(c)).as(s"${c}__distinct"),
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
}
