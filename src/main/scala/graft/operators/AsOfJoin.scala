package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — the temporal-alignment operator a
  * training-data/event pipeline needs that neither the reference nor core
  * Spark provides: for each left row, attach the latest right row with
  * `right.ts <= left.ts` per key.
  *
  * Composed Spark-first (preference (a) from the build rules) instead of a
  * custom SparkPlan: union both sides tagged, one sort per (key, ts) inside
  * a single window, carry the last right row forward. Exactly ONE shuffle
  * on the key — the same cost as the sort-merge join a custom physical
  * operator would do, with AQE/skew handling intact.
  */
object AsOfJoin {

  /** @param left  (keyCol, tsCol, ...leftCols)
    * @param right (keyCol, tsCol, ...valueCols)
    * @param tolerance max allowed staleness in seconds (None = unbounded)
    * @return left rows + each right value column (null when no prior right
    *         row within tolerance)
    */
  def nearestPrior(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val rightCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    require(leftCols.intersect(rightCols).isEmpty,
      s"overlapping columns: ${leftCols.intersect(rightCols).mkString(",")}")
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val unioned = l.select(
      (Seq(col(keyCol), col(tsCol), col("_side")) ++
        leftCols.map(col) ++ rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
      .unionByName(r.select(
        (Seq(col(keyCol), col(tsCol), col("_side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightCols.map(col)): _*))
    // right rows sort before left rows at equal ts => "<=" semantics
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry the nearest-prior right row as ONE struct, not per-column
    // last(ignoreNulls) windows: per-column carries would stitch values
    // from DIFFERENT right rows whenever the nearest row holds a null in
    // some column (a "frankenrow" that never existed — the correct result
    // is the nearest row's values, nulls included). The struct also pins
    // _r_ts to the SAME row the values came from, which is what makes the
    // staleness bound below honest.
    val carriedStruct = unioned.withColumn("_r",
      last(when(col("_side") === 0,
        struct((col(tsCol).as("_rts") +: rightCols.map(col)): _*)),
        ignoreNulls = true).over(w))
    val carried = rightCols.foldLeft(carriedStruct) { (df, c) =>
      df.withColumn(c, col("_r").getField(c))
    }.withColumn("_r_ts", col("_r").getField("_rts"))
    val bounded = tolerance match {
      case Some(t) =>
        // staleness on a numeric cast of the ts column: casting a
        // TIMESTAMP to double yields epoch seconds and a numeric ts passes
        // through — unlike unix_timestamp(), which null-parses numeric
        // columns and would silently void the bound. A STRING ts would
        // cast to null and void the bound the same silent way, so the
        // dtype is gated loudly up front AND the predicate fails CLOSED:
        // a null staleness computation (null ts value in a row) drops the
        // carried value rather than keeping a possibly-stale one.
        val tsType = left.schema(tsCol).dataType
        // numeric or timestamp only: DATE cannot cast to double (Spark
        // raises DATATYPE_MISMATCH), and a STRING would cast to null and
        // silently void the bound — both are rejected up front
        require(tsType.isInstanceOf[org.apache.spark.sql.types.NumericType]
            || tsType == org.apache.spark.sql.types.TimestampType,
          s"asof tolerance (seconds) needs a numeric or timestamp '$tsCol' " +
            s"column, got $tsType")
        val stale = coalesce(
          col("_r_ts").isNull ||
            (col(tsCol).cast("double") - col("_r_ts").cast("double")) > t,
          lit(true))
        rightCols.foldLeft(carried) { (df, c) =>
          df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
        }
      case None => carried
    }
    bounded.filter(col("_side") === 1).drop("_side", "_r_ts", "_r")
  }
}
