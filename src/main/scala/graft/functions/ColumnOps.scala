package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression utilities shared across operator modules. */
object ColumnOps {

  /** Let-bind `c` through a one-element transform so every reference in
    * `f`'s body evaluates it ONCE per row: Spark has no explicit column
    * let-binding, and after CollapseProject an expensive expression
    * (a regex split, a zip_with subtraction) referenced at several sites —
    * or inside a per-element lambda — would otherwise be re-evaluated at
    * each one. Used by `TextFunctions.shingles` (the token array) and
    * `Pq.encodeResidual` (the residual vector). */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)
}
