package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate inside a grouped top-k aggregation. */
case class IdDist(id: Long, dist: Double)

/** Bounded top-k buffer; `items` is unordered between compactions. */
case class TopKBuf(items: Array[IdDist])

/** Grouped top-k as a typed Aggregator — the Spark-native form of the
  * reference's streaming top-k accumulator (SURVEY.md §2.6 T3,
  * `/root/reference/src/core/vector_ops.rs:204-263`).
  *
  * Crucial at scale: registered via `udaf` it participates in partial
  * (map-side) aggregation, so each shuffle partition ships at most k
  * candidates per group instead of the whole scored corpus — the reason to
  * prefer this over `Window.partitionBy(query).orderBy(dist)` + row_number,
  * which must shuffle and sort every scored row.
  *
  * Ordering is (dist ASC, id ASC) — ties broken by id for deterministic,
  * oracle-matchable results. For similarity metrics pass the negated score
  * as `dist`.
  */
class TopKAggregator(k: Int) extends Aggregator[IdDist, TopKBuf, Array[IdDist]] {
  private val ord: Ordering[IdDist] = Ordering.by(d => (d.dist, d.id))

  /** Compaction threshold: amortize sorts, bound buffer memory. */
  private val softMax = math.max(4 * k, 64)

  private def compact(items: Array[IdDist]): Array[IdDist] =
    if (items.length <= k) items else items.sorted(ord).take(k)

  override def zero: TopKBuf = TopKBuf(Array.empty)

  override def reduce(b: TopKBuf, a: IdDist): TopKBuf = {
    val arr = b.items :+ a
    TopKBuf(if (arr.length >= softMax) compact(arr) else arr)
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(compact(b1.items ++ b2.items))

  override def finish(b: TopKBuf): Array[IdDist] = b.items.sorted(ord).take(k)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Array[IdDist]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[IdDist]]()
}

object TopK {
  /** Column function: topK(k)(idCol, distCol) -> ARRAY<STRUCT<id,dist>>. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[IdDist])
    (id: Column, dist: Column) => fn(id, dist)
  }
}
