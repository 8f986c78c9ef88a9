package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate inside a grouped top-k aggregation. */
case class IdDist(id: Long, dist: Double)

/** Bounded top-k buffer: parallel primitive arrays mutated in place
  * (TypedImperativeAggregate keeps the buffer as a live object between
  * updates; it is only encoded at shuffle boundaries). `n` is the live
  * prefix length. */
case class TopKBuf(ids: Array[Long], dists: Array[Double], n: Int)

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
  * The buffer appends into preallocated primitive arrays (no per-row
  * allocation) and compacts in place to the best k (by (dist, id)) when
  * full — O(cap log cap) every (cap - k) rows, amortized O(log cap)/row.
  *
  * Ordering is (dist ASC, id ASC) — ties broken by id for deterministic,
  * oracle-matchable results. For similarity metrics pass the negated score
  * as `dist`.
  */
class TopKAggregator(k: Int) extends Aggregator[IdDist, TopKBuf, Array[IdDist]] {

  /** Buffer capacity: amortize compactions, bound memory. */
  private val cap = math.max(4 * k, 64)

  /** Keep the k best (dist, id) pairs in the prefix, in place. */
  private def compact(b: TopKBuf, keep: Int): TopKBuf = {
    if (b.n <= keep) return b
    val idx = Array.range(0, b.n).sortBy(i => (b.dists(i), b.ids(i)))
    val nids = new Array[Long](b.ids.length)
    val ndists = new Array[Double](b.dists.length)
    var i = 0
    while (i < keep) { nids(i) = b.ids(idx(i)); ndists(i) = b.dists(idx(i)); i += 1 }
    TopKBuf(nids, ndists, keep)
  }

  override def zero: TopKBuf = TopKBuf(new Array[Long](cap), new Array[Double](cap), 0)

  override def reduce(b: TopKBuf, a: IdDist): TopKBuf = {
    val b2 = if (b.n >= b.ids.length) compact(b, k) else b
    b2.ids(b2.n) = a.id
    b2.dists(b2.n) = a.dist
    b2.copy(n = b2.n + 1) // arrays shared; only the cheap wrapper reallocates
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    val ids = new Array[Long](b1.n + b2.n)
    val dists = new Array[Double](b1.n + b2.n)
    System.arraycopy(b1.ids, 0, ids, 0, b1.n)
    System.arraycopy(b1.dists, 0, dists, 0, b1.n)
    System.arraycopy(b2.ids, 0, ids, b1.n, b2.n)
    System.arraycopy(b2.dists, 0, dists, b1.n, b2.n)
    compact(TopKBuf(ids, dists, b1.n + b2.n), k)
  }

  override def finish(b: TopKBuf): Array[IdDist] = {
    val c = compact(b, k)
    Array.tabulate(c.n)(i => IdDist(c.ids(i), c.dists(i)))
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Array[IdDist]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[IdDist]]()
}

object TopK {
  /** Column function: topK(k)(idCol, distCol) -> ARRAY<STRUCT<id,dist>>.
    * Routed to the native TypedImperativeAggregate ([[TopKAgg]]) — the
    * udaf-wrapped [[TopKAggregator]] remains as the typed-API variant (and
    * its cross-check in TopKSpec). */
  def topK(k: Int): (Column, Column) => Column =
    (id: Column, dist: Column) =>
      TopKImperative.topK(k)(id.cast("long"), dist.cast("double"))

  /** String-id form: no long-surrogate cast, ARRAY<STRUCT<id STRING, dist>>. */
  def topKStr(k: Int): (Column, Column) => Column =
    (id: Column, dist: Column) =>
      TopKImperative.topKStr(k)(id.cast("string"), dist.cast("double"))

  /** The Aggregator-based variant (typed Dataset API). */
  def topKTyped(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[IdDist])
    (id: Column, dist: Column) => fn(id, dist)
  }
}
