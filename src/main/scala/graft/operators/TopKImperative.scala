package graft.operators

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable grouped top-k state: parallel primitive arrays, live prefix n. */
final class TopKState(var ids: Array[Long], var dists: Array[Double], var n: Int) {
  def compactTo(keep: Int): Unit = {
    if (n > keep) {
      val idx = Array.range(0, n).sortBy(i => (dists(i), ids(i)))
      val nid = new Array[Long](ids.length); val nd = new Array[Double](dists.length)
      var i = 0
      while (i < keep) { nid(i) = ids(idx(i)); nd(i) = dists(idx(i)); i += 1 }
      ids = nid; dists = nd; n = keep
    }
  }
}

/** Native TypedImperativeAggregate grouped top-k (SURVEY.md §2.6 T3) — the
  * zero-encoder fast path under [[TopK]]: `update` reads the id/dist columns
  * straight off the InternalRow (no per-row object materialization, no
  * encoder round-trip — the overhead that dominates a udaf-wrapped
  * Aggregator at millions of rows per group). Partial aggregation ships at
  * most `cap` (= 4k) candidates per partition per group.
  *
  * Output: ARRAY<STRUCT<id BIGINT, dist DOUBLE>> sorted by (dist, id),
  * length <= k.
  */
case class TopKAgg(idExpr: Expression, distExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  private val cap = math.max(4 * k, 64)

  override def children: Seq[Expression] = Seq(idExpr, distExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("dist", DoubleType))))
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKState =
    new TopKState(new Array[Long](cap), new Array[Double](cap), 0)

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val idV = idExpr.eval(input)
    val dV = distExpr.eval(input)
    if (idV != null && dV != null) {
      if (b.n >= b.ids.length) b.compactTo(k)
      b.ids(b.n) = idV.asInstanceOf[Long]
      b.dists(b.n) = dV.asInstanceOf[Double]
      b.n += 1
    }
    b
  }

  override def merge(b: TopKState, o: TopKState): TopKState = {
    var i = 0
    while (i < o.n) {
      if (b.n >= b.ids.length) b.compactTo(k)
      b.ids(b.n) = o.ids(i); b.dists(b.n) = o.dists(i); b.n += 1
      i += 1
    }
    b
  }

  override def eval(b: TopKState): Any = {
    b.compactTo(k)
    // compactTo no-ops when n <= k, so sort explicitly for the output order
    val idx = Array.range(0, b.n).sortBy(i => (b.dists(i), b.ids(i)))
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = InternalRow(b.ids(idx(i)), b.dists(idx(i))); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKState): Array[Byte] = {
    b.compactTo(k)
    val buf = ByteBuffer.allocate(4 + b.n * 16)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putLong(b.ids(i)); buf.putDouble(b.dists(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val s = new TopKState(new Array[Long](math.max(cap, n)), new Array[Double](math.max(cap, n)), n)
    var i = 0
    while (i < n) { s.ids(i) = buf.getLong(); s.dists(i) = buf.getDouble(); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKAgg =
    copy(idExpr = cs(0), distExpr = cs(1))
}

/** Mutable grouped top-k state over string ids (UTF8String, comparable for
  * the (dist, id) tie-break). */
final class TopKStrState(var ids: Array[UTF8String], var dists: Array[Double], var n: Int) {
  def compactTo(keep: Int): Unit = {
    if (n > keep) {
      val idx = Array.range(0, n).sortWith { (a, b) =>
        val c = java.lang.Double.compare(dists(a), dists(b))
        if (c != 0) c < 0 else ids(a).compareTo(ids(b)) < 0
      }
      val nid = new Array[UTF8String](ids.length); val nd = new Array[Double](dists.length)
      var i = 0
      while (i < keep) { nid(i) = ids(idx(i)); nd(i) = dists(idx(i)); i += 1 }
      ids = nid; dists = nd; n = keep
    }
  }
}

/** String-id sibling of [[TopKAgg]]: grouped top-k that carries the natural
  * string id through the aggregation, so store-level searches need no
  * long-surrogate remap (and no hash-collision risk) and no join back to
  * recover the id. Output: ARRAY<STRUCT<id STRING, dist DOUBLE>> by
  * (dist, id), length <= k. */
case class TopKStrAgg(idExpr: Expression, distExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrState] {

  private val cap = math.max(4 * k, 64)

  override def children: Seq[Expression] = Seq(idExpr, distExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", StringType), StructField("dist", DoubleType))))
  override def prettyName: String = "top_k_str"

  override def createAggregationBuffer(): TopKStrState =
    new TopKStrState(new Array[UTF8String](cap), new Array[Double](cap), 0)

  override def update(b: TopKStrState, input: InternalRow): TopKStrState = {
    val idV = idExpr.eval(input)
    val dV = distExpr.eval(input)
    if (idV != null && dV != null) {
      if (b.n >= b.ids.length) b.compactTo(k)
      // clone: the UTF8String points into a buffer the scan will reuse
      b.ids(b.n) = idV.asInstanceOf[UTF8String].clone()
      b.dists(b.n) = dV.asInstanceOf[Double]
      b.n += 1
    }
    b
  }

  override def merge(b: TopKStrState, o: TopKStrState): TopKStrState = {
    var i = 0
    while (i < o.n) {
      if (b.n >= b.ids.length) b.compactTo(k)
      b.ids(b.n) = o.ids(i); b.dists(b.n) = o.dists(i); b.n += 1
      i += 1
    }
    b
  }

  override def eval(b: TopKStrState): Any = {
    b.compactTo(k)
    val idx = Array.range(0, b.n).sortWith { (x, y) =>
      val c = java.lang.Double.compare(b.dists(x), b.dists(y))
      if (c != 0) c < 0 else b.ids(x).compareTo(b.ids(y)) < 0
    }
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = InternalRow(b.ids(idx(i)), b.dists(idx(i))); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKStrState): Array[Byte] = {
    b.compactTo(k)
    var bytes = 4
    var i = 0
    while (i < b.n) { bytes += 12 + b.ids(i).numBytes(); i += 1 }
    val buf = ByteBuffer.allocate(bytes)
    buf.putInt(b.n)
    i = 0
    while (i < b.n) {
      val idb = b.ids(i).getBytes
      buf.putInt(idb.length); buf.put(idb); buf.putDouble(b.dists(i)); i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val s = new TopKStrState(new Array[UTF8String](math.max(cap, n)),
      new Array[Double](math.max(cap, n)), n)
    var i = 0
    while (i < n) {
      val len = buf.getInt(); val idb = new Array[Byte](len); buf.get(idb)
      s.ids(i) = UTF8String.fromBytes(idb); s.dists(i) = buf.getDouble(); i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStrAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStrAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKStrAgg =
    copy(idExpr = cs(0), distExpr = cs(1))
}

object TopKImperative {
  /** Column form: topK(id, dist) -> ARRAY<STRUCT<id,dist>>, k best. */
  def topK(k: Int)(id: Column, dist: Column): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(id), ColumnBridge.expression(dist), k)
        .toAggregateExpression())

  /** String-id form: topKStr(id, dist) -> ARRAY<STRUCT<id STRING, dist>>. */
  def topKStr(k: Int)(id: Column, dist: Column): Column =
    ColumnBridge.column(
      TopKStrAgg(ColumnBridge.expression(id), ColumnBridge.expression(dist), k)
        .toAggregateExpression())
}
