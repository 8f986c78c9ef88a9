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

/** Mutable bottom-k sample state: parallel primitive arrays for the
  * (key, id) priority pair plus the carried optional value, live prefix n.
  * Distinctness over ids is enforced IN the compaction (see
  * [[dedupCompactTo]]), so the buffer never needs an unbounded id set. */
final class BottomKSampleState(var keys: Array[Long], var ids: Array[Long],
    var values: Array[Double], var hasValue: Array[Boolean], var n: Int) {
  /** Sort by (key, id), drop adjacent duplicate (key, id) pairs, keep at
    * most `keep`. A duplicate id carries the SAME key by the aggregate's
    * contract (key is a pure salted hash of id), so duplicates are
    * adjacent after the sort and the first occurrence's value wins (ids
    * are stable identities — duplicates carry the same value; the
    * streaming fold's mergeBottomK rule). Always rebuilds the sorted
    * prefix — callers rely on it. */
  def dedupCompactTo(keep: Int): Unit = {
    val idx = Array.range(0, n).sortBy(i => (keys(i), ids(i)))
    val nk = new Array[Long](keys.length); val ni = new Array[Long](ids.length)
    val nv = new Array[Double](values.length)
    val nh = new Array[Boolean](hasValue.length)
    var out = 0; var i = 0
    while (i < n && out < keep) {
      val j = idx(i)
      if (out == 0 || nk(out - 1) != keys(j) || ni(out - 1) != ids(j)) {
        nk(out) = keys(j); ni(out) = ids(j)
        nv(out) = values(j); nh(out) = hasValue(j)
        out += 1
      }
      i += 1
    }
    keys = nk; ids = ni; values = nv; hasValue = nh; n = out
  }
}

/** Grouped bottom-k sample aggregate — the per-group form of the streaming
  * sample fold's per-batch reduction: keeps the k smallest (key, id) pairs
  * over DISTINCT ids per group, carrying an optional DOUBLE value payload
  * with each id. `keyExpr` MUST be a pure function of `idExpr` (the salted
  * hash priority) — that is what lets the compaction dedup by (key, id)
  * adjacency in O(cap log cap) with no id hash set.
  *
  * Like [[TopKAgg]] this is a TypedImperativeAggregate, so the per-batch
  * grouped bottom-k runs with map-side partial aggregation: each task
  * holds O(cap) per group and ships ≤ k candidates per group per
  * partition — no shuffle of raw rows, the same posture as the grouped MG
  * fold. Output: ARRAY<STRUCT<key LONG, id LONG, value DOUBLE>> sorted by
  * (key, id), length ≤ k, value null where the input value was null. */
case class BottomKSampleAgg(keyExpr: Expression, idExpr: Expression,
    valueExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSampleState] {

  private val cap = math.max(4 * k, 64)

  override def children: Seq[Expression] = Seq(keyExpr, idExpr, valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType), StructField("id", LongType),
    StructField("value", DoubleType))))
  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): BottomKSampleState =
    new BottomKSampleState(new Array[Long](cap), new Array[Long](cap),
      new Array[Double](cap), new Array[Boolean](cap), 0)

  override def update(b: BottomKSampleState, input: InternalRow): BottomKSampleState = {
    val kV = keyExpr.eval(input)
    val idV = idExpr.eval(input)
    if (kV != null && idV != null) {
      if (b.n >= b.keys.length) b.dedupCompactTo(k)
      val vV = valueExpr.eval(input)
      b.keys(b.n) = kV.asInstanceOf[Long]
      b.ids(b.n) = idV.asInstanceOf[Long]
      if (vV != null) { b.values(b.n) = vV.asInstanceOf[Double]; b.hasValue(b.n) = true }
      else { b.values(b.n) = 0.0; b.hasValue(b.n) = false }
      b.n += 1
    }
    b
  }

  override def merge(b: BottomKSampleState, o: BottomKSampleState): BottomKSampleState = {
    var i = 0
    while (i < o.n) {
      if (b.n >= b.keys.length) b.dedupCompactTo(k)
      b.keys(b.n) = o.keys(i); b.ids(b.n) = o.ids(i)
      b.values(b.n) = o.values(i); b.hasValue(b.n) = o.hasValue(i)
      b.n += 1
      i += 1
    }
    b
  }

  override def eval(b: BottomKSampleState): Any = {
    b.dedupCompactTo(k)
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = InternalRow(b.keys(i), b.ids(i),
        if (b.hasValue(i)) b.values(i) else null)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: BottomKSampleState): Array[Byte] = {
    b.dedupCompactTo(k)
    val buf = ByteBuffer.allocate(4 + b.n * 25)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) {
      buf.putLong(b.keys(i)); buf.putLong(b.ids(i))
      buf.put(if (b.hasValue(i)) 1.toByte else 0.toByte)
      buf.putDouble(b.values(i))
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKSampleState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val size = math.max(cap, n)
    val s = new BottomKSampleState(new Array[Long](size),
      new Array[Long](size), new Array[Double](size),
      new Array[Boolean](size), n)
    var i = 0
    while (i < n) {
      s.keys(i) = buf.getLong(); s.ids(i) = buf.getLong()
      s.hasValue(i) = buf.get() == 1.toByte
      s.values(i) = buf.getDouble()
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BottomKSampleAgg =
    copy(keyExpr = cs(0), idExpr = cs(1), valueExpr = cs(2))
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

  /** Distinct-id bottom-k with a carried value: bottomKSample(key, id,
    * value) -> ARRAY<STRUCT<key, id, value>>, k smallest (key, id) over
    * distinct ids. `key` must be a pure function of `id`. */
  def bottomKSample(k: Int)(key: Column, id: Column, value: Column): Column =
    ColumnBridge.column(
      BottomKSampleAgg(ColumnBridge.expression(key),
        ColumnBridge.expression(id), ColumnBridge.expression(value), k)
        .toAggregateExpression())
}
