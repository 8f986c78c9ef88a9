package graft.operators

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact heavy hitters at corpus scale, two passes (corpus profiling:
  * frequent tokens/domains/fingerprints over 100 TB without paying a full
  * groupBy over every DISTINCT key):
  *
  *  1. a Misra–Gries summary (fixed k counters per partition, classic MG
  *     decrement-all; partials merge with the standard mergeable-summaries
  *     reduction — add pointwise, subtract the (k+1)-th largest, keep
  *     positives — so the two-phase aggregation preserves the bound).
  *     Guarantee: every item with true count > N/(k+1) SURVIVES as a
  *     candidate; at most k candidates ever exist, so the driver collect
  *     is bounded by construction.
  *  2. an exact recount of the ≤ k candidates (one semi-filtered
  *     aggregation — the shuffle carries only candidate keys).
  *
  * The result is EXACT (candidates are a guaranteed superset of the heavy
  * hitters; the recount removes false positives and replaces MG's lossy
  * counts), which is what makes it oracle-checkable row-for-row. Output
  * deterministic: (cnt desc, item asc).
  *
  * The full-groupBy `token_frequency` query is the small-scale sibling;
  * this is the path whose memory is O(k) per task regardless of key
  * cardinality. MG and the merge rule are textbook algorithms
  * (Misra–Gries 1982; mergeable summaries, Agarwal et al. 2012).
  */
object HeavyHitters {

  /** Mutable MG state: item -> count, at most k entries. */
  final class MgState(val counts: java.util.HashMap[UTF8String, Long])

  /** Misra–Gries candidate aggregate: ARRAY<STRUCT<item STRING, cnt BIGINT>>
    * of at most k entries, (cnt desc, item asc); `cnt` is the MG count (a
    * LOWER bound on the true count, off by at most N/(k+1)). */
  case class MisraGriesAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgState]
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    require(k > 0, "k must be positive")

    override def children: Seq[Expression] = Seq(child)
    // declared input type => a non-string item column fails ANALYSIS with
    // a type error instead of a mid-task executor ClassCastException —
    // this aggregate is a public SQL surface (misra_gries), not just an
    // internal call site that always passes strings
    override def inputTypes = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType), StructField("cnt", LongType))))
    override def prettyName: String = "misra_gries"

    override def createAggregationBuffer(): MgState =
      new MgState(new java.util.HashMap[UTF8String, Long](k * 2))

    override def update(b: MgState, input: InternalRow): MgState = {
      val v = child.eval(input)
      if (v != null) {
        val item = v.asInstanceOf[UTF8String]
        val cur = b.counts.get(item)
        if (cur != 0L || b.counts.containsKey(item)) {
          b.counts.put(item, cur + 1L)
        } else if (b.counts.size() < k) {
          // clone: the UTF8String points into a buffer the scan reuses
          b.counts.put(item.clone(), 1L)
        } else {
          // decrement-all; O(k) but amortized O(1) per input item (each
          // decrement event consumes k+1 prior increments)
          val it = b.counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      b
    }

    override def merge(b: MgState, o: MgState): MgState = {
      HeavyHitters.mgMergeInto(k, b.counts, o.counts)
      b
    }

    override def eval(b: MgState): Any = {
      val entries = new Array[(UTF8String, Long)](b.counts.size())
      var i = 0
      val it = b.counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
      val sorted = entries.sortWith { (a, c) =>
        if (a._2 != c._2) a._2 > c._2 else a._1.compareTo(c._1) < 0
      }
      val rows = new Array[Any](sorted.length)
      i = 0
      while (i < sorted.length) { rows(i) = InternalRow(sorted(i)._1, sorted(i)._2); i += 1 }
      new GenericArrayData(rows)
    }

    override def serialize(b: MgState): Array[Byte] = {
      var bytes = 4
      val sit = b.counts.keySet().iterator()
      while (sit.hasNext) bytes += 12 + sit.next().numBytes()
      val buf = ByteBuffer.allocate(bytes)
      buf.putInt(b.counts.size())
      val it = b.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val kb = e.getKey.getBytes
        buf.putInt(kb.length); buf.put(kb); buf.putLong(e.getValue)
      }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): MgState = {
      val buf = ByteBuffer.wrap(bytes)
      val n = buf.getInt()
      val s = new MgState(new java.util.HashMap[UTF8String, Long](math.max(k * 2, n)))
      var i = 0
      while (i < n) {
        val len = buf.getInt(); val kb = new Array[Byte](len); buf.get(kb)
        s.counts.put(UTF8String.fromBytes(kb), buf.getLong()); i += 1
      }
      s
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MisraGriesAgg =
      copy(child = cs(0))
  }

  /** THE mergeable-summaries reduction (Agarwal et al.), shared by the
    * aggregate's `merge` and the streaming driver-side fold
    * (`StreamingHeavyHitters.mergeMg`) so the two can never drift — the
    * composed error bound both rest on is a property of THIS arithmetic:
    * pointwise add `from` into `into`, then if over k entries subtract
    * the (k+1)-th largest count from every counter and keep positives
    * (still ≤ k entries, error still ≤ N/(k+1)). Mutates `into`. */
  private[graft] def mgMergeInto[K](k: Int,
      into: java.util.HashMap[K, Long],
      from: java.util.HashMap[K, Long]): Unit = {
    val oit = from.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      // get on a missing key unboxes null to 0L (BoxesRunTime), which is
      // exactly the identity wanted here
      val cur: Long = into.get(e.getKey)
      into.put(e.getKey, cur + e.getValue)
    }
    if (into.size() > k) {
      val vals = new Array[Long](into.size())
      var i = 0
      val vit = into.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val it = into.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue - cut <= 0L) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** Column form: MG candidate summary of a string column. */
  def mgCandidates(k: Int)(item: Column): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), k).toAggregateExpression())

  /** Exact heavy hitters of `itemCol` (one string item per row): every item
    * occurring at least ceil(N/denominator) times, with its EXACT count —
    * (item, cnt), cnt desc / item asc. `sketchK` must exceed `denominator`
    * (checked) so the MG guarantee covers the threshold: an item at the
    * threshold has count ≥ N/denominator > N/(sketchK+1) and therefore
    * cannot have been evicted. Pass 1 = one MG aggregation (+ total count
    * in the same job); pass 2 = exact recount of ≤ sketchK candidates. */
  def exact(items: DataFrame, itemCol: String, denominator: Long,
      sketchK: Int = 0): DataFrame = {
    val k = checkedK(sketchK, denominator)
    val pass1 = items
      .agg(mgCandidates(k)(col(itemCol)).as("cand"),
        count(col(itemCol)).as("n"))
      .head() // bounded: one row, ≤ k candidates
    val total = pass1.getLong(1)
    val minCount = math.ceil(total.toDouble / denominator).toLong
    val cands = pass1.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    items
      .filter(if (cands.isEmpty) lit(false) else col(itemCol).isin(cands: _*))
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col(itemCol).asc)
  }

  /** Per-group exact heavy hitters: for every group (source, language,
    * domain bucket…), the items holding ≥ 1/denominator of THAT group's
    * mass, with exact counts — (group, item, cnt), ordered (group asc,
    * cnt desc, item asc). NOTE: pass 1 executes EAGERLY at call time (the
    * `limit(cap+1)` probe below collects up to that many candidate rows
    * on the driver to pick the recount plan) — constructing the returned
    * DataFrame is NOT free, unlike most builders in this package.
    * Same two passes as [[exact]], grouped: pass 1
    * is ONE aggregation producing a ≤ sketchK MG summary per group
    * (memory O(k · groups-per-task)); pass 2 broadcasts the exploded
    * candidate relation (≤ groups × k rows) as a semi-join on
    * (group, item) before the recount, so the count shuffle again
    * carries candidate keys only. Designed for MANY items per group and
    * a bounded number of groups (profiling shape) — with millions of
    * groups the candidate relation itself (≤ groups × k rows) stops
    * being broadcastable, so the recount plan is picked MECHANICALLY:
    * the relation is collected through a `limit(cap + 1)` probe — a
    * broadcast would collect it to the driver anyway, so under the cap
    * this is the same data movement the hinted plan pays, just made
    * explicit (and the collected local relation feeds the broadcast, so
    * pass 1 runs exactly once — no lingering `persist` to leak).
    * Past the cap the probe is discarded and the same join runs
    * UNhinted on (group, item) — the size-estimated shuffle plan, one
    * pass-1 recompute inside the join (the price of the rare
    * giant-relation path, instead of pinning groups × k rows in
    * executor storage for the session's lifetime) — still carrying
    * candidate keys only, never the raw item stream. The cap bounds BOTH
    * the broadcast and the probe's transient driver allocation (they are
    * the same rows — a broadcast materializes on the driver too), so its
    * default is a justifiable broadcast size (~1M rows ≈ low hundreds of
    * MB), not the 8 GB hard cap: past it, the giant-relation path never
    * touches the driver with more than cap + 1 rows. */
  def exactPerGroup(items: DataFrame, groupCol: String, itemCol: String,
      denominator: Long, sketchK: Int = 0,
      broadcastMaxCandidates: Int = 1_000_000): DataFrame = {
    val k = checkedK(sketchK, denominator)
    require(broadcastMaxCandidates > 0 && broadcastMaxCandidates < Int.MaxValue,
      s"broadcastMaxCandidates=$broadcastMaxCandidates out of (0, Int.MaxValue)")
    val candRaw = items
      .groupBy(groupCol)
      .agg(mgCandidates(k)(col(itemCol)).as("cand"),
        count(col(itemCol)).as("n"))
      .select(col(groupCol), explode(col("cand")).as("c"), col("n"))
      .select(col(groupCol), col("c.item").as(itemCol),
        ceil(col("n").cast("double") / denominator).cast("long").as("min_cnt"))
    val probe = candRaw.limit(broadcastMaxCandidates + 1).collect()
    val cands =
      if (probe.length <= broadcastMaxCandidates)
        broadcast(items.sparkSession.createDataFrame(
          java.util.Arrays.asList(probe: _*), candRaw.schema))
      else candRaw
    items
      .join(cands, Seq(groupCol, itemCol), "inner")
      .groupBy(groupCol, itemCol)
      .agg(count(lit(1)).as("cnt"), first(col("min_cnt")).as("min_cnt"))
      .filter(col("cnt") >= col("min_cnt"))
      .select(col(groupCol), col(itemCol), col("cnt"))
      .orderBy(col(groupCol).asc, col("cnt").desc, col(itemCol).asc)
  }

  private[graft] def checkedK(sketchK: Int, denominator: Long): Int = {
    require(denominator > 1, "denominator must exceed 1")
    // derive the default in Long and clamp — 2 * denominator.toInt
    // overflows negative past Int.MaxValue/2 and truncates silently past
    // Int.MaxValue, either way breaking the guarantee message below
    val k = if (sketchK > 0) sketchK
      else math.min(2L * denominator, Int.MaxValue.toLong).toInt
    require(k > denominator,
      s"sketchK=$k does not cover denominator=$denominator: the MG " +
        "guarantee needs k+1 counters per 1/threshold of mass")
    k
  }
}
