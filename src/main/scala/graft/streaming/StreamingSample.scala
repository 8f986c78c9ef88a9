package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.TextFunctions
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** Streaming deterministic bottom-k sample — the sampling face of the
  * streaming profiling family (frequencies: the MG folds; quantiles: the
  * exact-histogram folds; this: a uniform row sample maintained online).
  * A long-lived ingest pipeline keeps a k-row uniform sample of
  * everything folded so far — the standing input for inspection,
  * [[graft.operators.HistogramSketch.fromSample]] auto-binning of a NEW
  * histogram fold, or any bounded-sample training step — without a
  * corpus rescan.
  *
  * No `rand()` anywhere: the priority of a row is the salted id hash
  * ([[TextFunctions.stableHash32]], the [[graft.operators.Curation]]
  * sampling primitive), and the sample IS the k smallest (hash, id)
  * pairs over all DISTINCT ids folded so far. That makes the fold:
  *
  *  - EXACTLY mergeable: bottom-k of a union is the k smallest of the
  *    per-part bottom-ks (a semilattice merge — no error term, unlike a
  *    reservoir, whose merge is approximate, and no RNG state to carry);
  *  - exactly-once-checkable end to end: the folded sample after any
  *    number of micro-batches EQUALS the one-shot batch bottom-k over
  *    the whole corpus, and DuckDB replays that set bit-exactly
  *    (`ORDER BY hash32(id || ':salt'), id LIMIT k`) — a dropped or
  *    double-applied batch cannot change it (idempotent by construction)
  *    but a WRONG one (skipped data) loses exactly its ids;
  *  - uniform over distinct ids: the hash is a fixed random-looking
  *    permutation of the id space, independent of arrival order, batch
  *    boundaries, and duplicates (a re-ingested id carries the same
  *    priority and dedups in the merge).
  *
  * State durability and exactly-once are the family protocol verbatim:
  * one JSON state file through the [[graft.core.SwapStateFile]]
  * tmp+marker swap, (checkpoint, k, salt) bindings refused loudly at
  * stream entry, replay idempotence off the last-applied batch id, loud
  * (never phantom-empty) reads, linearizable [[readStateLocked]] for
  * monitors.
  *
  * 100 TB/day posture: per batch ONE pass — one TakeOrdered over the
  * salted hash (each task keeps its own bottom-k — no shuffle of rows,
  * the driver merges ≤ k per partition) with the nSeen row count
  * observed on the same scan (a CollectMetrics node, not a second
  * action re-reading the batch's files), one ≤ 2k driver merge, one
  * O(k) state file — no per-key state, no growth, at any stream
  * length. */
object StreamingSample {

  /** One sampled row: the salted-hash priority it won with, its id, and
    * the optional carried value (the valueCol payload — e.g. the column
    * a later histogram fold will bin, so
    * [[graft.operators.HistogramSketch.fromSample]] can derive bounds
    * from the sample without touching the corpus). */
  case class SampleEntry(key: Long, id: Long, value: Option[Double])

  /** Folded sample state: the (k, salt) it was folded WITH (the sample
    * is only meaningful relative to both), the checkpoint binding, last
    * applied micro-batch id, exact count of rows folded (duplicates
    * included — the uniformity is over DISTINCT ids; nSeen is the
    * observability counter), and the ≤ k entries sorted by (key, id). */
  case class SampleSnapshot(k: Int, salt: String, checkpoint: String,
      lastBatchId: Long, nSeen: Long, entries: Seq[SampleEntry]) {
    def ids: Seq[Long] = entries.map(_.id)
  }

  private val StateName = "sample_state.json"

  private def stateFile(spark: SparkSession, stateDir: String) =
    new graft.core.SwapStateFile(
      new Path(stateDir, StateName)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      stateDir, StateName, "sample_state.swap.inprogress", "sample state")

  private def emptySnapshot =
    SampleSnapshot(-1, "", "", -1L, 0L, Seq.empty)

  private def parseSnapshot(stateDir: String)(txt: String): SampleSnapshot = {
    val node = new ObjectMapper().readTree(txt)
    if (node.get("k") == null || node.get("salt") == null ||
        node.get("checkpoint") == null)
      throw new IllegalStateException(
        s"sample state file under $stateDir lacks the k/salt/checkpoint " +
          "binding fields — refusing to guess which stream it belongs " +
          "to; re-fold from the source with a fresh state dir")
    val es = Seq.newBuilder[SampleEntry]
    val it = node.get("entries").elements()
    while (it.hasNext) {
      val e = it.next()
      es += SampleEntry(e.get("key").asLong(), e.get("id").asLong(),
        if (e.hasNonNull("value")) Some(e.get("value").asDouble()) else None)
    }
    SampleSnapshot(node.get("k").asInt(), node.get("salt").asText(),
      node.get("checkpoint").asText(), node.get("batch_id").asLong(),
      node.get("n_seen").asLong(), es.result())
  }

  /** Lock-free read ([[graft.core.SwapStateFile.read]] protocol); absent
    * file = empty stream. Monitors on a hot stream should use
    * [[readStateLocked]]. */
  def readState(spark: SparkSession, stateDir: String): SampleSnapshot =
    stateFile(spark, stateDir).read(parseSnapshot(stateDir), emptySnapshot)

  /** Linearizable read under the writer's own swap lock. */
  def readStateLocked(spark: SparkSession,
      stateDir: String): SampleSnapshot =
    stateFile(spark, stateDir)
      .readLocked(parseSnapshot(stateDir), emptySnapshot)

  private def writeState(spark: SparkSession, stateDir: String,
      snap: SampleSnapshot): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("k", snap.k)
    root.put("salt", snap.salt)
    root.put("checkpoint", snap.checkpoint)
    root.put("batch_id", snap.lastBatchId)
    root.put("n_seen", snap.nSeen)
    val arr = root.putArray("entries")
    snap.entries.foreach { e =>
      val n = arr.addObject()
      n.put("key", e.key)
      n.put("id", e.id)
      e.value.foreach(v => n.put("value", v))
    }
    stateFile(spark, stateDir).write(mapper.writeValueAsBytes(root))
  }

  /** The salted-hash priority — ONE definition with the batch sampling
    * primitive (md5-derived, engine-stable): DuckDB replays it as
    * `hash32(id::VARCHAR || ':salt')`. */
  def priority(idCol: org.apache.spark.sql.Column, salt: String) =
    TextFunctions.stableHash32(
      concat(idCol.cast("string"), lit(":" + salt)))

  /** The semilattice merge: k smallest (key, id) over the union, one
    * entry per id (duplicates carry the same key; first-folded value
    * wins — ids are stable identities, not update streams). */
  private[streaming] def mergeBottomK(k: Int, state: Seq[SampleEntry],
      batch: Seq[SampleEntry]): Seq[SampleEntry] = {
    val byId = scala.collection.mutable.LinkedHashMap.empty[Long, SampleEntry]
    (state ++ batch).foreach(e => if (!byId.contains(e.id)) byId.put(e.id, e))
    byId.values.toSeq.sortBy(e => (e.key, e.id)).take(k)
  }

  private[streaming] def checkStateBindings(st: SampleSnapshot,
      stateDir: String, checkpoint: String, k: Int, salt: String): Unit = {
    if (st.lastBatchId < 0L) return
    if (st.checkpoint != checkpoint)
      throw new IllegalStateException(
        s"sample state at $stateDir was folded under checkpoint " +
          s"'${st.checkpoint}' but this stream runs under '$checkpoint' " +
          "— batch ids restart at 0 per checkpoint, so continuing would " +
          "skip new data as replays (or double-count on a rewound " +
          "checkpoint). Use a fresh state dir with a fresh checkpoint")
    if (st.k != k || st.salt != salt)
      throw new IllegalStateException(
        s"sample state at $stateDir was folded with (k=${st.k}, " +
          s"salt='${st.salt}') but this stream uses (k=$k, salt='$salt') " +
          "— the bottom-k set is only meaningful relative to both. Use " +
          "a fresh state dir to change them")
  }

  /** Apply ONE micro-batch of (id[, value]) rows to the persisted state:
    * skip if already applied, else merge the batch's bottom-k in.
    * Package-visible so idempotence and bindings are directly testable. */
  private[streaming] def applyBatch(spark: SparkSession, stateDir: String,
      k: Int, salt: String, checkpoint: String, batch: DataFrame,
      idCol: String, valueCol: Option[String], batchId: Long): SampleSnapshot = {
    val st = readState(spark, stateDir)
    checkStateBindings(st, stateDir, checkpoint, k, salt)
    StreamingHeavyHitters.checkFreshStateVsCheckpoint(st.lastBatchId,
      stateDir, batchId,
      "sample state")
    if (batchId <= st.lastBatchId) st // replayed batch: already folded
    else {
      // nSeen rides the SAME pass as the bottom-k: a CollectMetrics node
      // (Dataset.observe) under the dedup counts every row as it flows
      // through the scan — a separate batch.count() would read each
      // batch's source files twice, doubling the per-batch scan cost the
      // 100 TB/day posture prices at one TakeOrdered
      val nSeenObs = org.apache.spark.sql.Observation()
      val keyed = batch.select(
          priority(col(idCol), salt).as("__key"),
          col(idCol).cast("long").as("__id"),
          valueCol.map(v => col(v).cast("double"))
            .getOrElse(lit(null).cast(DoubleType)).as("__value"))
        .observe(nSeenObs, count(lit(1)).as("n_rows"))
      // dedup by id FIRST: duplicate ids inside one batch would otherwise
      // occupy several of the k bottom slots and the fold could end up
      // holding fewer distinct ids than the batch twin — the equality the
      // family's exactness story rests on. (Duplicates of an id carry the
      // same priority and, by the stable-identity contract, the same
      // value.) NULL ids are excluded — no identity, nothing to sample —
      // though they still count toward nSeen (arrival observability);
      // without the filter a null id would sort FIRST (null key) and
      // permanently occupy a bottom slot, and the state write would
      // crash on the missing long. Then TakeOrderedAndProject: each task
      // keeps its own bottom-k, the driver merges ≤ k rows.
      val bottom = keyed.filter(col("__id").isNotNull)
        .dropDuplicates("__id")
        .orderBy(col("__key"), col("__id")).limit(k)
        .collect()
        .map(r => SampleEntry(r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      val bn = nSeenObs.get("n_rows").asInstanceOf[Long]
      val next = SampleSnapshot(k, salt, checkpoint, batchId,
        st.nSeen + bn, mergeBottomK(k, st.entries, bottom))
      writeState(spark, stateDir, next)
      next
    }
  }

  /** Start the stream: parquet arrivals under `sourceDir` with a LONG
    * `idCol` (and optionally a DOUBLE `valueCol` payload to carry with
    * each sampled id), folded per micro-batch into the bottom-k sample
    * state under `stateDir`. Single-stream-per-state-dir contract,
    * non-atomic-rename refusal AND the conf-gated functional probe at
    * entry, binding checks before any checkpoint WAL — the family's
    * chokepoint discipline verbatim. */
  def ingest(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String, k: Int, salt: String = "sample",
      idCol: String = "doc_id", valueCol: Option[String] = None,
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    require(k > 0, s"sample size k must be positive, got $k")
    val srcSchema = valueCol.foldLeft(
      new StructType().add(idCol, LongType))((s, v) => s.add(v, DoubleType))
    val stateFs = new Path(stateDir, StateName)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.FsCapabilities.assertAtomicRenameAtOpen(stateFs,
      new Path(stateDir), "streaming sample state commit")
    val ckptPath = new Path(checkpointDir)
    val ckptId = ckptPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(ckptPath).toString
    val st0 = readState(spark, stateDir)
    checkStateBindings(st0, stateDir, ckptId, k, salt)
    val reader = spark.readStream.schema(srcSchema)
    val src =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(sourceDir)
      else reader.parquet(sourceDir)
    src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchShuffleTuning.tune(batch)
        applyBatch(spark, stateDir, k, salt, ckptId, batch, idCol,
          valueCol, batchId); ()
      }
      .start()
  }

  /** Cross-cluster merge — the sampling face of
    * [[StreamingMoments.mergeStates]]: combine ≥ 2 independently-folded
    * sample states (one regional ingest each, SAME (k, salt)) into one
    * state under `outDir`. The bottom-k is an exact semilattice (k
    * smallest of a union = k smallest of the per-region bottom-ks), so
    * the merged sample is BIT-IDENTICAL to what one cluster sampling
    * all regions' arrivals would hold — a uniform global sample from
    * per-region O(k) states, no data movement. The merged nSeen is the
    * SUM OF PER-REGION ARRIVALS, not a deduplicated global arrival
    * count: an id arriving in two regions dedups by identity in the
    * ENTRY SET (exactly as re-arrivals dedup within one fold), but the
    * per-region counters cannot know about each other's arrivals, so
    * under cross-region overlap the merged nSeen exceeds what a
    * single-cluster fold of the deduplicated stream would count — read
    * it as total regional ingest volume, never as distinct arrivals
    * (the entry set itself stays exactly the single-cluster bottom-k).
    * Same contract: locked input reads, every input folded, a synthetic
    * `merged:[...]` checkpoint that trips the ingest binding, no
    * clobbering. */
  def mergeStates(spark: SparkSession, inDirs: Seq[String],
      outDir: String): SampleSnapshot = {
    val states = inDirs.map(d => d -> readStateLocked(spark, d))
    val (ckpt, lastId) = StateMerge.guard(spark, "sample state", "global sample",
      inDirs, outDir, states, (s: SampleSnapshot) => s.lastBatchId,
      (s: SampleSnapshot) => s.checkpoint,
      readState(spark, outDir).lastBatchId)
    val bindings = states.map(s => (s._2.k, s._2.salt)).distinct
    if (bindings.size > 1)
      throw new IllegalStateException(
        "mergeStates: inputs fold different (k, salt) bindings " +
          bindings.map(b => s"(k=${b._1}, salt='${b._2}')").mkString(", ") +
          " — bottom-k sets are only comparable under identical " +
          "priorities and budgets; merge only states folded with the " +
          "same (k, salt)")
    val (k, salt) = bindings.head
    val merged = SampleSnapshot(k, salt, ckpt, lastId,
      states.map(_._2.nSeen).sum,
      states.map(_._2.entries).reduce(mergeBottomK(k, _, _)))
    writeState(spark, outDir, merged)
    merged
  }

  /** The folded sample as a (id LONG, value DOUBLE) local relation — the
    * direct feed for [[graft.operators.HistogramSketch.fromSample]] (its
    * bounded collect over ≤ k local rows is trivial) or any
    * bounded-sample step. */
  def toDF(spark: SparkSession, st: SampleSnapshot): DataFrame = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      java.util.Arrays.asList(st.entries.map(e =>
        Row(e.id, e.value.map(Double.box).orNull)): _*),
      new StructType().add("id", LongType).add("value", DoubleType))
  }

  /** The batch twin, for cross-checks: bottom-k over a corpus one-shot —
    * the set the folded state must EQUAL on a drained stream. */
  def batchBottomK(df: DataFrame, k: Int, salt: String = "sample",
      idCol: String = "doc_id", valueCol: Option[String] = None): Seq[SampleEntry] =
    df.select(priority(col(idCol), salt).as("__key"),
        col(idCol).cast("long").as("__id"),
        valueCol.map(v => col(v).cast("double"))
          .getOrElse(lit(null).cast(DoubleType)).as("__value"))
      .filter(col("__id").isNotNull) // same null-id exclusion as the fold
      .dropDuplicates("__id") // same distinct-ids rule as the fold
      .orderBy(col("__key"), col("__id")).limit(k).collect()
      .map(r => SampleEntry(r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
}
