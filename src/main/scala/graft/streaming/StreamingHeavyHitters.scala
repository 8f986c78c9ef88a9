package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.FsSwap
import graft.operators.HeavyHitters
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streaming heavy hitters: a per-micro-batch Misra–Gries update folded
  * into ONE compacted candidate state, so a long-lived ingest pipeline can
  * expose running frequent-token stats without ever holding more than k
  * counters — the streaming face of [[HeavyHitters.exact]]'s pass 1.
  *
  * Per micro-batch: one MG aggregation over the batch's tokens (the same
  * `misra_gries` TypedImperativeAggregate as the batch operator — O(k)
  * per task), then a DRIVER-side merge of that ≤ k-entry batch summary
  * into the persisted state using the identical mergeable-summaries
  * reduction as the aggregate's own merge (pointwise add, subtract the
  * (k+1)-th largest, keep positives — Agarwal et al.'s bound composes, so
  * the folded state's error stays ≤ N/(k+1) over the whole stream). The
  * state is therefore BOUNDED at ≤ k entries BY CONSTRUCTION no matter
  * how many batches run — there is nothing to compact, ever.
  *
  * State durability: one JSON file (`mg_state.json`: last applied batch
  * id, total item count, the ≤ k counters) rewritten per batch through
  * [[FsSwap.commit]]'s tmp+marker protocol. Exactly-once under restarts:
  * the state carries the LAST APPLIED batch id, and a replayed micro-batch
  * (crash between the state install and the checkpoint commit) is skipped
  * when its id is ≤ that — the same idempotence rule as any
  * foreachBatch-with-external-state sink. A crash BEFORE the state
  * install simply replays the batch against the old state.
  *
  * The final answer is exact, not approximate: [[heavyHittersFromState]]
  * recounts the folded candidates over the corpus (the batch operator's
  * pass 2) — with k > denominator the MG guarantee says no true heavy
  * hitter was ever evicted from the folded state, so the recount equals
  * the batch [[HeavyHitters.exact]] on the same corpus
  * (StreamingHeavyHittersSpec asserts the equality over a 50-batch run).
  *
  * 100 TB posture: per batch one token scan (O(k) per task) + one ≤ 2k
  * driver merge + one tiny file write; state never grows; the exact
  * recount is on-demand and candidate-only. */
object StreamingHeavyHitters {

  /** Folded MG state: last applied micro-batch id, total token count,
    * item -> folded MG count (≤ k entries, each a lower bound off by at
    * most n/(k+1)). */
  case class MgSnapshot(lastBatchId: Long, n: Long, counts: Map[String, Long])

  private def statePath(stateDir: String) = new Path(stateDir, "mg_state.json")
  private def stateTmp(stateDir: String) = new Path(stateDir, "mg_state.json_tmp")
  private def stateMarker(stateDir: String) =
    new Path(stateDir, "mg_state.swap.inprogress")

  /** Read the persisted state; an absent file is the empty stream. A
    * reader may COMPLETE a crashed writer's marker-evidenced swap here
    * (unlike `acceptedStateFileCount`, which stays swap-neutral): the
    * FsSwap contract makes recovery safe from any number of concurrent
    * callers (lock-serialized), and a monitoring read that returned the
    * pre-crash state forever would be worse than one that finishes the
    * evidenced install. */
  def readState(spark: SparkSession, stateDir: String): MgSnapshot = {
    val p = statePath(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    FsSwap.recover(fs, p, stateTmp(stateDir), stateMarker(stateDir))
    if (!fs.exists(p)) MgSnapshot(-1L, 0L, Map.empty)
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val node = new ObjectMapper().readTree(txt)
      val counts = scala.collection.mutable.Map.empty[String, Long]
      val it = node.get("counts").fields()
      while (it.hasNext) { val e = it.next(); counts.put(e.getKey, e.getValue.asLong()) }
      MgSnapshot(node.get("batch_id").asLong(), node.get("n").asLong(),
        counts.toMap)
    }
  }

  private def writeState(fs: FileSystem, stateDir: String,
      snap: MgSnapshot): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("batch_id", snap.lastBatchId)
    root.put("n", snap.n)
    val c = root.putObject("counts")
    snap.counts.foreach { case (item, cnt) => c.put(item, cnt) }
    val tmp = stateTmp(stateDir)
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    FsSwap.commit(fs, statePath(stateDir), tmp, stateMarker(stateDir))
  }

  /** The aggregate's mergeable-summaries reduction, driver-side over the
    * ≤ k persisted counters and a ≤ k batch summary: pointwise add, then
    * if over k entries subtract the (k+1)-th largest count from every
    * counter and keep positives. Identical arithmetic to
    * [[HeavyHitters.MisraGriesAgg.merge]], so the composed bound holds. */
  private[streaming] def mergeMg(k: Int, state: Map[String, Long],
      batch: Seq[(String, Long)]): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long] ++ state
    batch.foreach { case (item, cnt) =>
      m.update(item, m.getOrElse(item, 0L) + cnt) }
    if (m.size <= k) m.toMap
    else {
      val vals = m.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1))
      m.iterator.map { case (item, v) => (item, v - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Apply ONE micro-batch of (doc_id, text) rows to the persisted state:
    * skip if already applied (replay after a crash between state install
    * and checkpoint commit), else fold the batch's MG summary in. Package-
    * visible so the idempotence rule is directly testable. Returns the
    * state now in effect. */
  private[streaming] def applyBatch(spark: SparkSession, stateDir: String,
      k: Int, batch: DataFrame, batchId: Long): MgSnapshot = {
    val st = readState(spark, stateDir)
    if (batchId <= st.lastBatchId) st // replayed batch: already folded
    else {
      val row = batch
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token"))
        .agg(HeavyHitters.mgCandidates(k)(col("token")).as("cand"),
          count(col("token")).as("n"))
        .head() // bounded: one row, ≤ k candidates
      val bn = row.getLong(1)
      val bc = row.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
      val next = MgSnapshot(batchId, st.n + bn, mergeMg(k, st.counts, bc))
      val fs = statePath(stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      writeState(fs, stateDir, next)
      next
    }
  }

  /** Start the stream: parquet (doc_id, text) arrivals under `sourceDir`,
    * folded per micro-batch into the MG state under `stateDir`. Same
    * single-stream contract as [[Streaming.dedupIngest]]: one live stream
    * per state dir. `sketchK` defaults to 2 × denominator (and must
    * exceed `denominator` — the guarantee [[heavyHittersFromState]]'s
    * exactness rests on). */
  def ingest(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String, denominator: Long, sketchK: Int = 0,
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val k = HeavyHitters.checkedK(sketchK, denominator)
    val srcSchema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    // finish any state swap a previous process died inside, BEFORE the
    // stream starts (an empty source must still leave the state readable)
    readState(spark, stateDir)
    val reader = spark.readStream.schema(srcSchema)
    val src =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(sourceDir)
      else reader.parquet(sourceDir)
    src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, stateDir, k, batch, batchId); ()
      }
      .start()
  }

  /** Exact heavy hitters from the folded state: recount the ≤ k candidates
    * over `items` (the stream's full corpus) and keep those at
    * ≥ ceil(N/denominator), N from the state's own mass tracking — the
    * batch operator's pass 2 driven by the stream's pass 1. With the
    * ingest's k > denominator this EQUALS [[HeavyHitters.exact]] on the
    * same corpus: the folded state's error ≤ N/(k+1) < N/denominator, so
    * no true heavy hitter was evicted, and the recount is exact. */
  def heavyHittersFromState(spark: SparkSession, stateDir: String,
      items: DataFrame, itemCol: String, denominator: Long): DataFrame = {
    val st = readState(spark, stateDir)
    val minCount = math.ceil(st.n.toDouble / denominator).toLong
    val cands = st.counts.keys.toSeq
    items
      .filter(if (cands.isEmpty) lit(false) else col(itemCol).isin(cands: _*))
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col(itemCol).asc)
  }
}
