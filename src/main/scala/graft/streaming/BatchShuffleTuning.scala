package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive shuffle sizing for `foreachBatch` bodies.
  *
  * Spark disables AQE under streaming, so every per-batch grouped
  * aggregate or join shuffles into the session's FULL
  * `spark.sql.shuffle.partitions` — a constant tuned for the whole
  * corpus, not for one micro-batch. A 4-file micro-batch folding into a
  * 32-partition exchange pays ~30 near-empty reduce tasks of pure
  * scheduling overhead per batch (guide §2.2: fewer, larger reduce
  * partitions; §2.5: partitioning must be scale-adaptive, not a
  * constant); a 100 GB batch on a real cluster still needs hundreds.
  *
  * This is the AQE-coalescing analog for the streaming path: derive the
  * batch's post-shuffle partition count from the batch's actual INPUT
  * BYTES at the same advisory size AQE uses (64 MB per partition),
  * clamped to the session's configured value so a large batch behaves
  * exactly as before. Structured Streaming runs every micro-batch on a
  * CLONED SparkSession (`StreamExecution.sparkSessionForStream`), so the
  * setting is scoped to this one stream — concurrent streams and the
  * batch side of the application are untouched; a defensive identity
  * check skips the tuning entirely if the runtime ever hands the batch
  * the shared (non-cloned) session.
  *
  * Exactness is unaffected by reducer count everywhere this is applied:
  * the folds' per-batch aggregates are integer/decimal counters, min/max,
  * order-insensitive sketch merges (HLL register max, MG counter adds)
  * and deterministic bottom-k selections — none depend on aggregation
  * order.
  */
object BatchShuffleTuning {
  /** AQE's `advisoryPartitionSizeInBytes` default — one post-shuffle
    * partition per 64 MB of batch input. */
  private val AdvisoryBytes = 64L << 20
  private val OrigKey = "graft.streaming.origShufflePartitions"

  /** Set the stream session's shuffle partition count for THIS batch from
    * the batch's input size. Never raises it above the session's original
    * configured value; never throws (a tuning probe must not fail a
    * batch). Call at `foreachBatch` entry, before the first action. */
  def tune(batch: DataFrame): Unit = {
    try {
      val ss = batch.sparkSession
      // operational kill switch + A/B measurement surface (set it on the
      // session that STARTS the stream; the micro-batch clone inherits it)
      if (ss.conf.get("spark.graft.streaming.batchShuffleTuning.enabled",
          "true") == "false") return
      // the micro-batch session is a clone; if it is ever a SHARED session
      // (API change, direct batch-mode call, a caller-built newSession()
      // handed in as the active one), leave it alone — mutating shared
      // conf from inside a batch body is not this helper's contract. The
      // default-session check alone misses non-default shared sessions,
      // so the active session is checked too.
      if (SparkSession.getDefaultSession.exists(_ eq ss) ||
          SparkSession.getActiveSession.exists(_ eq ss)) return
      val orig = ss.conf.getOption(OrigKey).map(_.toInt).getOrElse {
        val v = ss.conf.get("spark.sql.shuffle.partitions").toInt
        ss.conf.set(OrigKey, v.toString)
        v
      }
      // input-partition count as the size proxy: the scan's split planning
      // already packed the batch's files into `spark.sql.files.
      // maxPartitionBytes`-sized partitions, so the partition count IS a
      // bytes-derived measure — and reading it off the planned RDD costs
      // planning only, no job and no extra file-listing round
      val inParts = batch.queryExecution.toRdd.getNumPartitions
      val target = math.max(1, math.min(orig, inParts))
      ss.conf.set("spark.sql.shuffle.partitions", target.toString)
    } catch { case _: Exception => () }
  }
}
