package graft.streaming

import graft.store.VectorStore

/** X16 migration scheduling policy
  * (`/root/reference/src/hybrid/maintenance.rs:40-44,286-475`): a bounded,
  * calendar-aware maintenance slice instead of "migrate everything now".
  *
  *  - `maxVectorsPerRun`: cap per run (oldest rows first; remainder waits)
  *  - `batchSize`: accounting granularity — `batchesProcessed` in the run
  *    result is ceil(migrated / batchSize); the actual write chunking is
  *    the store's `chunkSize` (parquet maxRecordsPerFile), which is the
  *    Spark-native meaning of "process in batches"
  *  - `quietHours`: (startHour, endHour) ranges, END-EXCLUSIVE, during
  *    which runs are skipped entirely; (22, 2) wraps midnight. Hours are
  *    read from the run's `now` in UTC (the engine's session timezone)
  *  - `checkIntervalBatches`: the reference's `check_interval` translated
  *    to Structured Streaming cadence — run every N micro-batches (the
  *    trigger loop owns wall-clock timing)
  *  - `refreshCodeTiers`: after a run that migrated rows, delta-encode the
  *    new historical rows into any enabled PQ/OPQ/SQ/BQ code table
  *    (`refreshPq`/`refreshOpq`/`refreshSq`/`refreshBq`) so continuous ingest keeps the serving
  *    artifacts fresh — one bounded pass per run (the delta is at most
  *    `maxVectorsPerRun` rows), never a tier re-encode
  *  - `rebuildRecentIndex`: `migrate` invalidates the saved recent-tier
  *    HNSW (it rewrote the tier); with this flag the scheduler rebuilds
  *    it with the params it was originally built with (persisted in the
  *    index's meta.json), so a background migration never leaves
  *    mode=recent_index serving hard-failing until manual repair. The
  *    rebuild covers the post-migration recent tier, which the run just
  *    drained — the cheap end of the build cost
  *  - `autoRebalance` (the reference's `AutoRebalanceConfig.rebalance_ivf`,
  *    `hybrid/maintenance.rs:100-113,509-529`): after the migration slice,
  *    probe the historical tier's cluster sizes (one small aggregate); if
  *    at least `minVectorsForRebalance` rows live there AND the largest
  *    cluster exceeds `imbalanceThreshold` x the average, run
  *    `store.rebalance` capped at ceil(avg x rebalanceTargetFactor) — so a
  *    store under skewed ingest recovers probe selectivity on policy
  *    instead of waiting for an operator to remember the admin route.
  *    Rebalance invalidates the PQ/SQ code tables (rows changed cluster);
  *    the scheduler re-encodes whichever tiers were enabled
  *    (`enablePq(retrain = false)` / `enableSq`), keeping serving whole.
  *  - `opqRetrainAtRatio` (opt-in, r16): after the slice (and any
  *    rebalance re-encode), probe [[VectorStore.opqRotationDrift]] — the
  *    fresh/train reconstruction-MSE ratio under the saved rotation — and
  *    when it reaches the threshold, re-train the OPQ tier via
  *    [[VectorStore.retrainOpq]] (the model's OWN persisted shape, full
  *    re-encode, baseline reset), so a long-running ingest whose corpus
  *    drifts away from the training-time distribution recovers the
  *    tier's recall edge on policy instead of waiting for an operator to
  *    read the integrity warning. Default off: retrain is a full-tier
  *    re-encode, an operator decision by default
  *    ([[VectorStore.OpqStaleRatioAlert]] is the documented advisory
  *    threshold to start from).
  */
case class MigrationPolicy(
    maxVectorsPerRun: Int = 1000,
    batchSize: Int = 100,
    quietHours: Seq[(Int, Int)] = Nil,
    checkIntervalBatches: Int = 1,
    refreshCodeTiers: Boolean = true,
    rebuildRecentIndex: Boolean = true,
    autoRebalance: Boolean = false,
    imbalanceThreshold: Double = 2.0,
    minVectorsForRebalance: Long = 1000L,
    rebalanceTargetFactor: Double = 1.0,
    opqRetrainAtRatio: Option[Double] = None) {
  require(maxVectorsPerRun > 0, "maxVectorsPerRun must be positive")
  require(batchSize > 0, "batchSize must be positive")
  require(checkIntervalBatches > 0, "checkIntervalBatches must be positive")
  require(quietHours.forall { case (s, e) =>
    s >= 0 && s < 24 && e >= 0 && e < 24 }, "quiet hours must be 0-23")
  require(imbalanceThreshold > 1.0, "imbalanceThreshold must exceed 1.0")
  require(minVectorsForRebalance >= 0, "minVectorsForRebalance must be >= 0")
  require(rebalanceTargetFactor >= 1.0, "rebalanceTargetFactor must be >= 1.0")
  // a ratio <= 1.0 would retrain on EVERY run (fresh error never beats the
  // training baseline by construction) — a misconfiguration, refuse loudly
  require(opqRetrainAtRatio.forall(_ > 1.0),
    "opqRetrainAtRatio must exceed 1.0")
}

case class MigrationRunResult(vectorsMigrated: Long, batchesProcessed: Long,
    skippedQuietHours: Boolean, vectorsRebalanced: Long = 0L,
    opqRetrained: Boolean = false)

/** The reference `MigrationStatistics` field set
  * (`hybrid/maintenance.rs:61-68`): running totals plus two running
  * averages. `avgDurationMs` uses the reference's incremental update
  * (`:405-407`) over per-run wall time with its min-1ms floor
  * (`:394-398` — a sub-millisecond run still counts as 1 ms, so the
  * average can never read 0 after a run has happened). */
case class MigrationStatistics(totalVectorsMigrated: Long, totalRuns: Long,
    avgVectorsPerRun: Double, avgDurationMs: Double,
    lastRunEpochMs: Option[Long])

/** Driver-side scheduler state around [[VectorStore.migrate]] — the
  * reference's `MigrationScheduler` with the tokio loop replaced by
  * whatever cadence the caller owns (a streaming `foreachBatch`, a cron,
  * a REST admin route). Thread-safe; a skipped (quiet-hours) run does not
  * count toward statistics, matching "migration is paused". */
class MigrationScheduler(store: VectorStore,
    @volatile var policy: MigrationPolicy = MigrationPolicy()) {

  private var stats = MigrationStatistics(0L, 0L, 0.0, 0.0, None)

  def statistics: MigrationStatistics = synchronized(stats)

  /** Is `hour` inside any quiet range? End-exclusive; wrapping ranges
    * ((22, 2)) cover [start, 24) ∪ [0, end). An empty range list means
    * never quiet; (h, h) denotes a degenerate empty range. */
  def inQuietHours(hour: Int): Boolean = policy.quietHours.exists {
    case (s, e) if s == e => false
    case (s, e) if s < e => hour >= s && hour < e
    case (s, e) => hour >= s || hour < e
  }

  def runMigration(
      nowOverride: Option[java.sql.Timestamp] = None): MigrationRunResult = {
    val now = nowOverride.getOrElse(
      new java.sql.Timestamp(System.currentTimeMillis()))
    val hour = now.toInstant.atZone(java.time.ZoneOffset.UTC).getHour
    if (inQuietHours(hour)) MigrationRunResult(0L, 0L, skippedQuietHours = true)
    else {
      val t0 = System.nanoTime()
      val p = policy
      val indexParams =
        if (p.rebuildRecentIndex) store.recentIndexBuildParams else None
      val n = store.migrate(Some(now), maxVectors = p.maxVectorsPerRun)
      if (n > 0 && p.refreshCodeTiers) {
        if (store.hasPq) store.refreshPq()
        if (store.hasOpq) store.refreshOpq()
        if (store.hasSq) store.refreshSq()
        if (store.hasBq) store.refreshBq()
      }
      // migrate dropped the recent index it invalidated — restore serving
      if (n > 0) indexParams.foreach { case (ef, m, metric, blobs, routed) =>
        store.buildRecentIndex(ef, m, metric, blobs, routed)
      }
      val moved = if (!p.autoRebalance) 0L else maybeRebalance(p)
      // the drift gate runs AFTER any rebalance re-encode (which used the
      // saved — possibly stale — model): when it trips, retrainOpq learns
      // a fresh rotation with the model's own persisted shape and
      // training params, re-encodes the whole tier, and resets the
      // staleness baseline. Gated on THIS RUN having mutated the tier
      // (migrated or rebalanced rows): the probe is a bounded-sample scan
      // of the historical tier, and a scheduler polling a quiet store
      // would otherwise pay it every few minutes for a ratio that cannot
      // have moved since the last mutation
      val retrained = p.opqRetrainAtRatio.exists { thr =>
        (n > 0 || moved > 0) && store.hasOpq &&
          store.opqRotationDrift().exists(_.ratio >= thr) && {
            store.retrainOpq(); true
          }
      }
      val batches = (n + p.batchSize - 1) / p.batchSize
      // the reference's min-1ms duration floor (maintenance.rs:394-398)
      val durMs = math.max(1.0, (System.nanoTime() - t0) / 1e6)
      synchronized {
        val runs = stats.totalRuns + 1
        stats = MigrationStatistics(
          totalVectorsMigrated = stats.totalVectorsMigrated + n,
          totalRuns = runs,
          avgVectorsPerRun = (stats.totalVectorsMigrated + n).toDouble / runs,
          avgDurationMs =
            (stats.avgDurationMs * (runs - 1) + durMs) / runs,
          lastRunEpochMs = Some(System.currentTimeMillis()))
      }
      MigrationRunResult(n, batches, skippedQuietHours = false,
        vectorsRebalanced = moved, opqRetrained = retrained)
    }
  }

  /** The auto-rebalance leg of a run: probe imbalance, rebalance when the
    * policy triggers, then re-encode whichever code tiers the rebalance
    * invalidated so the serving artifacts never go dark. Returns rows
    * moved (0 = policy did not trigger). */
  private def maybeRebalance(p: MigrationPolicy): Long = {
    store.clusterImbalance() match {
      case Some((total, avg, maxSz))
          if total >= p.minVectorsForRebalance &&
            maxSz > p.imbalanceThreshold * avg =>
        val hadPq = store.hasPq
        val hadOpq = store.hasOpq
        val hadSq = store.hasSq
        val hadBq = store.hasBq
        val cap = math.max(1L, math.ceil(avg * p.rebalanceTargetFactor).toLong)
        val moved = store.rebalance(cap.min(Int.MaxValue).toInt)
        if (moved > 0) {
          // rebalance deleted the stale cluster-partitioned code tables;
          // re-encode from the saved model (PQ) / row-local params (SQ)
          if (hadPq) store.enablePq(retrain = false)
          if (hadOpq) store.enableOpq(retrain = false)
          if (hadSq) store.enableSq()
          if (hadBq) store.enableBq()
        }
        moved
      case _ => 0L
    }
  }
}
