package graft.queries

import graft.core.Tables
import graft.functions.VectorExpressions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation / scoring / merge operators over the events + embeddings
  * tables (SURVEY.md §2.4 A6/A7/A10/A11, §2.6 T4, §2.8 M7-M10).
  *
  * All time arithmetic is anchored to max(ts) (not wall-clock) and truncated
  * to whole seconds, so results are deterministic and oracle-checkable.
  */
object AggQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The streaming_histogram row's binning — ONE definition shared with
    * its oracle generator ([[graft.operators.HistogramSketch
    * .HistogramSpec.binSql]]) so the bin arithmetic cannot drift. */
  private val histRowSpec =
    graft.operators.HistogramSketch.HistogramSpec(0.0, 1000.0, 2000)

  val queries: Map[String, Q] = Map(
    // HLL++ sketch distinct counts per source: at 100 TB the exact
    // count(DISTINCT fingerprint) per domain shuffles every fingerprint;
    // the sketch is fixed-size, mergeable, one map pass. The row computes
    // BOTH and gates the estimate against the exact count at the
    // documented 5% bound (HLL++ at rsd 0.02 is sparse-mode exact at
    // these cardinalities, so the verdict is deterministic); the oracle
    // pins the exact counts and the verdict.
    "sketch_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("source"),
          graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp"))
        .groupBy("source")
        .agg(countDistinct(col("fp")).as("n_exact"),
          approx_count_distinct(col("fp"), 0.02).as("n_approx"))
        .select(col("source"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double")
            / col("n_exact") <= 0.05).as("approx_ok"))
        .orderBy("source")
    }),
    // §2.11 + profiling: the streaming distinct-count fold — the
    // cardinality face of the profiling family (the standing form of
    // sketch_distinct above). Documents staged as 4 micro-batches of
    // content fingerprints; each batch contributes ONE fixed-size HLL
    // sketch, unioned driver-side (the HLL semilattice). The row emits
    // the state's EXACT row counter (pinning exactly-once independently
    // of the sketch: a dropped batch changes n_rows) plus the verdict
    // gating the folded estimate against the DuckDB-exact distinct count
    // at the documented 5% bound (sparse-mode exact at these
    // cardinalities, so the verdict is deterministic).
    "streaming_distinct" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sdis_q_").toString
      try {
        val docs = Tables.load(s, dir, "documents")
        docs.select(graft.functions.TextFunctions
            .contentFingerprint(col("text")).as("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingDistinct.ingest(s, s"$tmp/src",
          s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingDistinct.readState(s, s"$tmp/state")
        val est = st.estimate.getOrElse(0.0)
        docs.agg(
            countDistinct(graft.functions.TextFunctions
              .contentFingerprint(col("text"))).as("n_exact"))
          .select(
            lit(st.nRows).as("n_rows"),
            col("n_exact"),
            (lit(est) - col("n_exact")).cast("double").as("err"))
          .select(col("n_rows"), col("n_exact"),
            (abs(col("err")) / col("n_exact") <= 0.05).as("approx_ok"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the grouped face — one running sketch PER SOURCE; groups never
    // mix, so the flat row's argument applies group-pointwise and the
    // exact per-group row counters pin exactly-once per group
    "streaming_distinct_by_source" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gdis_q_").toString
      try {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("source"), graft.functions.TextFunctions
            .contentFingerprint(col("text")).as("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingGroupedDistinct.ingest(s,
          s"$tmp/src", s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingGroupedDistinct
          .readState(s, s"$tmp/state")
        import s.implicits._
        val folded = st.groups.toSeq.map { case (g, d) =>
          (g, d.nRows, d.estimate.getOrElse(0.0))
        }.toDF("source", "n_rows", "est")
        docs.filter(col("source").isNotNull)
          .groupBy("source")
          .agg(countDistinct(graft.functions.TextFunctions
            .contentFingerprint(col("text"))).as("n_exact"))
          .join(broadcast(folded), Seq("source"), "inner")
          .select(col("source"), col("n_rows"), col("n_exact"),
            (abs(col("est") - col("n_exact")) / col("n_exact") <= 0.05)
              .as("approx_ok"))
          .orderBy("source")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the cardinality face's TIME dimension: the sliding-window distinct
    // fold (the ring design's third instantiation — a ring of per-batch
    // HLL sketches re-unioned per read). Six deterministic micro-batches
    // (doc_id mod 6, mtime-forced order) folded at window=3: the served
    // envelope must describe EXACTLY the last three batches' rows — the
    // exact n_rows counter replays as count(*) over doc_id % 6 >= 3 (an
    // eviction off by one batch changes it and hash-mismatches), and the
    // windowed estimate is gated against the DuckDB-exact distinct count
    // of the same window at the documented 5% bound (the HLL semilattice:
    // the ring union's registers equal the one-shot sketch over the
    // window's rows, so no windowing error stacks on the sketch's own).
    "streaming_windowed_distinct" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_swdis_q_").toString
      try {
        val docs = Tables.load(s, dir, "documents")
        val fp = docs.select(col("doc_id"),
          graft.functions.TextFunctions.contentFingerprint(col("text"))
            .as("value"))
        QueryShapes.stageOrderedBatches(
          (0 until 6).map(b => fp
            .filter(pmod(col("doc_id"), lit(6)) === b)
            .select(col("value"))),
          s"$tmp/src")
        val q = graft.streaming.StreamingWindowedDistinct.ingest(s,
          s"$tmp/src", s"$tmp/state", s"$tmp/chk", window = 3,
          maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingWindowedDistinct
          .readState(s, s"$tmp/state")
        val est = st.estimate.getOrElse(0.0)
        fp.filter(pmod(col("doc_id"), lit(6)) >= 3)
          .agg(countDistinct(col("value")).as("n_exact"))
          .select(lit(st.nRows).as("n_rows"), col("n_exact"),
            (abs(lit(est) - col("n_exact")).cast("double")
              / col("n_exact") <= 0.05).as("approx_ok"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // GK-sketch quantiles gated against the exact percentile: the
    // mergeable sketch is how a 100 TB events table reports latency
    // quantiles without a global sort. The gate is the sketch's OWN
    // guarantee — rank error — not a value band: the estimate (an actual
    // data element) must land between the exact quantiles one rank-percent
    // either side. A value-relative band fails at small group sizes, where
    // the interpolated exact percentile sits between data points the
    // estimate can only ever be one of. Only exact values and the verdict
    // are emitted (the raw estimate is engine-specific).
    "sketch_quantiles" -> ((s, dir) => {
      // The gate is on RANK error directly: the approx estimate is an
      // actual data element, so its rank interval in the group —
      // [#(v < est) + 1, #(v <= est)] — must intersect the target rank
      // window of p +/- 1% widened by ONE order statistic either side.
      // The former value-bracket form (estimate between interpolated
      // p49/p51) silently required >= ~100 rows per group: below that,
      // one rank-percent spans less than one inter-element gap and a
      // rank-correct estimate could land outside the bracket. Counting
      // ranks is group-size-free. Two aggregates: the sketch pass, then
      // the rank count against the (tiny, broadcast) per-group estimates.
      val ev = Tables.load(s, dir, "events").select("event_type", "value")
      val est = ev.groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          percentile(col("value"), lit(0.5)).as("p50e"),
          percentile(col("value"), lit(0.99)).as("p99e"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
          percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99a"))
      def rankOk(est: Column, p: Double): Column = {
        val below = sum(when(col("value") < est, 1L).otherwise(0L))
        val atOrBelow = sum(when(col("value") <= est, 1L).otherwise(0L))
        // n is constant per group (joined in) — first() re-exposes it
        // inside the aggregate. Target: 1-based interpolated rank of
        // quantile p, +/- 1% rank error, widened one element each side
        // so the gate stays meaningful below ~100 rows per group.
        val n = first(col("n")).cast("double")
        val target = lit(1.0) + (n - 1.0) * p
        (below + 1 <= target + n * 0.01 + 1.0) &&
          (atOrBelow >= target - n * 0.01 - 1.0)
      }
      // null-safe join key: a NULL event_type group must keep its row
      // (GROUP BY keeps NULL in both engines; a plain equi-join would
      // silently drop it from the Spark side only)
      ev.join(broadcast(est.withColumnRenamed("event_type", "et")),
          col("event_type") <=> col("et"))
        .groupBy("event_type")
        .agg(
          round(first(col("p50e")), 4).as("p50_exact"),
          round(first(col("p99e")), 4).as("p99_exact"),
          (rankOk(col("p50a"), 0.5) && rankOk(col("p99a"), 0.99)).as("approx_ok"))
        .orderBy("event_type")
    }),
    // §2.11 streaming face of the quantile profile: the events values
    // staged as FOUR arrival files, each its own micro-batch, per-batch
    // EXACT fixed-bin histograms folded by vector addition into one
    // bounded state file, then quantiles interpolated from the folded
    // counts. Unlike the MG fold (whose recount makes it exact), the
    // histogram state needs no recount — it IS the batch histogram of
    // the corpus, so the oracle replays the ENTIRE answer (n, out-of-
    // range counts, and the interpolation arithmetic) from raw events:
    // a dropped batch, a double-applied replay, or a drifted bin
    // boundary hash-mismatches. Rank accounting is exact; value
    // resolution is one 0.5-wide bin. A GK/percentile_approx fold was
    // measured and rejected for this seat (delta saturation — see
    // HistogramSketch scaladoc).
    "streaming_histogram" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_shist_q_").toString
      try {
        Tables.load(s, dir, "events").select(col("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingHistogram.ingest(
          s, s"$tmp/src", s"$tmp/state", s"$tmp/chk", histRowSpec,
          maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingHistogram
          .readState(s, s"$tmp/state")
        val qs = graft.streaming.StreamingHistogram
          .quantilesFromSnapshot(st, Seq(0.5, 0.9, 0.99)).toMap
        // empty corpus: the operator's honest face is "no quantiles"
        // (empty Seq), but the oracle's LEFT JOIN arithmetic yields
        // est=hi for every prob at n=0 — map the empty face to the same
        // convention so the edge compares instead of crashing
        def est(p: Double): Double = qs.getOrElse(p, histRowSpec.hi)
        import s.implicits._
        Seq((st.n, st.underflow, st.overflow, est(0.5), est(0.9), est(0.99)))
          .toDF("n", "underflow", "overflow", "p50", "p90", "p99")
          .select(col("n"), col("underflow"), col("overflow"),
            round(col("p50"), 6).as("p50"), round(col("p90"), 6).as("p90"),
            round(col("p99"), 6).as("p99"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the quantile face's TIME dimension: the sliding-window histogram
    // fold (the ring design — see streaming_windowed_moments). Six
    // deterministic micro-batches (event_id mod 6, file mtimes forced
    // strictly increasing so the file source's timestamp ordering IS
    // the staged order) folded at window=3: the served histogram — n,
    // out-of-range counts, AND the interpolated quantiles — must equal
    // the one-shot answer over exactly the last three batches' rows,
    // which DuckDB replays as WHERE event_id % 6 >= 3 through the same
    // bin/interpolation arithmetic as streaming_histogram.
    "streaming_windowed_histogram" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_swhist_q_").toString
      try {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("value"))
        QueryShapes.stageOrderedBatches(
          (0 until 6).map(b => ev
            .filter(pmod(col("event_id"), lit(6)) === b)
            .select(col("value"))),
          s"$tmp/src")
        val q = graft.streaming.StreamingWindowedHistogram.ingest(
          s, s"$tmp/src", s"$tmp/state", s"$tmp/chk", histRowSpec,
          window = 3, maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingWindowedHistogram
          .readState(s, s"$tmp/state")
        val agg = st.aggregate
        val qs = graft.streaming.StreamingWindowedHistogram
          .quantilesFromSnapshot(st, Seq(0.5, 0.9, 0.99)).toMap
        def est(p: Double): Double = qs.getOrElse(p, histRowSpec.hi)
        import s.implicits._
        Seq((agg.n, agg.underflow, agg.overflow,
            est(0.5), est(0.9), est(0.99)))
          .toDF("n", "underflow", "overflow", "p50", "p90", "p99")
          .select(col("n"), col("underflow"), col("overflow"),
            round(col("p50"), 6).as("p50"), round(col("p90"), 6).as("p90"),
            round(col("p99"), 6).as("p99"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the grouped variant: per-event-type exact histograms folded from
    // the same four staged micro-batches — completing the quantile
    // square (batch flat/grouped, streaming flat/grouped) exactly like
    // the heavy-hitter family. Per batch ONE (group, bin) aggregation
    // re-grouped to a row per group; state bounded by groups x (nBins+2)
    // under a loud maxGroups cap. The oracle replays the whole grouped
    // answer — per-group n, out-of-range counts, interpolated quantiles
    // — from raw events.
    "streaming_hist_by_type" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ghist_q_").toString
      try {
        Tables.load(s, dir, "events").select(col("event_type"), col("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingGroupedHistogram.ingest(
          s, s"$tmp/src", s"$tmp/state", s"$tmp/chk", histRowSpec,
          maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingGroupedHistogram
          .readState(s, s"$tmp/state")
        val qmap = graft.streaming.StreamingGroupedHistogram
          .quantilesFromSnapshot(st, Seq(0.5, 0.9))
          .map { case (g, p, e) => (g, p) -> e }.toMap
        import s.implicits._
        // a folded group always has n >= 1 (null values never enter), so
        // its quantiles exist; getOrElse mirrors the flat row's empty-
        // corpus convention anyway (the oracle's LEFT JOIN yields hi)
        st.groups.toSeq.sortBy(_._1).map { case (g, gh) =>
          (g, gh.n, gh.bins.getOrElse(-1, 0L),
            gh.bins.getOrElse(histRowSpec.nBins, 0L),
            qmap.getOrElse((g, 0.5), histRowSpec.hi),
            qmap.getOrElse((g, 0.9), histRowSpec.hi))
        }.toDF("event_type", "n", "underflow", "overflow", "p50", "p90")
          .select(col("event_type"), col("n"), col("underflow"),
            col("overflow"), round(col("p50"), 6).as("p50"),
            round(col("p90"), 6).as("p90"))
          .orderBy("event_type")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // column-level profile of the documents table — the per-shard data
    // quality report (nulls / distincts / min-max per column). EXACT
    // distincts are the explicit opt-in here (the oracle corpus is
    // bounded and DuckDB's count(DISTINCT) is the natural twin); the
    // DEFAULT sketched mode — the 100 TB path — is pinned by
    // table_profile_approx below
    "table_profile" -> ((s, dir) => {
      graft.operators.Profile.profile(Tables.load(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"),
          exactDistinct = true)
        .orderBy("col_name")
    }),
    // the profiler's DEFAULT (sketched-distinct) mode: one pass of
    // fixed-size HLL++ partials even over the per-row-unique doc_id —
    // the posture that survives 100 TB. The row computes BOTH modes and
    // gates each sketch estimate against the exact count at the
    // documented 5% bound (rsd 0.02, sparse-mode exact at most of these
    // cardinalities, so the verdict is deterministic); the oracle pins
    // the exact counts and the verdict — the sketch_distinct device.
    "table_profile_approx" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val cols = Seq("doc_id", "lang", "source", "n_chars")
      val approx = graft.operators.Profile.profile(docs, cols)
        .select(col("col_name"), col("n"), col("n_null"),
          col("n_distinct").as("n_approx"))
      val exact = graft.operators.Profile
        .profile(docs, cols, exactDistinct = true)
        .select(col("col_name"), col("n_distinct").as("n_exact"))
      approx.join(exact, "col_name")
        .select(col("col_name"), col("n"), col("n_null"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double")
            / col("n_exact") <= 0.05).as("approx_ok"))
        .orderBy("col_name")
    }),
    // A7 age-distribution histogram (hybrid/core.rs:758-820): buckets
    // relative to the newest event
    "age_histogram" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("tss", date_trunc("second", col("ts")))
      val mx = ev.agg(max("tss").as("mx"))
      ev.crossJoin(broadcast(mx))
        .withColumn("age_s", unix_timestamp(col("mx")) - unix_timestamp(col("tss")))
        .withColumn("bucket",
          when(col("age_s") < 3600, "lt_1h")
            .when(col("age_s") < 86400, "lt_1d")
            .when(col("age_s") < 604800, "lt_1w")
            .otherwise("ge_1w"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    }),
    // A11 search-perf percentiles (search_integration.rs:491-552): exact
    // p50/p99 per event_type over `value` as the latency stand-in
    "event_percentiles" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round(avg("value"), 4).as("avg_v"),
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.99)), 4).as("p99"))
        .orderBy("event_type")
    }),
    // M7/M8/M9/M10 scoring pipeline: distance->score, time-decay (half-life
    // 1 day, anchored to max ts), popularity boost, weighted combination
    "scoring" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("tss", date_trunc("second", col("ts")))
      val mx = ev.agg(max("tss").as("mx"))
      ev.crossJoin(broadcast(mx))
        .withColumn("base_r", lit(1.0) / (lit(1.0) + col("value")))
        .withColumn("decay_r",
          pow(lit(0.5),
            (unix_timestamp(col("mx")) - unix_timestamp(col("tss"))).cast("double") / 86400.0))
        .withColumn("boost_r", lit(1.0) + log1p(col("user_id").cast("double")) / 10.0)
        .select(col("event_id"),
          round(col("base_r"), 6).as("base"),
          round(col("decay_r"), 6).as("decay"),
          round(col("boost_r"), 6).as("boost"),
          // combine the unrounded components: rounded ones sit exactly on
          // .5 rounding boundaries and flip between engines
          round(col("base_r") * 0.5 + col("decay_r") * 0.3 + col("boost_r") * 0.2, 6).as("combined"))
        .orderBy("event_id")
    }),
    // Reference-EXACT scoring semantics (search_integration.rs:314-370)
    // made driver-visible: the line-by-line divergences fixed in r11 —
    // future-timestamp clamp, metadata-boost parse fall-through,
    // total-weight normalization, zero-weight fallback — each exercised
    // through the PRODUCTION helpers in VectorFunctions rather than
    // re-inlined arithmetic. The decay anchor sits at the midpoint of the
    // event time range, so about half the rows are "future" and actually
    // hit the age clamp; boost strings are parseable / garbage / absent
    // by user_id residue, so try_cast's fall-through is exercised too.
    "scoring_reference" -> ((s, dir) => {
      import graft.functions.VectorFunctions
      val ev = Tables.load(s, dir, "events")
        .withColumn("tss", date_trunc("second", col("ts")))
      val mid = ev.agg(
        floor((unix_timestamp(min("tss")) + unix_timestamp(max("tss"))) / 2.0)
          .cast("long").cast("timestamp").as("mid"))
      ev.crossJoin(broadcast(mid))
        .withColumn("base_r", VectorFunctions.distanceToScore(col("value")))
        .withColumn("decay_r",
          VectorFunctions.timeDecay(col("tss"), col("mid"), 86400.0))
        .withColumn("pop_r", VectorFunctions.popularityBoost(col("user_id")))
        .withColumn("boost_str",
          when(col("user_id") % 3 === 0, lit("1.5"))
            .when(col("user_id") % 3 === 1, col("event_type")) // unparseable
            .otherwise(lit(null).cast("string")))              // absent
        .select(col("event_id"),
          round(col("decay_r"), 6).as("decay"),
          round(VectorFunctions.boostedScore(col("base_r"), col("boost_str")),
            6).as("boosted"),
          // weights 2/1/1 do NOT sum to 1 — the reference normalizes by
          // the total, so the oracle divides by 4
          round(VectorFunctions.combinedScore(col("base_r"), col("decay_r"),
            col("pop_r"), 2.0, 1.0, 1.0, col("base_r")), 6).as("combined"),
          // all-zero weights resolve to the fallback at plan build
          round(VectorFunctions.combinedScore(col("base_r"), col("decay_r"),
            col("pop_r"), 0.0, 0.0, 0.0, col("base_r")), 6).as("fallback"))
        .orderBy("event_id")
    }),
    // gap-based sessionization (batch form of the stateful streaming op)
    "sessionize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts", date_trunc("second", col("ts")))
      graft.streaming.Sessionize.sessionsBatch(ev.select("user_id", "ts", "value"), 600)
        .select(col("user_id"),
          unix_timestamp(col("session_start")).as("start_s"),
          unix_timestamp(col("session_end")).as("end_s"),
          col("n_events").cast("long").as("n_events"),
          round(col("total_value"), 4).as("total_value"))
        .orderBy("user_id", "start_s")
    }),
    // §2.5 window/ranking: top-3 events by value per event_type — the
    // many-query ranked-output formulation (row_number over partitions)
    "window_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("value").desc, col("event_id").asc)
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("event_type"), col("rn").cast("long").as("rn"),
          col("event_id"), col("value"))
        .orderBy("event_type", "rn")
    }),
    // A10 merge strategies: weighted merge of two ranked sources
    "merge_strategies" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      def source(name: String, parity: Int): DataFrame =
        emb.filter(col("vec_id") % 2 === parity).crossJoin(broadcast(q))
          .select(col("vec_id").as("id"), lit(name).as("source"),
            round(lit(1.0) - vecCosine(col("embedding"), col("q_emb")), 6).as("distance"))
          .withColumn("score", round(lit(1.0) / (lit(1.0) + col("distance")), 6))
          .orderBy(col("distance").asc, col("id").asc).limit(20)
      val results = source("hnsw", 0).unionByName(source("ivf", 1))
      graft.operators.ResultMerger.merge(results,
          graft.operators.ResultMerger.Weighted(Map("hnsw" -> 2.0, "ivf" -> 1.0)))
        .select(col("id"), round(col("score"), 6).as("score"),
          round(col("distance"), 6).as("distance"))
        .orderBy(col("score").desc, col("id").asc).limit(10)
    }),
    // as-of join: attach the latest prior purchase value to every view
    // event per user (temporal alignment, one shuffle via tagged union)
    "asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("tss", date_trunc("second", col("ts")))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("tss"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "tss").agg(max("value").as("pval"))
      graft.operators.AsOfJoin.nearestPrior(views, purchases, "user_id", "tss")
        .select(col("event_id"), col("user_id"), round(col("pval"), 4).as("pval"))
        .orderBy("event_id")
    }),
    // Bucketized range join: every event landing inside each user's
    // first-hour window — interval containment as an equi-join on 15-min
    // buckets + exact re-check (Spark's native plan for a BETWEEN join is
    // a nested loop), reported as per-window match counts
    "range_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts").cast("long").as("t"))
      val windows = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts").cast("long").as("wt"))
        .groupBy("user_id").agg(min("wt").as("lo"))
        .select(col("user_id").as("wu"), col("lo"), (col("lo") + 3600).as("hi"))
      graft.operators.RangeJoin.intervalJoin(ev, windows,
          "t", "lo", "hi", bucketWidth = 900)
        .groupBy(col("wu").as("user_id")).agg(count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),
    // §2.7 set operations: overlap between two queries' top-20 neighbor
    // sets — intersect/except counts (the recall-eval membership shape)
    "set_ops" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      def top20(qid: Int): DataFrame = {
        val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_emb"))
        emb.crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(lit(1.0) - vecCosine(col("embedding"), col("q_emb")), 6).as("d"))
          .orderBy(col("d").asc, col("vec_id").asc).limit(20).select("vec_id")
      }
      val a = top20(0); val b = top20(1)
      val inter = a.intersect(b).count()
      val onlyA = a.except(b).count()
      val uni = a.union(b).distinct().count()
      import s.implicits._
      Seq((inter, onlyA, uni)).toDF("n_intersect", "n_only_a", "n_union")
    }),
    // T4/J5 merge+dedup: union two result sets, keep min-distance per id,
    // global top-10 (SearchResult::deduplicate, types.rs:206-223)
    "merge_dedup" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      def results(qid: Int): DataFrame = {
        val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_emb"))
        emb.crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(lit(1.0) - vecCosine(col("embedding"), col("q_emb")), 6).as("distance"))
          .orderBy(col("distance").asc, col("vec_id").asc).limit(20)
      }
      results(0).unionByName(results(1))
        .groupBy("vec_id").agg(min("distance").as("distance"))
        .orderBy(col("distance").asc, col("vec_id").asc).limit(10)
    }))

  val oracles: Map[String, String] = Map(
    "sketch_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(value, 0.99), 4) AS p99_exact,
        |  true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the windowed fold replayed over exactly the last three staged
    // batches' rows (batch b = event_id % 6 == b, window 3 keeps 3..5)
    // through the SAME bin/interpolation arithmetic
    "streaming_windowed_histogram" ->
      s"""WITH v AS (SELECT value FROM events
         |  WHERE value IS NOT NULL AND event_id % 6 >= 3),
         |b AS (SELECT ${histRowSpec.binSql("value")} AS bin FROM v),
         |c AS (SELECT bin, count(*)::BIGINT AS cnt FROM b GROUP BY bin),
         |tot AS (SELECT count(*)::BIGINT AS n FROM b),
         |uf AS (SELECT coalesce(
         |  (SELECT cnt FROM c WHERE bin = -1), 0)::BIGINT AS u),
         |ov AS (SELECT coalesce(
         |  (SELECT cnt FROM c WHERE bin = ${histRowSpec.nBins}),
         |  0)::BIGINT AS o),
         |cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cume
         |  FROM c WHERE bin >= 0 AND bin < ${histRowSpec.nBins}),
         |probs(p) AS (VALUES (0.5), (0.9), (0.99)),
         |sel AS (SELECT p, bin, cnt, cume FROM probs, tot, uf, cum
         |  WHERE (u + cume - cnt) < (1.0 + (n - 1) * p)
         |    AND (u + cume) >= (1.0 + (n - 1) * p)),
         |q AS (SELECT probs.p AS p,
         |    CASE WHEN (1.0 + (n - 1) * probs.p) <= u THEN ${histRowSpec.lo}
         |         WHEN sel.bin IS NULL THEN ${histRowSpec.hi}
         |         ELSE ${histRowSpec.lo}
         |           + ((${histRowSpec.hi} - ${histRowSpec.lo})
         |              / ${histRowSpec.nBins})
         |           * (sel.bin + ((1.0 + (n - 1) * probs.p)
         |              - (u + sel.cume - sel.cnt)) / sel.cnt)
         |    END AS est
         |  FROM probs LEFT JOIN sel ON probs.p = sel.p, tot, uf)
         |SELECT n, u AS underflow, o AS overflow,
         |  round((SELECT est FROM q WHERE p = 0.5), 6) AS p50,
         |  round((SELECT est FROM q WHERE p = 0.9), 6) AS p90,
         |  round((SELECT est FROM q WHERE p = 0.99), 6) AS p99
         |FROM tot, uf, ov""".stripMargin,
    "streaming_histogram" ->
      s"""WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
         |b AS (SELECT ${histRowSpec.binSql("value")} AS bin FROM v),
         |c AS (SELECT bin, count(*)::BIGINT AS cnt FROM b GROUP BY bin),
         |tot AS (SELECT count(*)::BIGINT AS n FROM b),
         |uf AS (SELECT coalesce(
         |  (SELECT cnt FROM c WHERE bin = -1), 0)::BIGINT AS u),
         |ov AS (SELECT coalesce(
         |  (SELECT cnt FROM c WHERE bin = ${histRowSpec.nBins}),
         |  0)::BIGINT AS o),
         |cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cume
         |  FROM c WHERE bin >= 0 AND bin < ${histRowSpec.nBins}),
         |probs(p) AS (VALUES (0.5), (0.9), (0.99)),
         |sel AS (SELECT p, bin, cnt, cume FROM probs, tot, uf, cum
         |  WHERE (u + cume - cnt) < (1.0 + (n - 1) * p)
         |    AND (u + cume) >= (1.0 + (n - 1) * p)),
         |q AS (SELECT probs.p AS p,
         |    CASE WHEN (1.0 + (n - 1) * probs.p) <= u THEN ${histRowSpec.lo}
         |         WHEN sel.bin IS NULL THEN ${histRowSpec.hi}
         |         ELSE ${histRowSpec.lo}
         |           + ((${histRowSpec.hi} - ${histRowSpec.lo})
         |              / ${histRowSpec.nBins})
         |           * (sel.bin + ((1.0 + (n - 1) * probs.p)
         |              - (u + sel.cume - sel.cnt)) / sel.cnt)
         |    END AS est
         |  FROM probs LEFT JOIN sel ON probs.p = sel.p, tot, uf)
         |SELECT n, u AS underflow, o AS overflow,
         |  round((SELECT est FROM q WHERE p = 0.5), 6) AS p50,
         |  round((SELECT est FROM q WHERE p = 0.9), 6) AS p90,
         |  round((SELECT est FROM q WHERE p = 0.99), 6) AS p99
         |FROM tot, uf, ov""".stripMargin,
    "streaming_hist_by_type" ->
      s"""WITH v AS (SELECT event_type AS g, value FROM events
         |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
         |b AS (SELECT g, ${histRowSpec.binSql("value")} AS bin FROM v),
         |c AS (SELECT g, bin, count(*)::BIGINT AS cnt FROM b GROUP BY g, bin),
         |tot AS (SELECT g, count(*)::BIGINT AS n FROM b GROUP BY g),
         |uo AS (SELECT g,
         |    sum(CASE WHEN bin = -1 THEN cnt ELSE 0 END)::BIGINT AS u,
         |    sum(CASE WHEN bin = ${histRowSpec.nBins} THEN cnt
         |        ELSE 0 END)::BIGINT AS o
         |  FROM c GROUP BY g),
         |cum AS (SELECT g, bin, cnt,
         |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cume
         |  FROM c WHERE bin >= 0 AND bin < ${histRowSpec.nBins}),
         |probs(p) AS (VALUES (0.5), (0.9)),
         |sel AS (SELECT cum.g, probs.p, cum.bin, cum.cnt, cum.cume
         |  FROM probs, tot
         |  JOIN uo ON uo.g = tot.g
         |  JOIN cum ON cum.g = tot.g
         |  WHERE (u + cume - cnt) < (1.0 + (n - 1) * p)
         |    AND (u + cume) >= (1.0 + (n - 1) * p)),
         |q AS (SELECT tot.g, probs.p,
         |    CASE WHEN (1.0 + (n - 1) * probs.p) <= u THEN ${histRowSpec.lo}
         |         WHEN sel.bin IS NULL THEN ${histRowSpec.hi}
         |         ELSE ${histRowSpec.lo}
         |           + ((${histRowSpec.hi} - ${histRowSpec.lo})
         |              / ${histRowSpec.nBins})
         |           * (sel.bin + ((1.0 + (n - 1) * probs.p)
         |              - (u + sel.cume - sel.cnt)) / sel.cnt)
         |    END AS est
         |  FROM probs CROSS JOIN tot
         |  JOIN uo ON uo.g = tot.g
         |  LEFT JOIN sel ON sel.g = tot.g AND sel.p = probs.p)
         |SELECT tot.g AS event_type, tot.n, uo.u AS underflow,
         |  uo.o AS overflow,
         |  round(q50.est, 6) AS p50, round(q90.est, 6) AS p90
         |FROM tot JOIN uo ON uo.g = tot.g
         |JOIN q q50 ON q50.g = tot.g AND q50.p = 0.5
         |JOIN q q90 ON q90.g = tot.g AND q90.p = 0.9
         |ORDER BY event_type""".stripMargin,
    "table_profile" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS col_name, count(*) AS n,
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min, CAST(max(doc_id) AS VARCHAR) AS max
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(*),
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT lang), min(lang), max(lang) FROM documents
        |  UNION ALL
        |  SELECT 'source', count(*),
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT source), min(source), max(source) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(*),
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT n_chars),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |  FROM documents
        |) ORDER BY col_name""".stripMargin,
    // the profiler's default sketched mode: the oracle replays the exact
    // distincts and the verdict is true by the sketch's accuracy at the
    // documented bound (the sketch_distinct device)
    "table_profile_approx" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS col_name, count(*) AS n,
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |    count(DISTINCT doc_id) AS n_exact, true AS approx_ok
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(*),
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT lang), true FROM documents
        |  UNION ALL
        |  SELECT 'source', count(*),
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT source), true FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(*),
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT n_chars), true FROM documents
        |) ORDER BY col_name""".stripMargin,
    "sketch_distinct" ->
      s"""SELECT source,
        |  count(DISTINCT md5(array_to_string(
        |    ${TextQueries.toksSqlOf("text")}, ' '))) AS n_exact,
        |  true AS approx_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // the streaming cardinality fold: the exact row counter replays as
    // count(*) (the exactly-once pin) and the estimate verdict is true
    // by the sketch's sparse-mode exactness at test cardinalities
    "streaming_distinct" ->
      s"""SELECT count(*)::BIGINT AS n_rows,
        |  count(DISTINCT md5(array_to_string(
        |    ${TextQueries.toksSqlOf("text")}, ' '))) AS n_exact,
        |  true AS approx_ok
        |FROM documents""".stripMargin,
    "streaming_distinct_by_source" ->
      s"""SELECT source, count(*)::BIGINT AS n_rows,
        |  count(DISTINCT md5(array_to_string(
        |    ${TextQueries.toksSqlOf("text")}, ' '))) AS n_exact,
        |  true AS approx_ok
        |FROM documents WHERE source IS NOT NULL
        |GROUP BY source ORDER BY source""".stripMargin,
    // the windowed cardinality fold: the exact window envelope replays
    // over exactly the newest window's batches (doc_id mod 6 >= 3 at
    // window 3 of 6 staged batches) and the estimate verdict is true at
    // the documented 5% bound
    "streaming_windowed_distinct" ->
      s"""SELECT count(*)::BIGINT AS n_rows,
        |  count(DISTINCT md5(array_to_string(
        |    ${TextQueries.toksSqlOf("text")}, ' '))) AS n_exact,
        |  true AS approx_ok
        |FROM documents WHERE doc_id % 6 >= 3""".stripMargin,
    "age_histogram" ->
      """WITH ev AS (SELECT date_trunc('second', ts) AS tss FROM events),
        |mx AS (SELECT max(tss) AS mx FROM ev)
        |SELECT CASE
        |    WHEN epoch(mx - tss) < 3600 THEN 'lt_1h'
        |    WHEN epoch(mx - tss) < 86400 THEN 'lt_1d'
        |    WHEN epoch(mx - tss) < 604800 THEN 'lt_1w'
        |    ELSE 'ge_1w' END AS bucket, count(*) AS cnt
        |FROM ev, mx GROUP BY 1 ORDER BY 1""".stripMargin,
    "event_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(value), 4) AS avg_v,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "scoring" ->
      """WITH mx AS (SELECT max(date_trunc('second', ts)) AS mx FROM events)
        |SELECT event_id,
        |  round(1.0 / (1.0 + value), 6) AS base,
        |  round(pow(0.5, epoch(mx - date_trunc('second', ts)) / 86400.0), 6) AS decay,
        |  round(1.0 + ln(1.0 + user_id) / 10.0, 6) AS boost,
        |  round(1.0 / (1.0 + value) * 0.5
        |      + pow(0.5, epoch(mx - date_trunc('second', ts)) / 86400.0) * 0.3
        |      + (1.0 + ln(1.0 + user_id) / 10.0) * 0.2, 6) AS combined
        |FROM events, mx ORDER BY event_id""".stripMargin,
    "scoring_reference" ->
      """WITH ev AS (SELECT *, date_trunc('second', ts) AS tss FROM events),
        |mid AS (SELECT to_timestamp(CAST(floor(
        |    (epoch(min(tss)) + epoch(max(tss))) / 2.0) AS BIGINT)) AS mid
        |  FROM ev),
        |sc AS (
        |  SELECT event_id,
        |    1.0 / (1.0 + value) AS base_r,
        |    pow(0.5, greatest(0.0, epoch(mid - tss)) / 86400.0) AS decay_r,
        |    1.0 + ln(1.0 + user_id) / 10.0 AS pop_r,
        |    CASE WHEN user_id % 3 = 0 THEN '1.5'
        |         WHEN user_id % 3 = 1 THEN event_type
        |         ELSE NULL END AS boost_str
        |  FROM ev, mid)
        |SELECT event_id,
        |  round(decay_r, 6) AS decay,
        |  round(base_r * coalesce(
        |    CAST(TRY_CAST(boost_str AS REAL) AS DOUBLE), 1.0), 6) AS boosted,
        |  round((base_r * 2.0 + decay_r * 1.0 + pop_r * 1.0) / 4.0, 6) AS combined,
        |  round(base_r, 6) AS fallback
        |FROM sc ORDER BY event_id""".stripMargin,
    "asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, value,
        |    date_trunc('second', ts) AS tss FROM events),
        |v AS (SELECT user_id, tss, event_id FROM ev WHERE event_type = 'view'),
        |p AS (SELECT user_id, tss, max(value) AS pval FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT v.event_id, v.user_id, round(p.pval, 4) AS pval
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.user_id AND v.tss >= p.tss
        |ORDER BY v.event_id""".stripMargin,
    "range_join" ->
      """WITH e AS (SELECT event_id, floor(epoch(ts))::BIGINT AS t FROM events),
        |u AS (SELECT user_id, floor(epoch(ts))::BIGINT AS wt FROM events),
        |w AS (SELECT user_id, min(wt) AS lo, min(wt) + 3600 AS hi
        |  FROM u GROUP BY 1)
        |SELECT w.user_id, count(*) AS n_events
        |FROM w JOIN e ON e.t >= w.lo AND e.t <= w.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "set_ops" ->
      """WITH qa AS (
        |  SELECT e.vec_id FROM embeddings e,
        |    (SELECT embedding::DOUBLE[] qe FROM embeddings WHERE vec_id = 0) q
        |  ORDER BY round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) ASC,
        |    e.vec_id ASC LIMIT 20),
        |qb AS (
        |  SELECT e.vec_id FROM embeddings e,
        |    (SELECT embedding::DOUBLE[] qe FROM embeddings WHERE vec_id = 1) q
        |  ORDER BY round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) ASC,
        |    e.vec_id ASC LIMIT 20)
        |SELECT
        |  (SELECT count(*) FROM (SELECT * FROM qa INTERSECT SELECT * FROM qb)) AS n_intersect,
        |  (SELECT count(*) FROM (SELECT * FROM qa EXCEPT SELECT * FROM qb)) AS n_only_a,
        |  (SELECT count(*) FROM (SELECT * FROM qa UNION SELECT * FROM qb)) AS n_union""".stripMargin,
    "sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts, value FROM events),
        |g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch(ts - lag(ts) OVER w) > 600 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g)
        |SELECT user_id, epoch(min(ts))::BIGINT AS start_s,
        |  epoch(max(ts))::BIGINT AS end_s, count(*) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, start_s""".stripMargin,
    "window_rank" ->
      """SELECT event_type, rn, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
    "merge_strategies" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |h AS (
        |  SELECT e.vec_id AS id, 'hnsw' AS source,
        |    round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS distance
        |  FROM embeddings e, q WHERE e.vec_id % 2 = 0
        |  ORDER BY distance ASC, id ASC LIMIT 20),
        |v AS (
        |  SELECT e.vec_id AS id, 'ivf' AS source,
        |    round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS distance
        |  FROM embeddings e, q WHERE e.vec_id % 2 = 1
        |  ORDER BY distance ASC, id ASC LIMIT 20),
        |u AS (
        |  SELECT *, round(1.0 / (1.0 + distance), 6) AS score,
        |    CASE source WHEN 'hnsw' THEN 2.0 ELSE 1.0 END AS w
        |  FROM (SELECT * FROM h UNION ALL SELECT * FROM v))
        |SELECT id, round(sum(score * w) / sum(w), 6) AS score,
        |  round(sum(distance * w) / sum(w), 6) AS distance
        |FROM u GROUP BY id ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "merge_dedup" ->
      """WITH r0 AS (
        |  SELECT e.vec_id,
        |    round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS distance
        |  FROM embeddings e, (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) q
        |  ORDER BY distance ASC, e.vec_id ASC LIMIT 20),
        |r1 AS (
        |  SELECT e.vec_id,
        |    round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS distance
        |  FROM embeddings e, (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 1) q
        |  ORDER BY distance ASC, e.vec_id ASC LIMIT 20),
        |u AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1)
        |SELECT vec_id, min(distance) AS distance FROM u
        |GROUP BY vec_id ORDER BY distance ASC, vec_id ASC LIMIT 10""".stripMargin)
}
