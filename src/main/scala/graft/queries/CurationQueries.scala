package graft.queries

import graft.core.Tables
import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation queries over the documents table — deterministic
  * splits, mixture sampling, eval decontamination, sequence packing —
  * each oracle-checked against DuckDB via the shared md5 hash primitive.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  // ONE tokenization/hash definition, shared with TextQueries (writer and
  // oracle sides must never diverge — a private copy here once drifted one
  // edge-rule fix behind)
  import TextQueries.{toksSql, hash32}
  // the Curation.bucket primitive in DuckDB terms; the operators default
  // to distinct salts so split and sampling decisions decorrelate
  private def bucketSql(salt: String) =
    s"${hash32(s"doc_id::VARCHAR || ':$salt'")} % 10000"

  val queries: Map[String, Q] = Map(
    // deterministic train/val/test assignment; the funnel is reported as
    // per-split doc/token counts
    "hash_split" -> ((s, dir) => {
      Curation.hashSplit(Tables.load(s, dir, "documents"),
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
        .orderBy("split")
    }),
    // leakage-safe split: the assignment hashes the near-dup CLUSTER key
    // (transitive MinHash/LSH component representative), so duplicate
    // twins can never straddle train/eval. The oracle replays the WHOLE
    // derivation — shingles, MinHash signatures, banding, Jaccard verify,
    // recursive transitive closure, the component-keyed hash bucket, and
    // the split CASE — so a single doc split apart from its cluster
    // changes a checksum. n_keys (distinct split keys per side) pins the
    // cluster-collapse itself, not just the membership.
    "leakage_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = graft.operators.Dedup.minhashLshPairs(docs,
        shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3)
      Curation.leakageSafeSplit(docs, pairs,
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_checksum"),
          countDistinct(col("split_key")).as("n_keys"))
        .orderBy("split")
    }),
    // §2.11 + sampling: the streaming deterministic bottom-k sample fold
    // — documents staged as 4 micro-batches, the k smallest salted-hash
    // priorities folded through SwapStateFile state. The fold is an
    // exact semilattice merge (no reservoir error, no RNG state), so the
    // result is a deterministic FUNCTION of the corpus that DuckDB
    // replays bit-exactly: ORDER BY hash32(id || ':sample'), id LIMIT k.
    // A dropped batch loses exactly its ids; a double-applied one
    // changes nothing — which is why rows+hash compare IS the
    // exactly-once check.
    "streaming_sample" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ssample_q_").toString
      try {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").cast("double").as("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingSample.ingest(s, s"$tmp/src",
          s"$tmp/state", s"$tmp/chk", k = 32, valueCol = Some("value"),
          maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingSample.readState(s, s"$tmp/state")
        // through the ONE state->relation definition (toDF), which
        // carries a null value as SQL NULL — matching what the oracle's
        // replay would produce for a null-valued doc, instead of an
        // opaque NoSuchElementException from Option.get
        graft.streaming.StreamingSample.toDF(s, st)
          .select(col("id").as("doc_id"), col("value"))
          .orderBy("doc_id")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the grouped face of the sample fold — one bottom-k PER SOURCE,
    // folded per micro-batch through the imperative per-group aggregate
    // and the shared mergeBottomK. Groups never mix, so the flat row's
    // exactness argument applies group-pointwise and DuckDB replays
    // EVERY group's sample (ids, priorities' order, and carried values)
    // via a window rank over the same salted hash — a wrong per-group
    // merge, a dropped group, or a value misattributed across groups
    // hash-mismatches.
    "streaming_sample_by_source" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gssample_q_").toString
      try {
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            col("n_chars").cast("double").as("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingGroupedSample.ingest(s,
          s"$tmp/src", s"$tmp/state", s"$tmp/chk", k = 8,
          valueCol = Some("value"), maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingGroupedSample
          .readState(s, s"$tmp/state")
        graft.streaming.StreamingGroupedSample.toDF(s, st)
          .select(col("group").as("source"), col("id").as("doc_id"),
            col("value"))
          .orderBy("source", "doc_id")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // §2.11 + profiling: the streaming exact-moments fold — the fourth
    // face of the profiling family. Documents staged as 4 micro-batches;
    // each batch contributes ONE seven-counter aggregate row, folded as
    // the moments semilattice (counts add, min/min, max/max, exact
    // decimal sums add). No estimator anywhere: the folded state IS the
    // batch aggregate of everything folded, so DuckDB replays every
    // number with HUGEINT arithmetic and the rows+hash compare IS the
    // exactly-once check (a dropped or double-applied batch changes an
    // exact count).
    "streaming_moments" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_smom_q_").toString
      try {
        Tables.load(s, dir, "documents")
          .select(col("n_chars").cast("long").as("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingMoments.ingest(s, s"$tmp/src",
          s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingMoments.readState(s, s"$tmp/state")
        // exact sums leave as long for the hash compare (loud decimal->
        // long overflow is ~25 decimal digits away at any test SF)
        graft.streaming.StreamingMoments.toDF(s, st)
          .select(col("n_rows"), col("n"), col("n_null"), col("vmin"),
            col("vmax"), col("vsum").cast("long").as("vsum"),
            col("vsum_sq").cast("long").as("vsum_sq"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the grouped face — one exact moments entry PER SOURCE; groups never
    // mix, so the flat row's exactness argument applies group-pointwise
    // and DuckDB replays every group's seven numbers (a misattributed
    // value, a dropped group, or a wrong per-group merge hash-mismatches)
    "streaming_moments_by_source" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gsmom_q_").toString
      try {
        Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").cast("long").as("value"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingGroupedMoments.ingest(s,
          s"$tmp/src", s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingGroupedMoments
          .readState(s, s"$tmp/state")
        graft.streaming.StreamingGroupedMoments.toDF(s, st)
          .select(col("group").as("source"), col("n_rows"), col("n"),
            col("n_null"), col("vmin"), col("vmax"),
            col("vsum").cast("long").as("vsum"),
            col("vsum_sq").cast("long").as("vsum_sq"))
          .orderBy("source")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // §2.11 + profiling: the streaming exact CO-moments fold — the
    // bivariate face. The pair is (n_chars, whitespace-token count): the
    // chars-per-token relationship a tokenizer-drift monitor watches.
    // Documents staged as 4 micro-batches; each batch contributes ONE
    // thirteen-counter aggregate row (pairwise-complete semantics),
    // folded as the co-moments semilattice. No estimator anywhere: the
    // folded state IS the batch aggregate of everything folded, so
    // DuckDB replays every number with HUGEINT arithmetic — including
    // the cross sum Σxy that covariance/correlation derive from — and
    // the rows+hash compare IS the exactly-once check.
    "streaming_comoments" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_scomom_q_").toString
      try {
        Tables.load(s, dir, "documents")
          .select(col("n_chars").cast("long").as("x"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast("long").as("y"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingComoments.ingest(s, s"$tmp/src",
          s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingComoments
          .readState(s, s"$tmp/state")
        // exact sums leave as long for the hash compare (loud decimal->
        // long overflow is ~20 decimal digits away at any test SF)
        graft.streaming.StreamingComoments.toDF(s, st)
          .select(col("n_rows"), col("n"), col("n_null_x"), col("n_null_y"),
            col("xmin"), col("xmax"), col("ymin"), col("ymax"),
            col("xsum").cast("long").as("xsum"),
            col("ysum").cast("long").as("ysum"),
            col("xsum_sq").cast("long").as("xsum_sq"),
            col("ysum_sq").cast("long").as("ysum_sq"),
            col("xysum").cast("long").as("xysum"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the grouped face — one exact co-moments entry PER SOURCE; groups
    // never mix, so the flat row's exactness argument applies
    // group-pointwise and DuckDB replays every group's thirteen numbers
    // (a misattributed pair, a dropped group, or a wrong per-group merge
    // hash-mismatches)
    "streaming_comoments_by_source" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gscomom_q_").toString
      try {
        Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").cast("long").as("x"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast("long").as("y"))
          .repartition(4).write.parquet(s"$tmp/src")
        val q = graft.streaming.StreamingGroupedComoments.ingest(s,
          s"$tmp/src", s"$tmp/state", s"$tmp/chk", maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingGroupedComoments
          .readState(s, s"$tmp/state")
        graft.streaming.StreamingGroupedComoments.toDF(s, st)
          .select(col("group").as("source"), col("n_rows"), col("n"),
            col("n_null_x"), col("n_null_y"),
            col("xmin"), col("xmax"), col("ymin"), col("ymax"),
            col("xsum").cast("long").as("xsum"),
            col("ysum").cast("long").as("ysum"),
            col("xsum_sq").cast("long").as("xsum_sq"),
            col("ysum_sq").cast("long").as("ysum_sq"),
            col("xysum").cast("long").as("xysum"))
          .orderBy("source")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // the profiling family's TIME dimension: the sliding-window exact
    // moments fold. Six deterministic micro-batches (doc_id mod 6, file
    // mtimes forced strictly increasing so the file source's
    // timestamp ordering IS the staged order) folded at window=3 — the
    // served aggregate must be the moments of EXACTLY the last three
    // batches' rows, which DuckDB replays as WHERE doc_id % 6 >= 3 with
    // HUGEINT arithmetic. An eviction that is off by one batch, a
    // running-total design that can't un-count an evicted extremum, or
    // a wrong batch order all change an exact integer and
    // hash-mismatch.
    "streaming_windowed_moments" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_swmom_q_").toString
      try {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").cast("long").as("value"))
        QueryShapes.stageOrderedBatches(
          (0 until 6).map(b => docs
            .filter(pmod(col("doc_id"), lit(6)) === b)
            .select(col("value"))),
          s"$tmp/src")
        val q = graft.streaming.StreamingWindowedMoments.ingest(s,
          s"$tmp/src", s"$tmp/state", s"$tmp/chk", window = 3,
          maxFilesPerTrigger = 1)
        try q.processAllAvailable() finally q.stop()
        val st = graft.streaming.StreamingWindowedMoments
          .readState(s, s"$tmp/state")
        graft.streaming.StreamingWindowedMoments.toDF(s, st)
          .select(col("n_rows"), col("n"), col("n_null"), col("vmin"),
            col("vmax"), col("vsum").cast("long").as("vsum"),
            col("vsum_sq").cast("long").as("vsum_sq"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // cross-cluster state merge, moments face: the corpus is split into
    // two disjoint "regions" (doc_id parity), each folded by its OWN
    // stream (own checkpoint, own state dir — two independent regional
    // ingest clusters in miniature), then merged centrally with
    // mergeStates. The fold is a semilattice, so the merged state must
    // EQUAL the single-cluster fold over everything — which is exactly
    // what DuckDB replays (whole-corpus HUGEINT moments): a lost region,
    // a double-merged region, or any drift in the merge arithmetic
    // changes an exact integer and hash-mismatches.
    "merged_moments_regions" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_mmerge_q_").toString
      try {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").cast("long").as("value"))
        Seq(0, 1).foreach { region =>
          // pmod, not %: the region assignment must be TOTAL over any
          // doc_id sign (Spark % keeps the dividend's sign, so a
          // negative id would land in NEITHER region while the oracle
          // replays the whole corpus). doc_id is the table's non-null
          // key — the same assumption every id-keyed row makes.
          docs.filter(pmod(col("doc_id"), lit(2)) === region)
            .select(col("value"))
            .repartition(2).write.parquet(s"$tmp/r$region/src")
          val q = graft.streaming.StreamingMoments.ingest(s,
            s"$tmp/r$region/src", s"$tmp/r$region/state",
            s"$tmp/r$region/chk", maxFilesPerTrigger = 1)
          try q.processAllAvailable() finally q.stop()
        }
        val merged = graft.streaming.StreamingMoments.mergeStates(s,
          Seq(s"$tmp/r0/state", s"$tmp/r1/state"), s"$tmp/merged")
        graft.streaming.StreamingMoments.toDF(s, merged)
          .select(col("n_rows"), col("n"), col("n_null"), col("vmin"),
            col("vmax"), col("vsum").cast("long").as("vsum"),
            col("vsum_sq").cast("long").as("vsum_sq"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // cross-cluster state merge, sampling face: two regional bottom-k
    // folds (disjoint doc_id halves, same (k, salt)) merged centrally.
    // The bottom-k is an exact semilattice — k smallest of a union = k
    // smallest of the per-region bottom-ks — so the merged sample is
    // BIT-IDENTICAL to the global sample, and DuckDB replays it over
    // the WHOLE corpus with the same salted hash: any region boundary
    // leaking into the sample (a wrong merge, a lost region) changes
    // ids and hash-mismatches.
    "merged_sample_regions" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_smerge_q_").toString
      try {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").cast("double").as("value"))
        Seq(0, 1).foreach { region =>
          // pmod for sign-totality — see merged_moments_regions
          docs.filter(pmod(col("doc_id"), lit(2)) === region)
            .repartition(2).write.parquet(s"$tmp/r$region/src")
          val q = graft.streaming.StreamingSample.ingest(s,
            s"$tmp/r$region/src", s"$tmp/r$region/state",
            s"$tmp/r$region/chk", k = 32, valueCol = Some("value"),
            maxFilesPerTrigger = 1)
          try q.processAllAvailable() finally q.stop()
        }
        val merged = graft.streaming.StreamingSample.mergeStates(s,
          Seq(s"$tmp/r0/state", s"$tmp/r1/state"), s"$tmp/merged")
        graft.streaming.StreamingSample.toDF(s, merged)
          .select(col("id").as("doc_id"), col("value"))
          .orderBy("doc_id")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp))
    }),
    // hash-deterministic mixture sampling toward a target source mix
    "mixture_sample" -> ((s, dir) => {
      Curation.mixtureSample(Tables.load(s, dir, "documents"),
          rates = Map("src0" -> 1.0, "src1" -> 0.25), default = 0.5)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
        .orderBy("source")
    }),
    // temperature-scaled mixing over the skewed lang column (alpha = 0.5):
    // the head language is downsampled toward uniform, the smallest keeps
    // rate 1.0; rates derive from the corpus's own counts, so the oracle
    // recomputes them from scratch and must land on the same 6-decimal
    // values
    "temperature_mix" -> ((s, dir) => {
      Curation.temperatureMix(Tables.load(s, dir, "documents"),
          alpha = 0.5, sourceCol = "lang")
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    }),
    // eval-set decontamination: flag train docs containing >= 20% of any
    // eval doc's bigrams (eval set = every 97th doc)
    "decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Curation.contaminationPairs(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0)
            .select(col("doc_id").as("eval_id"), col("text")),
          shingleN = 2, threshold = 0.2)
        .orderBy("doc_id", "eval_id")
    }),
    // embedding-space decontamination: the eval set is a PERTURBED copy
    // of the vec_id % 97 slice (x -> x*1.01 + 0.001, then f32-rounded in
    // both engines) — the paraphrased-leakage scenario this operator
    // exists for, where the eval item shares no n-grams with the leaked
    // doc but lands ~0.999 cosine from it. Threshold 0.9 separates the
    // leaked sources (~0.999) from everything else (<0.5 on this corpus)
    // with a margin that holds at every SF.
    "embedding_decontaminate" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val evalSet = emb.filter(col("vec_id") % 97 === 0)
        .select(transform(col("embedding"),
          x => (x.cast("double") * 1.01 + 0.001).cast("float")).as("embedding"))
      Curation.embeddingContamination(emb, evalSet,
          threshold = 0.9, idCol = "vec_id")
        .select(col("vec_id"), round(col("max_cosine"), 6).as("max_cosine"))
        .orderBy("vec_id")
    }),
    // first-fit sequence packing into 256-token bins within each source
    // shard; reported as per-bin doc/token counts
    "pack_sequences" -> ((s, dir) => {
      Curation.packSequences(Tables.load(s, dir, "documents"), seqLen = 256)
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("source", "bin")
    }),
    // quality-weighted sampling without replacement (Efraimidis-Spirakis
    // keys off the salted id hash — deterministic, no rand()): the 50 docs
    // kept lean toward high quality but low-quality docs stay possible
    "weighted_sample" -> ((s, dir) => {
      val q = round(graft.functions.TextFunctions.qualityScore(col("text")), 6)
      Curation.weightedSample(
          Tables.load(s, dir, "documents").withColumn("q", q), col("q"), n = 50)
        .select(col("doc_id"), col("q").as("quality"))
        .orderBy("doc_id")
    }),
    // DSIR importance weights (hashed-bigram log-likelihood ratio, target
    // = English docs): the data-selection score a quality-targeted mix
    // resamples by; model state is 256 hashed buckets, scoring map-only
    "dsir_weights" -> ((s, dir) => {
      Curation.dsirWeights(Tables.load(s, dir, "documents"),
          isTarget = col("lang") === "en", buckets = 256)
        .orderBy("doc_id")
    }),
    // hard per-domain ceiling: keep exactly 10 hash-chosen docs per source
    // (bounded-heap selection, no window sort); the id checksum pins WHICH
    // docs survived, not just how many
    "domain_cap" -> ((s, dir) => {
      Curation.capPerGroup(Tables.load(s, dir, "documents"), "source", n = 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
        .orderBy("source")
    }))

  val oracles: Map[String, String] = Map(
    "hash_split" ->
      s"""WITH f AS (SELECT doc_id, len($toksSql)::BIGINT AS n_tokens,
         |  ${bucketSql("split")} AS b FROM documents)
         |SELECT CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
         |    ELSE 'test' END AS split,
         |  count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "leakage_split" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, list_distinct(
         |  list_transform(range(1, len(toks)),
         |    i -> ${hash32("toks[i] || ' ' || toks[i+1]")}::BIGINT)) AS hs
         |  FROM t),
         |sig AS (SELECT doc_id, hs,
         |  [list_min(list_transform(hs, h -> (h * (2 * i + 1) + 7919 * i) % 4294967311))::BIGINT
         |   FOR i IN range(1, 9)] AS sig
         |  FROM sh),
         |banded AS (SELECT doc_id, b AS band, sig[b*2+1:b*2+2] AS bucket
         |  FROM sig, range(0, 4) r(b)),
         |cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM banded l JOIN banded r
         |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
         |p AS (SELECT id_a, id_b
         |  FROM (SELECT id_a, id_b, a.hs AS hs_a, b.hs AS hs_b
         |    FROM cand JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b)
         |  WHERE len(list_intersect(hs_a, hs_b))::DOUBLE / len(list_distinct(hs_a || hs_b)) >= 0.3),
         |sym AS (SELECT id_a AS a, id_b AS b FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |reach(a, b) AS (SELECT a, b FROM sym
         |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
         |  FROM reach GROUP BY a),
         |k AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS key
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |f AS (SELECT doc_id, key,
         |  ${hash32("key::VARCHAR || ':split'")} % 10000 AS b FROM k)
         |SELECT CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
         |    ELSE 'test' END AS split,
         |  count(*) AS n_docs, sum(doc_id)::BIGINT AS id_checksum,
         |  count(DISTINCT key)::BIGINT AS n_keys
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "streaming_sample" ->
      s"""WITH bk AS (
         |  SELECT doc_id, n_chars::DOUBLE AS value
         |  FROM documents
         |  ORDER BY ${hash32("doc_id::VARCHAR || ':sample'")}, doc_id
         |  LIMIT 32)
         |SELECT doc_id, value FROM bk ORDER BY doc_id""".stripMargin,
    // every group's bottom-k replayed via a window rank over the SAME
    // salted hash the fold uses as its priority
    "streaming_sample_by_source" ->
      s"""WITH bk AS (
         |  SELECT source, doc_id, n_chars::DOUBLE AS value,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${hash32("doc_id::VARCHAR || ':sample'")}, doc_id) AS rn
         |  FROM documents)
         |SELECT source, doc_id, value FROM bk WHERE rn <= 8
         |ORDER BY source, doc_id""".stripMargin,
    // the moments fold replayed with exact HUGEINT arithmetic — the same
    // integers the fold's decimal(38,0)/BigInt legs carry
    "streaming_moments" ->
      """SELECT count(*)::BIGINT AS n_rows, count(n_chars)::BIGINT AS n,
        |  (count(*) - count(n_chars))::BIGINT AS n_null,
        |  min(n_chars)::BIGINT AS vmin, max(n_chars)::BIGINT AS vmax,
        |  sum(n_chars::HUGEINT)::BIGINT AS vsum,
        |  sum(n_chars::HUGEINT * n_chars::HUGEINT)::BIGINT AS vsum_sq
        |FROM documents""".stripMargin,
    "streaming_moments_by_source" ->
      """SELECT source, count(*)::BIGINT AS n_rows,
        |  count(n_chars)::BIGINT AS n,
        |  (count(*) - count(n_chars))::BIGINT AS n_null,
        |  min(n_chars)::BIGINT AS vmin, max(n_chars)::BIGINT AS vmax,
        |  sum(n_chars::HUGEINT)::BIGINT AS vsum,
        |  sum(n_chars::HUGEINT * n_chars::HUGEINT)::BIGINT AS vsum_sq
        |FROM documents WHERE source IS NOT NULL
        |GROUP BY source ORDER BY source""".stripMargin,
    // the co-moments fold replayed with exact HUGEINT arithmetic — the
    // same integers the fold's decimal(38,0)/BigInt legs carry; y is the
    // ONE shared tokenization rule (toksSql), so the fold's token counts
    // and the oracle's cannot diverge on the edge rules
    "streaming_comoments" ->
      s"""WITH t AS (SELECT n_chars::BIGINT AS x,
         |    len($toksSql)::BIGINT AS y FROM documents),
         |p AS (SELECT CASE WHEN x IS NOT NULL AND y IS NOT NULL
         |    THEN x END AS px,
         |  CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END AS py,
         |  x, y FROM t)
         |SELECT count(*)::BIGINT AS n_rows, count(px)::BIGINT AS n,
         |  (count(*) - count(x))::BIGINT AS n_null_x,
         |  (count(*) - count(y))::BIGINT AS n_null_y,
         |  min(px)::BIGINT AS xmin, max(px)::BIGINT AS xmax,
         |  min(py)::BIGINT AS ymin, max(py)::BIGINT AS ymax,
         |  sum(px::HUGEINT)::BIGINT AS xsum,
         |  sum(py::HUGEINT)::BIGINT AS ysum,
         |  sum(px::HUGEINT * px::HUGEINT)::BIGINT AS xsum_sq,
         |  sum(py::HUGEINT * py::HUGEINT)::BIGINT AS ysum_sq,
         |  sum(px::HUGEINT * py::HUGEINT)::BIGINT AS xysum
         |FROM p""".stripMargin,
    "streaming_comoments_by_source" ->
      s"""WITH t AS (SELECT source, n_chars::BIGINT AS x,
         |    len($toksSql)::BIGINT AS y FROM documents
         |  WHERE source IS NOT NULL),
         |p AS (SELECT source, CASE WHEN x IS NOT NULL AND y IS NOT NULL
         |    THEN x END AS px,
         |  CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END AS py,
         |  x, y FROM t)
         |SELECT source, count(*)::BIGINT AS n_rows, count(px)::BIGINT AS n,
         |  (count(*) - count(x))::BIGINT AS n_null_x,
         |  (count(*) - count(y))::BIGINT AS n_null_y,
         |  min(px)::BIGINT AS xmin, max(px)::BIGINT AS xmax,
         |  min(py)::BIGINT AS ymin, max(py)::BIGINT AS ymax,
         |  sum(px::HUGEINT)::BIGINT AS xsum,
         |  sum(py::HUGEINT)::BIGINT AS ysum,
         |  sum(px::HUGEINT * px::HUGEINT)::BIGINT AS xsum_sq,
         |  sum(py::HUGEINT * py::HUGEINT)::BIGINT AS ysum_sq,
         |  sum(px::HUGEINT * py::HUGEINT)::BIGINT AS xysum
         |FROM p GROUP BY source ORDER BY source""".stripMargin,
    // the window aggregate replayed over exactly the last three staged
    // batches' rows (batch b = doc_id % 6 == b, window 3 keeps 3..5)
    "streaming_windowed_moments" ->
      """SELECT count(*)::BIGINT AS n_rows, count(n_chars)::BIGINT AS n,
        |  (count(*) - count(n_chars))::BIGINT AS n_null,
        |  min(n_chars)::BIGINT AS vmin, max(n_chars)::BIGINT AS vmax,
        |  sum(n_chars::HUGEINT)::BIGINT AS vsum,
        |  sum(n_chars::HUGEINT * n_chars::HUGEINT)::BIGINT AS vsum_sq
        |FROM documents WHERE doc_id % 6 >= 3""".stripMargin,
    // the merged regional folds must equal the WHOLE-corpus moments —
    // the same replay as streaming_moments: region boundaries must be
    // invisible in the merged state
    "merged_moments_regions" ->
      """SELECT count(*)::BIGINT AS n_rows, count(n_chars)::BIGINT AS n,
        |  (count(*) - count(n_chars))::BIGINT AS n_null,
        |  min(n_chars)::BIGINT AS vmin, max(n_chars)::BIGINT AS vmax,
        |  sum(n_chars::HUGEINT)::BIGINT AS vsum,
        |  sum(n_chars::HUGEINT * n_chars::HUGEINT)::BIGINT AS vsum_sq
        |FROM documents""".stripMargin,
    // the merged regional bottom-ks must equal the GLOBAL bottom-k —
    // the same replay as streaming_sample, over the whole corpus
    "merged_sample_regions" ->
      s"""WITH bk AS (
         |  SELECT doc_id, n_chars::DOUBLE AS value
         |  FROM documents
         |  ORDER BY ${hash32("doc_id::VARCHAR || ':sample'")}, doc_id
         |  LIMIT 32)
         |SELECT doc_id, value FROM bk ORDER BY doc_id""".stripMargin,
    "mixture_sample" ->
      s"""WITH f AS (SELECT source, ${bucketSql("mix")} AS b FROM documents)
         |SELECT source, count(*) AS n_kept FROM f
         |WHERE b < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.25
         |  ELSE 0.5 END) * 10000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "temperature_mix" ->
      s"""WITH c AS (SELECT lang, count(*)::DOUBLE AS cnt FROM documents GROUP BY lang),
         |n AS (SELECT sum(cnt) AS total FROM c),
         |w AS (SELECT lang, pow(cnt / total, -0.5) AS wt FROM c, n),
         |r AS (SELECT lang, round(wt / (SELECT max(wt) FROM w), 6) AS rate FROM w),
         |f AS (SELECT d.lang, ${bucketSql("mix")} AS b, r.rate
         |  FROM documents d JOIN r USING (lang))
         |SELECT lang, count(*) AS n_kept FROM f
         |WHERE b < rate * 10000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "embedding_decontaminate" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |ev AS (SELECT list_transform(emb,
        |    x -> ((x * 1.01 + 0.001)::FLOAT)::DOUBLE) AS emb
        |  FROM e WHERE vec_id % 97 = 0)
        |SELECT a.vec_id, round(max(list_cosine_similarity(a.emb, v.emb)), 6) AS max_cosine
        |FROM e a, ev v
        |WHERE list_cosine_similarity(a.emb, v.emb) >= 0.9
        |GROUP BY a.vec_id
        |ORDER BY a.vec_id""".stripMargin,
    "decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, list_distinct(
         |  list_transform(range(1, len(toks)),
         |    i -> ${hash32("toks[i] || ' ' || toks[i+1]")}::BIGINT)) AS hs
         |  FROM t),
         |tr AS (SELECT doc_id, hs FROM sh WHERE doc_id % 97 != 0),
         |e AS (SELECT doc_id AS eval_id, hs AS ehs FROM sh WHERE doc_id % 97 = 0)
         |SELECT doc_id, eval_id,
         |  round(len(list_intersect(hs, ehs))::DOUBLE / len(ehs), 6) AS overlap
         |FROM tr, e
         |WHERE round(len(list_intersect(hs, ehs))::DOUBLE / len(ehs), 6) >= 0.2
         |ORDER BY doc_id, eval_id""".stripMargin,
    "pack_sequences" ->
      s"""WITH f AS (SELECT source, doc_id, len($toksSql)::BIGINT AS n
         |  FROM documents),
         |c AS (SELECT source, n, sum(n) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM f)
         |SELECT source, floor((cum - n) / 256.0)::BIGINT AS bin,
         |  count(*) AS n_docs, sum(n)::BIGINT AS n_tokens
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id,
         |  round(least(len(toks) / 100.0, 1.0) * 0.4
         |    + (CASE WHEN length(text) = 0 THEN 0
         |        ELSE length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE / length(text) END) * 0.4
         |    + (CASE WHEN (length(text) - (len(toks) - 1.0)) / len(toks) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
         |  FROM t),
         |k AS (SELECT doc_id, quality,
         |  pow((${hash32("doc_id::VARCHAR || ':wsample'")} + 1) / 4294967296.0,
         |    1.0 / greatest(quality, 1e-9)) AS wkey
         |  FROM q)
         |SELECT doc_id, quality FROM
         |  (SELECT * FROM k ORDER BY wkey DESC, doc_id ASC LIMIT 50)
         |ORDER BY doc_id""".stripMargin,
    "dsir_weights" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |f AS (SELECT doc_id, lang,
         |  unnest(list_transform(range(1, len(toks)),
         |    i -> ${hash32("toks[i] || ' ' || toks[i+1]")} % 256)) AS b
         |  FROM t),
         |cnt AS (SELECT b, count(*)::DOUBLE AS r,
         |    coalesce(count(*) FILTER (WHERE lang = 'en'), 0)::DOUBLE AS tg
         |  FROM f GROUP BY b),
         |tot AS (SELECT sum(r) AS rn, sum(tg) AS tn FROM cnt),
         |lam AS (SELECT b, ln((tg + 1.0) / (tn + 256)) - ln((r + 1.0) / (rn + 256)) AS l
         |  FROM cnt, tot),
         |w AS (SELECT f.doc_id, count(*)::BIGINT AS n_feats, sum(l) AS wt
         |  FROM f JOIN lam USING (b) GROUP BY f.doc_id)
         |SELECT d.doc_id, coalesce(w.n_feats, 0)::BIGINT AS n_feats,
         |  round(coalesce(w.wt, 0.0), 6) AS weight
         |FROM documents d LEFT JOIN w USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "domain_cap" ->
      s"""WITH r AS (SELECT source, doc_id, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY ${hash32("doc_id::VARCHAR || ':cap'")}, doc_id) AS rn
         |  FROM documents)
         |SELECT source, count(*) AS n_kept, sum(doc_id)::BIGINT AS id_sum
         |FROM r WHERE rn <= 10 GROUP BY 1 ORDER BY 1""".stripMargin)
}
