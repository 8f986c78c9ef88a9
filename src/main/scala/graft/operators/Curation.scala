package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines — the steps
  * between "deduplicated documents" and "training shards":
  *
  *  - deterministic hash splits (train/val/test assignment that is stable
  *    across runs, engines, and re-partitions — no `rand()`)
  *  - per-source mixture sampling (down/up-weight sources toward a target
  *    data mix, again hash-deterministic)
  *  - eval-set decontamination (drop training docs that overlap an
  *    evaluation set's n-grams — the step that keeps benchmarks honest)
  *  - sequence packing (assign docs to fixed-token-budget bins within a
  *    shard, the shape pretraining batch assembly wants)
  *
  * Everything is map-only or one bounded aggregate; the only join
  * (decontamination) broadcasts the eval side, which is small by
  * definition. Nothing here calls `rand()`: all sampling decisions hash
  * the document id, so a re-run, a retry, or a different partitioning
  * yields byte-identical output — the property that makes a 100 TB
  * curation job resumable.
  */
object Curation {

  /** Hash bucket in [0, 10000) for a doc id + salt — the sampling
    * primitive shared by [[hashSplit]] and [[mixtureSample]]. The two
    * operators DEFAULT to different salts on purpose: with a shared salt
    * their decisions would be fully correlated (e.g. sampling at rate
    * <= 0.9 would empty a 0.9/0.05/0.05 split's val and test sets,
    * because both read the same bucket). */
  private def bucket(idCol: String, salt: String): Column =
    stableHash32(concat(col(idCol).cast("string"), lit(":" + salt))) % 10000

  /** Deterministic split assignment: adds a `split` column chosen by the
    * doc's hash bucket against the cumulative split weights (which must
    * sum to 1). Changing `salt` re-deals the assignment; nothing else
    * (row order, partitioning, cluster size) can. */
  def hashSplit(docs: DataFrame, splits: Seq[(String, Double)],
      salt: String = "split", idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $splits")
    // round, not truncate: 0.7 * 10000 is 6999.999... in IEEE doubles and
    // toInt would shift the boundary one bucket below the oracle's 7000
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(w => math.round(w * 10000).toInt)
    val b = bucket(idCol, salt)
    val label = splits.init.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) => when(b < hi, name).otherwise(rest)
    }
    docs.withColumn("split", label)
  }

  /** Leakage-safe split: near-duplicate documents MUST land on the same
    * side of a train/val/test split — a benchmark whose eval twin sits in
    * train is measuring memorization — so the split decision hashes the
    * doc's near-dup CLUSTER key instead of the doc itself. The cluster
    * key is the transitive component representative from
    * [[Dedup.duplicateClusters]] over `pairs` (any verified near-dup pair
    * list: MinHash/LSH, SimHash, embedding — caller's choice); docs with
    * no near-dup pair are their own singleton key, so for them this IS
    * [[hashSplit]] with the same salt arithmetic. Output adds `split`
    * and the `split_key` it was decided on (auditable: equal keys ⇒ equal
    * splits, by construction).
    *
    * Scale shape: the component labeling is [[Dedup.duplicateClusters]]'s
    * bounded label-propagation over PAIRS (pair-count-sized, never
    * corpus-sized); the only corpus-sized step is one left join of docs
    * against that (small) component relation, then the map-only hash.
    *
    * Stability caveat (append-only corpora): the cluster key is the
    * component's MIN id, so a later re-run over a GROWN corpus keeps
    * every existing assignment only if new members never lower a
    * cluster's min — true under monotone ids (the common ingest shape:
    * new docs get larger ids), in which case old docs keep their exact
    * `split` and new docs adopt their cluster's existing side. With
    * non-monotone ids a new smaller-id member re-keys its cluster and
    * can flip the WHOLE cluster's side on the next run — deterministic
    * but not incremental; re-split in epochs (and retrain accordingly)
    * or assign monotone ingest ids if that matters. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      splits: Seq[(String, Double)], salt: String = "split",
      idCol: String = "doc_id", maxIter: Int = 20): DataFrame = {
    val comps = Dedup.duplicateClusters(pairs, maxIter)
      .select(col("id").as(idCol), col("comp"))
    val keyed = docs.join(comps, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    hashSplit(keyed, splits, salt, idCol = "split_key")
  }

  /** Mixture sampling toward a target data mix: each doc is kept with its
    * source's rate (default for unlisted sources), decided by id hash —
    * deterministic, map-only, no shuffle. Rates above 1.0 UPSAMPLE: a doc
    * at rate 2.5 appears 2 or 3 times (floor(rate) copies plus one more
    * for the hash-chosen fraction), distinguished by a `copy_id` column —
    * the repeat index a downstream shuffler/packer can fold into its key
    * so copies don't co-locate. */
  def mixtureSample(docs: DataFrame, rates: Map[String, Double],
      default: Double = 1.0, salt: String = "mix",
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(default): Column) { case (rest, (src, r)) =>
      when(col(sourceCol) === src, r).otherwise(rest)
    }
    val copies = (floor(rate) +
      when(bucket(idCol, salt) < (rate - floor(rate)) * 10000, 1).otherwise(0))
      .cast("long")
    // explode generates zero rows for a null array, so rate-0 docs drop out
    docs.withColumn("copy_id",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))))
  }

  /** Temperature-scaled source mixing (the multilingual-pretraining
    * reweighting; alpha-sampling with alpha = 1/T): target share per
    * source q_s ∝ p_s^alpha where p_s is the source's natural corpus
    * share, so the per-doc keep rate is ∝ p_s^(alpha-1). Rates are
    * normalized so the SMALLEST source keeps rate 1.0 — a pure
    * head-downsampling policy, never upsampling the tail — and rounded
    * to 6 decimals so the oracle's independently-computed pow agrees
    * bit-stably at the bucket boundary. alpha = 1 keeps natural
    * proportions; alpha = 0 is uniform-over-sources. The per-source
    * count aggregate collects one row per source (bounded like a
    * centroid table); the sampling itself is [[mixtureSample]] —
    * hash-deterministic, map-only. */
  def temperatureMix(docs: DataFrame, alpha: Double, salt: String = "mix",
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"temperatureMix: alpha=$alpha outside [0,1]")
    val counts = docs.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    require(counts.nonEmpty, "temperatureMix: empty corpus")
    val total = counts.values.sum
    val weights = counts.map { case (s, c) =>
      s -> math.pow(c / total, alpha - 1.0) }
    val maxW = weights.values.max
    val rates = weights.map { case (s, w) =>
      s -> BigDecimal(w / maxW).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    mixtureSample(docs, rates, default = 0.0, salt, sourceCol, idCol)
  }

  /** Training docs whose n-gram overlap with ANY eval doc reaches the
    * threshold: (doc_id, eval_id, overlap) with overlap = |shingles(doc) ∩
    * shingles(eval)| / |shingles(EVAL)|, rounded to 6 for engine-stable
    * comparison. Normalizing by the EVAL doc's n-gram count measures the
    * fraction of the benchmark item that leaked — a 10-shingle eval answer
    * embedded verbatim in a 1000-shingle training doc scores 1.0, not a
    * vanishing 0.01 as train-side normalization would report. The eval
    * side is exploded to (hash, eval_id, count) and broadcast — eval sets
    * are tiny next to the corpus — so the scan of the training text stays
    * map-side; one aggregate on (doc_id, eval_id) produces the overlaps. */
  def contaminationPairs(docs: DataFrame, evalDocs: DataFrame, shingleN: Int,
      threshold: Double, textCol: String = "text", idCol: String = "doc_id",
      evalIdCol: String = "eval_id"): DataFrame = {
    // spread before the md5-heavy shingle hashing: a small-file corpus
    // arrives as 1-2 partitions and would serialize the hash stage
    val trainH = Dedup.spread(docs).select(col(idCol),
        explode(array_distinct(shingleHashes(col(textCol), shingleN))).as("h"))
    val evalSets = evalDocs.select(col(evalIdCol),
      array_distinct(shingleHashes(col(textCol), shingleN)).as("ehs"))
    val evalH = evalSets.select(col(evalIdCol), size(col("ehs")).as("n_esh"),
      explode(col("ehs")).as("h"))
    trainH.join(broadcast(evalH), Seq("h"))
      .groupBy(col(idCol), col(evalIdCol), col("n_esh"))
      .agg(count(lit(1)).as("overlap_cnt"))
      .select(col(idCol), col(evalIdCol),
        round(col("overlap_cnt").cast("double") / col("n_esh"), 6).as("overlap"))
      .filter(col("overlap") >= threshold)
  }

  /** [[contaminationPairs]] as a filter: the corpus minus every doc that
    * overlaps the eval set — the decontamination step itself. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, shingleN: Int,
      threshold: Double, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val flagged = contaminationPairs(docs, evalDocs, shingleN, threshold,
      textCol, idCol).select(col(idCol)).distinct()
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Embedding-space contamination report: (idCol, max_cosine) for every
    * corpus row whose embedding lands within `threshold` cosine of ANY
    * eval embedding — the vector-space complement of the n-gram
    * [[contaminationPairs]] (paraphrased or reformatted eval leakage that
    * shares no shingles still lands next to the eval item in embedding
    * space). The eval side is broadcast (eval sets are small by
    * definition), so the corpus scan stays map-side with a per-row loop
    * over the broadcast table — no shuffle of corpus embeddings; at an
    * eval size where brute-force per-row cost bites, block the eval side
    * through the IVF machinery first, exactly like
    * [[Dedup.embeddingNearDupPairs]] blocks the corpus. */
  def embeddingContamination(docs: DataFrame, evalDocs: DataFrame,
      threshold: Double, embCol: String = "embedding",
      idCol: String = "doc_id"): DataFrame = {
    val ev = broadcast(evalDocs.select(col(embCol).as("eval_emb")))
    docs.select(col(idCol), col(embCol))
      .crossJoin(ev)
      .select(col(idCol),
        graft.functions.VectorExpressions.vecCosine(col(embCol), col("eval_emb"))
          .as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col(idCol))
      .agg(max(col("cos")).as("max_cosine"))
  }

  /** [[embeddingContamination]]'s scale form — the IVF-blocked escape
    * hatch for when the eval set outgrows a plain broadcast×scan: the
    * corpus takes ONE map-only cell assignment (codegen argmin over the
    * literal centroid matrix, same kernel as `Ivf.assign`), the eval side
    * probes its `probes` nearest cells, and candidate (doc, eval) pairs
    * form only where the doc's cell is among the eval item's probes — a
    * cell-key join against the (still broadcast, now cell-exploded) eval
    * relation instead of |docs| × |eval| kernel evaluations. A
    * contaminated pair is missed only when the doc's cell is outside the
    * eval item's probe set; `probes` is the recall/cost dial (the same
    * trade as [[graft.operators.KnnJoin.blockedMultiProbe]]), and the
    * brute-force form stays the ground truth to validate it against. */
  def embeddingContaminationBlocked(docs: DataFrame, evalDocs: DataFrame,
      threshold: Double, centroids: Array[Array[Float]], probes: Int = 2,
      embCol: String = "embedding", idCol: String = "doc_id"): DataFrame = {
    require(probes >= 1 && probes <= centroids.length,
      s"probes must be in [1, ${centroids.length}], got $probes")
    val cellOf = graft.functions.VectorExpressions.nearestCentroid(
      col(embCol), centroids, "l2")
    val assigned = docs.select(col(idCol), col(embCol))
      .withColumn("cell", cellOf)
    val probeStructs = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.VectorExpressions.vecL2(col("eval_emb"), typedLit(c)).as("d"),
        lit(i).as("cid")) }: _*)
    val ev = broadcast(evalDocs.select(col(embCol).as("eval_emb"))
      .withColumn("cell",
        explode(transform(slice(array_sort(probeStructs), 1, probes),
          s => s.getField("cid")))))
    assigned.join(ev, Seq("cell"))
      .select(col(idCol),
        graft.functions.VectorExpressions.vecCosine(col(embCol), col("eval_emb"))
          .as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col(idCol))
      .agg(max(col("cos")).as("max_cosine"))
  }

  /** [[embeddingContamination]] as a filter: the corpus minus every doc
    * within `threshold` cosine of the eval set. */
  def decontaminateByEmbedding(docs: DataFrame, evalDocs: DataFrame,
      threshold: Double, embCol: String = "embedding",
      idCol: String = "doc_id"): DataFrame =
    docs.join(
      embeddingContamination(docs, evalDocs, threshold, embCol, idCol)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** The one-call curation path from raw documents to training-ready
    * rows: [[Dedup.prepPipeline]]'s funnel (exact dedup → quality floor →
    * language filter → LSH near-dup drop), then [[decontaminate]] against
    * the eval set, then [[hashSplit]] — returning (id, quality, n_tokens,
    * split) for every surviving doc. Each stage is the documented
    * operator; this just pins the composition order a pipeline wants
    * (cheap map-side gates first, the eval join over survivors only,
    * the split deal last so ratios apply to the FINAL corpus). */
  def curate(docs: DataFrame, evalDocs: DataFrame, minQuality: Double,
      lang: String, shingleN: Int, bands: Int, rowsPerBand: Int,
      nearDupThreshold: Double, contaminationThreshold: Double,
      splits: Seq[(String, Double)], salt: String = "split",
      textCol: String = "text", idCol: String = "doc_id",
      maxPerGroup: Option[(String, Int)] = None): DataFrame = {
    // optional hard domain ceiling FIRST (cheap, hash-decided) so every
    // downstream stage — including the expensive LSH machinery — sees the
    // capped corpus; (groupCol, n) e.g. ("source", 100000)
    val bounded = maxPerGroup match {
      case Some((g, n)) => capPerGroup(docs, g, n, idCol)
      case None => docs
    }
    val kept = Dedup.prepPipeline(bounded, minQuality, lang, shingleN, bands,
      rowsPerBand, nearDupThreshold, textCol, idCol)
    // re-attach text for the contamination check (prepPipeline's output is
    // text-free by design), restricted to survivors via the semi-join
    val surviving = bounded.join(kept.select(idCol), Seq(idCol), "left_semi")
    val clean = decontaminate(surviving, evalDocs, shingleN,
      contaminationThreshold, textCol, idCol)
    hashSplit(kept.join(clean.select(idCol), Seq(idCol), "left_semi"),
      splits, salt, idCol)
  }

  /** Sequence packing: assign each doc a `bin` by the prefix sum of token
    * counts in id order WITHIN its shard (`sourceCol`) — the per-shard
    * window keeps the sort local to a partition key instead of a global
    * order, which is how packing parallelizes at corpus scale (one shard
    * = one window partition; no global sort). Bins TARGET seqLen tokens:
    * a doc straddling a boundary is assigned whole to the earlier bin, so
    * a bin can exceed seqLen by up to that straddler's length (and a doc
    * larger than seqLen overflows its bin outright) — the downstream
    * assembler truncates or wraps, a tokenizer-side decision. */
  def packSequences(docs: DataFrame, seqLen: Int,
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(sourceCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / seqLen))
  }

  /** Cap each group (domain, source, dup-cluster, ...) at EXACTLY n kept
    * documents — the over-represented-domain cap that complements
    * [[mixtureSample]]'s rate-based sampling when the mix calls for a hard
    * ceiling. Which n survive is decided by a deterministic per-doc hash
    * rank (salted, no `rand()` — same resumability contract as
    * [[hashSplit]]), so the kept set is stable across runs, partitionings
    * and engines.
    *
    * NOT a window sort: a `row_number` over the group key sends every row
    * of the hottest domain through one partition — the exact skew this
    * operator exists to fight. Instead the per-group selection runs
    * through [[graft.operators.TopKImperative]]'s bounded-heap aggregate:
    * map-side partials keep at most ~4n candidates per partition per
    * group, so the exchange carries capped heaps, never the full hot
    * group; the final semi-join rides the id key. */
  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis-Spirakis 2006: keep the n largest u^(1/w), u uniform per
    * row — inclusion probability proportional to weight): sample toward
    * high-quality/high-value documents instead of uniformly, with the
    * same no-`rand()` contract as every sampler here — u derives from the
    * salted id hash, so re-runs, retries and re-partitionings select the
    * SAME n rows. Weights are clamped to a tiny positive floor (a
    * zero/negative weight means "never prefer", not "crash the job").
    *
    * Scale shape: the key is map-only arithmetic; the top-n is a
    * TakeOrdered heap (per-partition heaps, no global sort of the
    * corpus). */
  def weightedSample(docs: DataFrame, weight: Column, n: Int,
      salt: String = "wsample", idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    // u in (0, 1]: hash32 gives [0, 2^32); +1 over 2^32 avoids pow(0, .)
    val u = (stableHash32(concat(col(idCol).cast("string"), lit(":" + salt)))
      + 1).cast("double") / 4294967296.0
    docs.withColumn("_wkey", pow(u, lit(1.0) / greatest(weight, lit(1e-9))))
      .orderBy(col("_wkey").desc, col(idCol).asc).limit(n)
      .drop("_wkey")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public method): score
    * every raw document by how much its hashed n-gram feature distribution
    * looks like a TARGET subset (e.g. high-quality English) vs the raw
    * pool. weight(doc) = Σ over the doc's bigram occurrences of
    * log(p_target(bucket) / p_raw(bucket)), with add-one smoothing over
    * `buckets` hashed feature buckets. Resampling the corpus by these
    * weights (e.g. [[weightedSample]] on exp(weight)) tilts the data mix
    * toward the target domain without a trained classifier.
    *
    * Scale shape — the reason feature HASHING is the right 100 TB form:
    * the model state is two count vectors of length `buckets` (one
    * aggregate over one corpus scan, ≤ `buckets` rows to the driver), and
    * scoring is a map-only pass (the log-ratio table rides along as a
    * literal array; `aggregate` over the doc's bucket array, no join, no
    * shuffle, no per-doc state). Raw pool = ALL docs (target included),
    * per the paper's importance-sampling formulation.
    *
    * Returns (doc_id…idCol, n_feats, weight): every input doc, zero-feature
    * docs (< 2 tokens) carrying weight 0.
    */
  // Hashed-feature pin for [[dsirWeights]]: BOTH its passes (the bounded
  // bucket-count aggregate and the map-only scoring projection) read the
  // feature column, and the md5-per-shingle hashing is the expensive term —
  // unpinned it runs twice per corpus. Same bounded KEYED contract as
  // Dedup's funnel cache: at most [[dsirCacheMax]] corpora stay resident
  // (oldest released first, a dead/evicted entry rebuilds), so repeated
  // calls over different corpora cannot accumulate pinned storage for the
  // session's lifetime. The key folds in a fingerprint of the plan's
  // backing files ([[Dedup.planKey]]), so a corpus path REWRITTEN between
  // calls re-keys and rebuilds instead of serving the pre-rewrite
  // snapshot; invalidateDsirCache() remains the explicit escape hatch.
  private val dsirCacheMax = 4
  private val dsirCache =
    scala.collection.mutable.LinkedHashMap.empty[((Int, Int), Int, String), DataFrame]

  def invalidateDsirCache(): Unit = synchronized {
    dsirCache.valuesIterator.foreach(_.unpersist(blocking = false))
    dsirCache.clear()
  }

  private def dsirFeats(docs: DataFrame, buckets: Int,
      textCol: String): DataFrame = synchronized {
    val key = (Dedup.planKey(docs), buckets, textCol)
    dsirCache.get(key) match {
      case Some(df) if (df.sparkSession eq docs.sparkSession) &&
          df.storageLevel != org.apache.spark.storage.StorageLevel.NONE =>
        return df
      case Some(df) =>
        df.unpersist(blocking = false)
        dsirCache.remove(key)
      case None =>
    }
    dsirCache.getOrElseUpdate(key, {
      while (dsirCache.size >= dsirCacheMax) {
        val (k0, df0) = dsirCache.head
        df0.unpersist(blocking = false)
        dsirCache.remove(k0)
      }
      docs.withColumn("_bkts", transform(shingles(col(textCol), 2),
          s => pmod(stableHash32(s), lit(buckets))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** DSIR importance weights (hashed-bigram n-gram features; Xie et al.).
    * Snapshot contract: the hashed-feature pass is memoized per (plan,
    * backing-files) key ([[Dedup.planKey]]) — repeated calls over an
    * unchanged corpus reuse the pinned features, a rewritten corpus path
    * re-keys automatically, [[invalidateDsirCache]] force-drops. */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 256,
      textCol: String = "text", idCol: String = "doc_id",
      roundDecimals: Int = 6): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets must be in (0, 2^20], got $buckets")
    val feats = dsirFeats(docs, buckets, textCol)
    // one scan, one bounded aggregate: raw + target counts per bucket
    val counts = feats
      .select(explode(col("_bkts")).as("b"), isTarget.as("_t"))
      .groupBy("b")
      .agg(count(lit(1)).as("r"),
        coalesce(sum(when(col("_t"), 1L)), lit(0L)).as("t"))
      .collect()
    val rawN = counts.map(_.getLong(1)).sum.toDouble
    val tgtN = counts.map(_.getLong(2)).sum.toDouble
    // unseen buckets score the smoothing floor (t = r = 0)
    val floor = math.log(1.0 / (tgtN + buckets)) - math.log(1.0 / (rawN + buckets))
    val lam = Array.fill(buckets)(floor)
    counts.foreach { row =>
      val b = row.getLong(0).toInt
      lam(b) = math.log((row.getLong(2) + 1.0) / (tgtN + buckets)) -
        math.log((row.getLong(1) + 1.0) / (rawN + buckets))
    }
    val lamLit = typedLit(lam.toSeq)
    feats.select(col(idCol),
      size(col("_bkts")).cast("long").as("n_feats"),
      round(aggregate(col("_bkts"), lit(0.0),
        (acc, b) => acc + element_at(lamLit, (b + 1).cast("int"))),
        roundDecimals).as("weight"))
  }

  def capPerGroup(docs: DataFrame, groupCol: String, n: Int,
      idCol: String = "doc_id", salt: String = "cap"): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val rank = stableHash32(concat(col(idCol).cast("string"), lit(":" + salt)))
    // dispatch the heap on the id TYPE (string ids ride TopKStr natively,
    // numeric ids take the long cast): the raw imperative aggregate casts
    // ids to Long internally, so handing it a string/int column is a
    // runtime ClassCastException, not a plan error
    val topk =
      if (docs.schema(idCol).dataType == org.apache.spark.sql.types.StringType)
        TopK.topKStr(n)
      else TopK.topK(n)
    val kept = docs
      .select(col(groupCol).as("g"), col(idCol).as("_id"), rank.cast("double").as("_rk"))
      .groupBy("g")
      .agg(topk(col("_id"), col("_rk")).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id").as(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }
}
