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
    * primitive shared by [[hashSplit]] and [[mixtureSample]]. */
  private def bucket(idCol: String, salt: String): Column =
    stableHash32(concat(col(idCol).cast("string"), lit(":" + salt))) % 10000

  /** Deterministic split assignment: adds a `split` column chosen by the
    * doc's hash bucket against the cumulative split weights (which must
    * sum to 1). Changing `salt` re-deals the assignment; nothing else
    * (row order, partitioning, cluster size) can. */
  def hashSplit(docs: DataFrame, splits: Seq[(String, Double)],
      salt: String = "42", idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $splits")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(w => (w * 10000).toInt)
    val b = bucket(idCol, salt)
    val label = splits.init.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) => when(b < hi, name).otherwise(rest)
    }
    docs.withColumn("split", label)
  }

  /** Mixture sampling toward a target data mix: each doc is kept with its
    * source's rate (default for unlisted sources), decided by id hash —
    * deterministic, map-only, no shuffle. Rates above 1.0 UPSAMPLE: a doc
    * at rate 2.5 appears 2 or 3 times (floor(rate) copies plus one more
    * for the hash-chosen fraction), distinguished by a `copy_id` column —
    * the repeat index a downstream shuffler/packer can fold into its key
    * so copies don't co-locate. */
  def mixtureSample(docs: DataFrame, rates: Map[String, Double],
      default: Double = 1.0, salt: String = "42",
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

  /** Training docs whose n-gram overlap with ANY eval doc reaches the
    * threshold: (doc_id, eval_id, overlap) with overlap = |shingles(doc) ∩
    * shingles(eval)| / |shingles(doc)|, rounded to 6 for engine-stable
    * comparison. The eval side is exploded to (hash, eval_id) and
    * broadcast — eval sets are tiny next to the corpus — so the scan of
    * the training text stays map-side; one aggregate on (doc_id, eval_id)
    * produces the overlap counts. */
  def contaminationPairs(docs: DataFrame, evalDocs: DataFrame, shingleN: Int,
      threshold: Double, textCol: String = "text", idCol: String = "doc_id",
      evalIdCol: String = "eval_id"): DataFrame = {
    // spread before the md5-heavy shingle hashing: a small-file corpus
    // arrives as 1-2 partitions and would serialize the hash stage
    val train = Dedup.spread(docs).select(col(idCol),
      array_distinct(shingleHashes(col(textCol), shingleN)).as("hs"))
    val trainH = train.select(col(idCol), size(col("hs")).as("n_sh"),
      explode(col("hs")).as("h"))
    val evalH = evalDocs.select(col(evalIdCol),
        explode(array_distinct(shingleHashes(col(textCol), shingleN))).as("h"))
    trainH.join(broadcast(evalH), Seq("h"))
      .groupBy(col(idCol), col(evalIdCol), col("n_sh"))
      .agg(count(lit(1)).as("overlap_cnt"))
      .select(col(idCol), col(evalIdCol),
        round(col("overlap_cnt").cast("double") / col("n_sh"), 6).as("overlap"))
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

  /** Sequence packing: assign each doc a `bin` so every bin holds ~seqLen
    * tokens, packed first-fit in id order WITHIN its shard (`sourceCol`) —
    * the per-shard window keeps the sort local to a partition key instead
    * of a global order, which is how packing parallelizes at corpus scale
    * (one shard = one window partition; no global sort). A doc larger than
    * seqLen still lands in exactly one bin (real packers then truncate or
    * wrap — that's a tokenizer-side decision). */
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
}
