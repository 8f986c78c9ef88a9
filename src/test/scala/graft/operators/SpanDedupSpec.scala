package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-level dedup operators: planted duplicated windows
  * ([[Dedup.dupSpanStats]]), planted shared/repeated segments
  * ([[Dedup.dedupSegments]]), and the bounded-heap per-group cap
  * ([[Curation.capPerGroup]]). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dupSpanStats flags exactly the windows shared across docs") {
    // docs 1 and 2 share the 4-token run "p q r s" (two 3-gram windows);
    // doc 3 shares nothing; doc 4 is too short for any window
    val docs = Seq(
      (1L, "a b p q r s c d"),
      (2L, "x y p q r s z w"),
      (3L, "m n o m n o m n"), // within-doc repeats only: NOT cross-doc dups
      (4L, "t u")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 6L, 2L, 2.0 / 6)))
    assert(out(1) == ((2L, 6L, 2L, 2.0 / 6)))
    assert(out(2) == ((3L, 6L, 0L, 0.0))) // repeats stay inside one doc
    assert(out(3) == ((4L, 0L, 0L, 0.0))) // short doc still reported
  }

  test("dupSpanStats minDocs raises the cross-doc bar") {
    val docs = Seq(
      (1L, "p q r"), (2L, "p q r"), (3L, "p q r"), (4L, "s t u"), (5L, "s t u")
    ).toDF("doc_id", "text")
    val frac3 = Dedup.dupSpanStats(docs, n = 3, minDocs = 3)
      .select("id", "n_dup_windows").as[(Long, Long)].collect().toMap
    // "p q r" lives in 3 docs (passes minDocs=3); "s t u" only in 2
    assert(frac3(1L) == 1L && frac3(2L) == 1L && frac3(3L) == 1L)
    assert(frac3(4L) == 0L && frac3(5L) == 0L)
  }

  test("dedupSegments keeps first (id, position) occurrence corpus-wide") {
    val sep = "\n\n"
    val docs = Seq(
      (1L, s"alpha${sep}beta${sep}alpha"), // within-doc repeat: 3rd seg drops
      (2L, s"beta${sep}gamma"),            // beta already owned by doc 1
      (3L, s"${sep}gamma${sep}  ")         // empties dropped; gamma owned by 2
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, sep)
      .select("id", "n_segs", "n_kept", "kept_fp")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._2 == 3 && out(0)._3 == 2) // alpha+beta kept, repeat dropped
    assert(out(1)._2 == 2 && out(1)._3 == 1) // only gamma survives
    assert(out(2)._2 == 1 && out(2)._3 == 0) // everything was seen earlier
    // fingerprint pins the reconstruction: doc 1 keeps "alpha\n\nbeta"
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0)._4 == md5(s"alpha${sep}beta"))
    assert(out(2)._4 == md5(""))
  }

  test("weightedSample leans toward heavy rows, stays deterministic") {
    val docs = spark.range(2000)
      .select(col("id").as("doc_id"),
        // weights: 10x heavier for the first quarter of ids
        when(col("id") < 500, lit(10.0)).otherwise(lit(1.0)).as("w"))
    val kept = Curation.weightedSample(docs, col("w"), n = 200)
    assert(kept.count() == 200)
    val heavy = kept.filter(col("doc_id") < 500).count()
    // heavy rows are 25% of the corpus but 10x weighted: expected share far
    // above uniform's 50 — a loose band that fails only if weighting broke
    assert(heavy > 100, s"heavy rows under-represented: $heavy/200")
    // deterministic and partition-invariant
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Curation.weightedSample(docs.repartition(11), col("w"), n = 200)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val c = Curation.weightedSample(docs, col("w"), n = 200, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(a != c)
    intercept[IllegalArgumentException](
      Curation.weightedSample(docs, col("w"), 0))
  }

  test("capPerGroup keeps exactly n per group, deterministically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kept = Curation.capPerGroup(docs, "source", n = 7)
    val counts = kept.groupBy("source").count().as[(String, Long)].collect()
    assert(counts.nonEmpty && counts.forall(_._2 == 7))
    // partition-invariant and salt-redealable
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Curation.capPerGroup(docs.repartition(13), "source", n = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val c = Curation.capPerGroup(docs, "source", n = 7, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(a != c)
    // a group smaller than the cap survives whole
    val tiny = docs.filter(col("doc_id") < 3)
    assert(Curation.capPerGroup(tiny, "source", n = 7).count() == 3)
    intercept[IllegalArgumentException](Curation.capPerGroup(docs, "source", 0))
  }
}
