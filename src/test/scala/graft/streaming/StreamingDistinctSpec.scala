package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming distinct-count fold (flat): at test cardinalities the HLL
  * sketch is in its exact (sparse) regime, so the folded estimate EQUALS
  * the true distinct count; the fold also equals the one-shot batch
  * sketch (canonical-estimate comparison — the HLL semilattice), replay
  * idempotence, binding guards, null counting, and the union laws. */
class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._
  import StreamingDistinct.{canonicalEstimate, unionSketches}

  test("many-batch fold: exact at sparse cardinality; equals the batch twin; resume") {
    val tmp = Files.createTempDirectory("graft_sdis_").toString
    // 8 batches x 50 values, HEAVY cross-batch duplication: only 120
    // distinct values across the whole stream
    (0 until 8).foreach { b =>
      (0 until 50).map(j => s"v${(b * 37 + j * 7) % 120}").toDF("value")
        .coalesce(1).write.mode("append").parquet(s"$tmp/src")
    }
    val q = StreamingDistinct.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingDistinct.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 7L && st.nRows == 400L && st.nNull == 0L)
    val corpus = spark.read.parquet(s"$tmp/src")
    val exact = corpus.select(countDistinct(col("value"))).head().getLong(0)
    // sparse regime: the estimate IS the exact count
    assert(st.estimate.map(math.round).contains(exact),
      s"estimate ${st.estimate} != exact $exact")
    // fold ≡ one-shot batch sketch, canonical-estimator comparison (a
    // one-shot sketch answers HIP, a union answers composite — same
    // registers; the canonical form compares the registers)
    val (tn, tnull, tsk) = StreamingDistinct.batchSketch(corpus, "value")
    assert(tn == 400L && tnull == 0L)
    assert(canonicalEstimate(12, st.sketch) == canonicalEstimate(12, tsk),
      "folded sketch diverged from the batch twin")

    // resume under the same checkpoint with new arrivals incl. nulls
    Seq(Some("fresh1"), None, Some("fresh2")).map(_.orNull).toDF("value")
      .coalesce(1).write.mode("append").parquet(s"$tmp/src")
    val q2 = StreamingDistinct.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val st2 = StreamingDistinct.readState(spark, s"$tmp/state")
    assert(st2.nRows == 403L && st2.nNull == 1L)
    assert(st2.estimate.map(math.round).contains(exact + 2),
      "post-resume estimate must count the two fresh values")
  }

  test("replay idempotence, binding guards, union laws, all-null shape") {
    val tmp = Files.createTempDirectory("graft_sdis_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq("a", "b", "a").toDF("value")
    val st1 = StreamingDistinct.applyBatch(spark, tmp, 12, ck, b0,
      "value", 0L)
    assert(st1.nRows == 3L && st1.estimate.map(math.round).contains(2L))
    // replayed batch id: skipped, state unchanged (incl. counters)
    val st1b = StreamingDistinct.applyBatch(spark, tmp, 12, ck,
      Seq("z").toDF("value"), "value", 0L)
    assert(st1b == st1)
    // wrong checkpoint / lgK / column: loud refusals
    intercept[IllegalStateException](StreamingDistinct.applyBatch(spark,
      tmp, 12, "file:ckpt-B", b0, "value", 1L))
    intercept[IllegalStateException](StreamingDistinct.applyBatch(spark,
      tmp, 13, ck, b0, "value", 1L))
    intercept[IllegalStateException](StreamingDistinct.applyBatch(spark,
      tmp, 12, ck, Seq("x").toDF("other"), "other", 1L))
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_sdis_f_").toString
    intercept[IllegalStateException](StreamingDistinct.applyBatch(spark,
      fresh, 12, ck, b0, "value", 5L))
    // union laws at the canonical-estimate level: associative,
    // commutative, idempotent, empty identity
    def sk(vs: String*) = {
      val (_, _, bytes) = StreamingDistinct.batchSketch(
        vs.toDF("value"), "value")
      bytes
    }
    val (a, b, c) = (sk("x", "y"), sk("y", "z"), sk("w"))
    def est(x: Array[Byte]) = canonicalEstimate(12, x)
    assert(est(unionSketches(12, unionSketches(12, a, b), c)) ==
      est(unionSketches(12, a, unionSketches(12, b, c))))
    assert(est(unionSketches(12, a, b)) == est(unionSketches(12, b, a)))
    assert(est(unionSketches(12, a, a)) == est(a))
    assert(unionSketches(12, a, Array.empty).sameElements(a))
    // an all-null batch folds counters but no sketch
    val nt = Files.createTempDirectory("graft_sdis_n_").toString
    val nulls = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(null),
        org.apache.spark.sql.Row(null)),
      new org.apache.spark.sql.types.StructType()
        .add("value", org.apache.spark.sql.types.StringType))
    val stn = StreamingDistinct.applyBatch(spark, nt, 12, ck, nulls,
      "value", 0L)
    assert(stn.nRows == 2L && stn.nNull == 2L && stn.estimate.isEmpty)
    // round-trip keeps the empty-sketch shape
    assert(StreamingDistinct.readState(spark, nt) == stn)
  }
}
