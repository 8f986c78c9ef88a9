package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming exact-moments fold (flat): after any number of micro-batches
  * the state EQUALS the one-shot batch aggregate (the moments semilattice
  * has no error term), null values are counted not folded, replay
  * idempotence, binding guards (checkpoint AND value column), the merge
  * laws, and the derived mean/variance views. */
class StreamingMomentsSpec extends SparkSpec {
  import spark.implicits._
  import StreamingMoments.{mergeMoments, Moments}

  private def stage(src: String, batches: Seq[Seq[Long]]): Unit =
    batches.foreach(b => b.toDF("value").coalesce(1)
      .write.mode("append").parquet(src))

  /** One nullable LONG column — explicit schema (no implicit encoder for
    * boxed longs). */
  private def longCol(vs: Seq[Option[Long]]) =
    spark.createDataFrame(
      java.util.Arrays.asList(vs.map(v =>
        org.apache.spark.sql.Row(v.map(Long.box).orNull)): _*),
      new org.apache.spark.sql.types.StructType()
        .add("value", org.apache.spark.sql.types.LongType))

  test("many-batch fold EQUALS the batch moments; resume works") {
    val tmp = Files.createTempDirectory("graft_smom_").toString
    // 8 batches x 25 values with a known closed form
    val batches = (0 until 8).map(b => (0 until 25).map(j => b * 25L + j))
    stage(s"$tmp/src", batches)
    val q = StreamingMoments.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingMoments.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 7L)
    val m = st.moments
    // closed form over 0..199: n=200, sum=19900, sumsq = 199*200*399/6
    assert(m.nRows == 200L && m.nNull == 0L && m.n == 200L)
    assert(m.min == 0L && m.max == 199L)
    assert(m.sum == BigInt(19900) && m.sumSq == BigInt(199L * 200L * 399L / 6L))
    // the headline equality: folded ≡ one-shot batch aggregate
    val corpus = spark.read.parquet(s"$tmp/src")
    assert(m == StreamingMoments.batchMoments(corpus, "value"),
      "folded moments diverged from the batch twin")
    // derived views against the closed form
    assert(m.mean.contains(99.5))
    assert(math.abs(m.variancePop.get - (m.sumSq.toDouble / 200 - 99.5 * 99.5))
      < 1e-9)

    // resume under the same checkpoint with new arrivals (and some nulls)
    longCol(Seq(Some(1000L), None, Some(-5L)))
      .coalesce(1).write.mode("append").parquet(s"$tmp/src")
    val q2 = StreamingMoments.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val m2 = StreamingMoments.readState(spark, s"$tmp/state").moments
    assert(m2.nRows == 203L && m2.nNull == 1L && m2.n == 202L)
    assert(m2.min == -5L && m2.max == 1000L)
    assert(m2 == StreamingMoments.batchMoments(
      spark.read.parquet(s"$tmp/src"), "value"), "post-resume fold diverged")
    // toDF round-trips the exact sums and matches Profile.moments
    // relation-to-relation (the schema-alignment contract)
    val foldDf = StreamingMoments.toDF(spark,
      StreamingMoments.readState(spark, s"$tmp/state"))
    val batchDf = Profile.moments(spark.read.parquet(s"$tmp/src"), "value")
    assert(foldDf.collect().toSeq == batchDf.collect().toSeq)
  }

  test("replay idempotence and binding guards (checkpoint, value column)") {
    val tmp = Files.createTempDirectory("graft_smom_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq(1L, 2L, 3L).toDF("value")
    val st1 = StreamingMoments.applyBatch(spark, tmp, ck, b0, "value", 0L)
    assert(st1.moments.n == 3L && st1.moments.sum == BigInt(6))
    // replayed batch id: skipped, state unchanged
    val st1b = StreamingMoments.applyBatch(spark, tmp, ck,
      Seq(99L).toDF("value"), "value", 0L)
    assert(st1b == st1)
    // wrong checkpoint / wrong value column: loud refusals
    intercept[IllegalStateException](StreamingMoments.applyBatch(spark,
      tmp, "file:ckpt-B", b0, "value", 1L))
    intercept[IllegalStateException](StreamingMoments.applyBatch(spark,
      tmp, ck, Seq(1L).toDF("other"), "other", 1L))
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_smom_f_").toString
    intercept[IllegalStateException](StreamingMoments.applyBatch(spark,
      fresh, ck, b0, "value", 5L))
    // merge laws: associative, commutative, empty-identity — incl. the
    // min/max identity handling on empty (n == 0) legs
    val a = Moments(3L, 1L, 2L, 9L, BigInt(14), BigInt(88))
    val b = Moments(2L, 0L, -4L, 1L, BigInt(-3), BigInt(17))
    val c = Moments(1L, 1L, 0L, 0L, BigInt(0), BigInt(0)) // all-null leg
    assert(mergeMoments(mergeMoments(a, b), c) ==
      mergeMoments(a, mergeMoments(b, c)))
    assert(mergeMoments(a, b) == mergeMoments(b, a))
    assert(mergeMoments(a, StreamingMoments.emptyMoments) == a)
    assert(mergeMoments(c, b).min == -4L && mergeMoments(c, b).max == 1L,
      "an all-null leg must not contribute its placeholder min/max")
  }

  test("all-null and empty folds serve no phantom min/max") {
    val tmp = Files.createTempDirectory("graft_smom_n_").toString
    val ck = "file:ckpt-n"
    val df = longCol(Seq(None, None))
    val st = StreamingMoments.applyBatch(spark, tmp, ck, df, "value", 0L)
    assert(st.moments.nRows == 2L && st.moments.nNull == 2L &&
      st.moments.n == 0L)
    assert(st.moments.mean.isEmpty && st.moments.variancePop.isEmpty)
    // state round-trip keeps the all-null shape (no phantom fields)
    val rt = StreamingMoments.readState(spark, tmp)
    assert(rt.moments == st.moments)
    // the batch twin agrees
    assert(StreamingMoments.batchMoments(df, "value") == st.moments)
    // toDF carries SQL NULLs for the value-less stats
    val r = StreamingMoments.toDF(spark, rt).head()
    assert(r.getLong(0) == 2L && r.isNullAt(3) && r.isNullAt(5))
  }

  test("decimal-overflow refusal and BigInt state roundtrip at the " +
      "2^63 boundary") {
    import org.apache.spark.sql.Row
    // a NULL decimal sum with n > 0 is a batch that overflowed
    // decimal(38,0) — the fold must refuse LOUDLY, never fold a wrapped
    // number (pinned directly so the refusal can't rot unobserved)
    val overflowed = Row(4L, 3L, 1L, -2L, 7L, null, null)
    val e = intercept[IllegalStateException](
      StreamingMoments.momentsFromRow(overflowed, 0, "overflow spec"))
    assert(e.getMessage.contains("overflowed decimal(38,0)") &&
      e.getMessage.contains("maxFilesPerTrigger"))
    // one null leg alone (sum ok, sum_sq null) must refuse the same way
    val half = Row(2L, 2L, 0L, 1L, 2L,
      new java.math.BigDecimal(3), null)
    intercept[IllegalStateException](
      StreamingMoments.momentsFromRow(half, 0, "overflow spec"))
    // the all-null shape (n == 0) is NOT an overflow — nulls are legal
    assert(StreamingMoments.momentsFromRow(
      Row(2L, 0L, 2L, null, null, null, null), 0, "overflow spec").n == 0L)
    // JSON state roundtrip at the long boundary: min/max at ±2^63-ε and
    // sums far past long range must come back bit-exact (sums are
    // STRING-encoded — a JSON double would round past 2^53)
    val big = StreamingMoments.Moments(5L, 1L, Long.MinValue,
      Long.MaxValue, BigInt(Long.MaxValue) * 3 + 7,
      BigInt("170141183460469231731687303715884105727"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    StreamingMoments.putMoments(node, big)
    assert(StreamingMoments.parseMoments(node) == big,
      "moments JSON roundtrip lost precision at the boundary")
    // the comoments twin: same refusal, same boundary roundtrip
    val cOver = Row(4L, 3L, 1L, 0L, -2L, 7L, 0L, 9L,
      null, null, null, null, null)
    val ec = intercept[IllegalStateException](
      StreamingComoments.comomentsFromRow(cOver, 0, "overflow spec"))
    assert(ec.getMessage.contains("overflowed decimal(38,0)"))
    val cBig = StreamingComoments.Comoments(5L, 1L, 0L, 4L,
      Long.MinValue, Long.MaxValue, -9L, 9L,
      BigInt(Long.MaxValue) * 5 + 1, BigInt(Long.MinValue) * 4 - 3,
      BigInt("99999999999999999999999999999999999999"),
      BigInt("12345678901234567890123456789012345678"),
      BigInt("-99999999999999999999999999999999999999"))
    val cNode = mapper.createObjectNode()
    StreamingComoments.putComoments(cNode, cBig)
    assert(StreamingComoments.parseComoments(cNode) == cBig,
      "comoments JSON roundtrip lost precision at the boundary")
  }
}
