package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming exact co-moments fold (flat): after any number of
  * micro-batches the state EQUALS the one-shot batch aggregate (the
  * co-moments semilattice has no error term), pairwise-complete null
  * semantics with per-axis exact null counts, replay idempotence,
  * binding guards (checkpoint AND the ordered column pair), the merge
  * laws, and the derived covariance/correlation views. */
class StreamingComomentsSpec extends SparkSpec {
  import spark.implicits._
  import StreamingComoments.{mergeComoments, Comoments}

  private def stage(src: String, batches: Seq[Seq[(Long, Long)]]): Unit =
    batches.foreach(b => b.toDF("x", "y").coalesce(1)
      .write.mode("append").parquet(src))

  /** Two nullable LONG columns — explicit schema (no implicit encoder
    * for boxed longs). */
  private def pairCols(vs: Seq[(Option[Long], Option[Long])]) =
    spark.createDataFrame(
      java.util.Arrays.asList(vs.map { case (x, y) =>
        org.apache.spark.sql.Row(x.map(Long.box).orNull,
          y.map(Long.box).orNull)
      }: _*),
      new org.apache.spark.sql.types.StructType()
        .add("x", org.apache.spark.sql.types.LongType)
        .add("y", org.apache.spark.sql.types.LongType))

  test("many-batch fold EQUALS the batch co-moments; resume works") {
    val tmp = Files.createTempDirectory("graft_scomom_").toString
    // 8 batches x 25 pairs: x = i, y = 3i + (i mod 7) — correlated but
    // not perfectly (the mod ripple), with closed-form exact sums
    val all = (0 until 200).map(i => (i.toLong, 3L * i + i % 7))
    stage(s"$tmp/src", all.grouped(25).toSeq)
    val q = StreamingComoments.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    val st = StreamingComoments.readState(spark, s"$tmp/state")
    assert(st.lastBatchId == 7L)
    val m = st.comoments
    assert(m.nRows == 200L && m.n == 200L &&
      m.nNullX == 0L && m.nNullY == 0L)
    assert(m.xMin == 0L && m.xMax == 199L)
    assert(m.yMin == 0L && m.yMax == 3L * 199 + 199 % 7)
    // exact closed forms
    assert(m.xSum == BigInt(all.map(_._1).sum))
    assert(m.ySum == BigInt(all.map(_._2).sum))
    assert(m.xySum == BigInt(all.map(p => p._1 * p._2).sum))
    // the headline equality: folded ≡ one-shot batch aggregate
    val corpus = spark.read.parquet(s"$tmp/src")
    assert(m == StreamingComoments.batchComoments(corpus, "x", "y"),
      "folded co-moments diverged from the batch twin")
    // derived views: correlation of a near-linear pair is near 1 but,
    // because of the mod-7 ripple, strictly below it
    val c = m.correlation.get
    assert(c > 0.99 && c < 1.0, s"correlation $c outside (0.99, 1)")
    // covariance against the exact-sums definition
    val n = 200.0
    val expCov = m.xySum.toDouble / n -
      (m.xSum.toDouble / n) * (m.ySum.toDouble / n)
    assert(math.abs(m.covariancePop.get - expCov) < 1e-6)

    // resume under the same checkpoint with new arrivals (incl. rows
    // missing one or both sides — pairwise-complete semantics)
    pairCols(Seq((Some(1000L), Some(-5L)), (None, Some(7L)),
      (Some(3L), None), (None, None)))
      .coalesce(1).write.mode("append").parquet(s"$tmp/src")
    val q2 = StreamingComoments.ingest(spark, s"$tmp/src", s"$tmp/state",
      s"$tmp/chk", maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val m2 = StreamingComoments.readState(spark, s"$tmp/state").comoments
    assert(m2.nRows == 204L && m2.n == 201L)
    assert(m2.nNullX == 2L && m2.nNullY == 2L)
    assert(m2.yMin == -5L && m2.xMax == 1000L)
    assert(m2 == StreamingComoments.batchComoments(
      spark.read.parquet(s"$tmp/src"), "x", "y"),
      "post-resume fold diverged")
    // toDF round-trips the exact sums and matches Profile.comoments
    // relation-to-relation (the schema-alignment contract)
    val foldDf = StreamingComoments.toDF(spark,
      StreamingComoments.readState(spark, s"$tmp/state"))
    val batchDf = Profile.comoments(spark.read.parquet(s"$tmp/src"), "x", "y")
    assert(foldDf.collect().toSeq == batchDf.collect().toSeq)
  }

  test("replay idempotence and binding guards (checkpoint, ordered pair)") {
    val tmp = Files.createTempDirectory("graft_scomom_g_").toString
    val ck = "file:ckpt-a"
    val b0 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    val st1 = StreamingComoments.applyBatch(spark, tmp, ck, b0, "x", "y", 0L)
    assert(st1.comoments.n == 3L && st1.comoments.xSum == BigInt(6) &&
      st1.comoments.ySum == BigInt(60) && st1.comoments.xySum == BigInt(140))
    // replayed batch id: skipped, state unchanged
    val st1b = StreamingComoments.applyBatch(spark, tmp, ck,
      Seq((99L, 99L)).toDF("x", "y"), "x", "y", 0L)
    assert(st1b == st1)
    // wrong checkpoint / wrong pair / SWAPPED pair: loud refusals
    intercept[IllegalStateException](StreamingComoments.applyBatch(spark,
      tmp, "file:ckpt-B", b0, "x", "y", 1L))
    intercept[IllegalStateException](StreamingComoments.applyBatch(spark,
      tmp, ck, Seq((1L, 2L)).toDF("a", "y"), "a", "y", 1L))
    intercept[IllegalStateException](StreamingComoments.applyBatch(spark,
      tmp, ck, b0.select(col("y"), col("x")), "y", "x", 1L))
    // a self-pair is the univariate profile — refused at stream entry
    intercept[IllegalArgumentException](StreamingComoments.ingest(spark,
      "/nonexistent", tmp, s"$tmp/chk", xCol = "x", yCol = "x"))
    // fresh state under an advanced checkpoint: the omitted-data guard
    val fresh = Files.createTempDirectory("graft_scomom_f_").toString
    intercept[IllegalStateException](StreamingComoments.applyBatch(spark,
      fresh, ck, b0, "x", "y", 5L))
    // merge laws: associative, commutative, empty-identity — incl. the
    // min/max identity handling on pairless (n == 0) legs
    val a = Comoments(3L, 1L, 0L, 2L, 2L, 9L, -1L, 4L,
      BigInt(11), BigInt(3), BigInt(85), BigInt(17), BigInt(5))
    val b = Comoments(2L, 0L, 0L, 2L, -4L, 1L, 0L, 8L,
      BigInt(-3), BigInt(8), BigInt(17), BigInt(64), BigInt(4))
    val c = Comoments(1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L,
      BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0)) // pairless leg
    assert(mergeComoments(mergeComoments(a, b), c) ==
      mergeComoments(a, mergeComoments(b, c)))
    assert(mergeComoments(a, b) == mergeComoments(b, a))
    assert(mergeComoments(a, StreamingComoments.emptyComoments) == a)
    val cb = mergeComoments(c, b)
    assert(cb.xMin == -4L && cb.xMax == 1L && cb.yMin == 0L && cb.yMax == 8L,
      "a pairless leg must not contribute its placeholder min/max")
  }

  test("pairless and empty folds serve no phantom stats") {
    val tmp = Files.createTempDirectory("graft_scomom_n_").toString
    val ck = "file:ckpt-n"
    // every row is missing at least one side: n = 0, nulls counted per axis
    val df = pairCols(Seq((None, Some(5L)), (Some(3L), None), (None, None)))
    val st = StreamingComoments.applyBatch(spark, tmp, ck, df, "x", "y", 0L)
    assert(st.comoments.nRows == 3L && st.comoments.n == 0L)
    assert(st.comoments.nNullX == 2L && st.comoments.nNullY == 2L)
    assert(st.comoments.meanX.isEmpty && st.comoments.covariancePop.isEmpty &&
      st.comoments.correlation.isEmpty)
    // state round-trip keeps the pairless shape (no phantom fields)
    val rt = StreamingComoments.readState(spark, tmp)
    assert(rt.comoments == st.comoments)
    // the batch twin agrees
    assert(StreamingComoments.batchComoments(df, "x", "y") == st.comoments)
    // toDF carries SQL NULLs for the pair stats
    val r = StreamingComoments.toDF(spark, rt).head()
    assert(r.getLong(0) == 3L && r.isNullAt(4) && r.isNullAt(8) &&
      r.isNullAt(12))
    // a CONSTANT side has zero variance: correlation undefined (None),
    // never NaN or a division blow-up
    val cst = StreamingComoments.batchComoments(
      Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y"), "x", "y")
    assert(cst.correlation.isEmpty && cst.covariancePop.contains(0.0))
  }
}
