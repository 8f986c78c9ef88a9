package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Kernel correctness: codegen expressions vs. the higher-order-function
  * reference implementations, plus the reference's proptest invariants
  * (`/root/reference/tests/core/vector_ops.rs:87-139`).
  */
class VectorKernelSpec extends SparkSpec {
  import VectorExpressions._

  /** Deterministic scalacheck sampling (no scalatestplus in the offline cache). */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private lazy val emb = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100).cache()
  }

  test("codegen kernels agree with higher-order-function reference on real embeddings") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val joined = emb.crossJoin(broadcast(q))
    val rows = joined.select(
      vecDot(col("embedding"), col("q")).as("dot_cg"),
      VectorFunctions.dotProduct(col("embedding"), col("q")).as("dot_hof"),
      vecCosine(col("embedding"), col("q")).as("cos_cg"),
      VectorFunctions.cosineSimilarity(col("embedding"), col("q")).as("cos_hof"),
      vecL2(col("embedding"), col("q")).as("l2_cg"),
      VectorFunctions.euclideanDistance(col("embedding"), col("q")).as("l2_hof"),
      vecNorm(col("embedding")).as("n_cg"),
      VectorFunctions.norm(col("embedding")).as("n_hof")
    ).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
      assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 1e-9)
      assert(math.abs(r.getDouble(6) - r.getDouble(7)) < 1e-9)
    }
  }

  test("MatVec kernel: per-row dots reference, orthogonal-identity, mismatch is loud") {
    import spark.implicits._
    // property sampling: random matrices x random vectors — the codegen
    // loop must equal the per-row vecDot reference bit-for-bit (same
    // double-accumulate, float result)
    val gen = for {
      d <- Gen.choose(2, 24)
      r <- Gen.choose(1, 16)
      m <- Gen.listOfN(r, Gen.listOfN(d, Gen.choose(-2f, 2f)))
      v <- Gen.listOfN(d, Gen.choose(-2f, 2f))
    } yield (m.map(_.toArray).toArray, v.toArray)
    samples(gen, 25).zipWithIndex.foreach { case ((m, v), i) =>
      val df = Seq(Tuple1(v)).toDF("v")
      val got = df.select(matVec(col("v"), m)).head().getSeq[Float](0)
      val expect = df.select(array(m.map(row =>
        vecDot(col("v"), typedLit(row)).cast("float")): _*))
        .head().getSeq[Float](0)
      assert(got == expect, s"sample $i: kernel diverged from dots")
    }
    // identity matrix is a no-op on real embeddings (whole column, one
    // plan — also exercises the kernel over parquet-scan input)
    val eye = Array.tabulate(64, 64)((a, b) => if (a == b) 1.0f else 0.0f)
    val same = emb.select(col("embedding").as("e"))
      .select(matVec(col("e"), eye).as("r"), col("e"))
      .collect().forall(r => r.getSeq[Float](0) == r.getSeq[Float](1))
    assert(same, "identity MatVec must be a no-op")
    // dimension mismatch is a loud error, not a truncated product
    val e = intercept[Exception] {
      Seq(Tuple1(Array(1.0f, 2.0f))).toDF("v")
        .select(matVec(col("v"), Array(Array(1.0f, 2.0f, 3.0f))))
        .collect()
    }
    assert(e.toString.contains("dimension mismatch")
      || Option(e.getCause).exists(_.toString.contains("dimension mismatch")),
      e.toString)
    // null input propagates null
    val nul = Seq(Tuple1(null.asInstanceOf[Array[Float]])).toDF("v")
      .select(matVec(col("v"), Array(Array(1.0f)))).head()
    assert(nul.isNullAt(0))
  }

  test("cosine properties: bounded, self-similarity 1, zero-norm -> 0") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 32)
      v <- Gen.listOfN(n, Gen.choose(-1f, 1f))
      w <- Gen.listOfN(n, Gen.choose(-1f, 1f))
    } yield (v.toArray, w.toArray)
    val df = samples(gen, 30).toDF("a", "b")
    df.select(
      vecCosine(col("a"), col("b")).as("ab"),
      vecCosine(col("a"), col("a")).as("aa"),
      VectorFunctions.norm(col("a")).as("na")).collect().foreach { r =>
      val ab = r.getDouble(0)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      if (r.getDouble(2) > 1e-6) assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
    }
    // zero-norm => similarity 0 (reference src/core/vector_ops.rs:44-48)
    val z = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(z.select(vecCosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("euclidean properties: symmetric, non-negative, identity") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 32)
      v <- Gen.listOfN(n, Gen.choose(-100f, 100f))
      w <- Gen.listOfN(n, Gen.choose(-100f, 100f))
    } yield (v.toArray, w.toArray)
    val df = samples(gen, 30).toDF("a", "b")
    df.select(
      vecL2(col("a"), col("b")).as("ab"),
      vecL2(col("b"), col("a")).as("ba"),
      vecL2(col("a"), col("a")).as("aa")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(r.getDouble(0) >= 0.0)
      assert(r.getDouble(2) == 0.0)
    }
  }

  test("dimension mismatch is an error, not a truncated distance") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(vecL2(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dimension mismatch")), e.toString)
  }

  test("null input propagates null") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(vecCosine(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("kernels run inside WholeStageCodegen") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val df = emb.crossJoin(broadcast(q))
      .select(vecCosine(col("embedding"), col("q")).as("c"))
    df.collect() // finalize the AQE plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    // "*(n) Project [vec_cosine..." — the * prefix marks a WholeStageCodegen span
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[vec_cosine.*"), plan)
  }

  test("SQL registration works") {
    VectorExpressions.register(spark)
    emb.createOrReplaceTempView("emb_t")
    val n = spark.sql(
      "SELECT vec_cosine(a.embedding, b.embedding) c FROM emb_t a JOIN emb_t b ON b.vec_id = 0")
      .filter(col("c") > -2).count()
    assert(n == 100)
  }

  test("M6 innerProductToCosine recovers cosine from dot and norms") {
    import spark.implicits._
    val pairs = emb.limit(20).select(col("embedding").as("a"))
      .crossJoin(emb.filter(col("vec_id") === 1).select(col("embedding").as("b")))
    pairs.select(
      vecCosine(col("a"), col("b")).as("cos"),
      VectorFunctions.innerProductToCosine(
        vecDot(col("a"), col("b")), vecNorm(col("a")), vecNorm(col("b"))).as("rec"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    // zero-norm operand => 0, matching the cosine kernel's convention
    val z = Seq((Array(0f, 0f), Array(3f, 4f))).toDF("a", "b")
    val zr = z.select(
      VectorFunctions.innerProductToCosine(
        vecDot(col("a"), col("b")), vecNorm(col("a")), vecNorm(col("b")))).head()
    assert(zr.getDouble(0) == 0.0)
  }

  test("normalize, angular distance, and scoring helpers match closed forms") {
    import spark.implicits._
    val df = Seq((Array(3f, 4f), Array(4f, -3f))).toDF("a", "b")
    // normalize -> unit norm; zero vector passes through
    val n = df.select(VectorFunctions.norm(VectorFunctions.normalize(col("a")))).head()
    assert(math.abs(n.getDouble(0) - 1.0) < 1e-6)
    val z = Seq(Tuple1(Array(0f, 0f))).toDF("a")
      .select(VectorFunctions.normalize(col("a"))).head().getSeq[Float](0)
    assert(z == Seq(0f, 0f))
    // orthogonal vectors: angular distance pi/2 via both implementations
    val ang = df.select(
      VectorFunctions.angularDistance(col("a"), col("b")).as("hof"),
      graft.operators.Knn.distance("angular", col("a"), col("b")).as("op")).head()
    assert(math.abs(ang.getDouble(0) - math.Pi / 2) < 1e-9)
    assert(math.abs(ang.getDouble(1) - math.Pi / 2) < 1e-9)
    // scoring closed forms (M7-M10)
    val s = spark.range(1).select(
      VectorFunctions.distanceToScore(lit(3.0)).as("d2s"),
      VectorFunctions.oneMinusDistance(lit(0.25)).as("omd"),
      VectorFunctions.timeDecay(
        to_timestamp(lit("2026-01-01 00:00:00")),
        to_timestamp(lit("2026-01-02 00:00:00")), halfLifeSeconds = 43200).as("decay"),
      VectorFunctions.popularityBoost(lit(0)).as("pop0"),
      VectorFunctions.popularityBoost(lit(math.E * math.E - 1)).as("pop"),
      VectorFunctions.combinedScore(lit(0.5), lit(0.25), lit(1.0),
        0.6, 0.2, 0.2, fallback = lit(-1.0)).as("comb"),
      // weights summing to 2.0: reference normalizes by the TOTAL
      // (search_integration.rs:355-370), so doubling every weight must
      // not change the score
      VectorFunctions.combinedScore(lit(0.5), lit(0.25), lit(1.0),
        1.2, 0.4, 0.4, fallback = lit(-1.0)).as("comb2"),
      // zero total weight: the reference's fallback to the base score
      VectorFunctions.combinedScore(lit(0.5), lit(0.25), lit(1.0),
        0.0, 0.0, 0.0, fallback = lit(0.875)).as("combz"),
      // FUTURE timestamp: age clamps at 0 (the reference's
      // .to_std().unwrap_or(0)) -> decay exactly 1.0, never a boost
      VectorFunctions.timeDecay(
        to_timestamp(lit("2026-01-03 00:00:00")),
        to_timestamp(lit("2026-01-02 00:00:00")), halfLifeSeconds = 43200).as("decayf"),
      // metadata boost path (CosineSimilarity scorer): parseable boost
      // multiplies; garbage/absent falls through to the base score
      VectorFunctions.boostedScore(lit(0.5), lit("2.5")).as("boosted"),
      VectorFunctions.boostedScore(lit(0.5), lit("not-a-number")).as("boostbad"),
      VectorFunctions.boostedScore(lit(0.5), lit(null).cast("string")).as("boostnull")
    ).head()
    assert(math.abs(s.getDouble(0) - 0.25) < 1e-12)
    assert(math.abs(s.getDouble(1) - 0.75) < 1e-12)
    assert(math.abs(s.getDouble(2) - 0.25) < 1e-12) // two half-lives
    assert(math.abs(s.getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(s.getDouble(4) - 1.2) < 1e-12)  // 1 + ln(e^2)/10
    assert(math.abs(s.getDouble(5) - (0.3 + 0.05 + 0.2)) < 1e-12)
    assert(math.abs(s.getDouble(6) - (0.3 + 0.05 + 0.2)) < 1e-12) // normalized
    assert(math.abs(s.getDouble(7) - 0.875) < 1e-12) // zero-weight fallback
    assert(math.abs(s.getDouble(8) - 1.0) < 1e-12)   // future ts: no boost
    assert(math.abs(s.getDouble(9) - 1.25) < 1e-12)
    assert(math.abs(s.getDouble(10) - 0.5) < 1e-12)
    assert(math.abs(s.getDouble(11) - 0.5) < 1e-12)
    // NULL timestamp must PROPAGATE, not clamp to age 0: Spark's greatest
    // skips nulls, so a greatest-based clamp would score an undated row
    // as maximally fresh (decay 1.0) above genuinely recent rows
    val sn = spark.range(1).select(
      VectorFunctions.timeDecay(lit(null).cast("timestamp"),
        to_timestamp(lit("2026-01-02 00:00:00")), halfLifeSeconds = 43200)
        .as("d")).head()
    assert(sn.isNullAt(0), "null ts must yield null decay, not 1.0")
  }

  test("quantization round-trip within 1/255 of range") {
    import spark.implicits._
    val df = emb.select(col("embedding"),
      VectorFunctions.quantizeU8(col("embedding")).as("q"))
      .select(col("embedding"),
        VectorFunctions.dequantizeU8(col("q.codes"), col("q.vmin"), col("q.vmax")).as("deq"))
    df.collect().foreach { r =>
      val orig = r.getSeq[Float](0)
      val deq = r.getSeq[Float](1)
      val range = orig.max - orig.min
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= range / 255.0 + 1e-6)
      }
    }
  }
}
