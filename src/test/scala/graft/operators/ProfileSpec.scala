package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the column profiler: null/distinct accounting,
  * min/max cast AFTER aggregation (numeric order, not lexicographic),
  * column selection, and argument validation. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10L), (2L, None, 9L), (3L, Some("b"), 10L)
  ).toDF("id", "s", "v")

  test("profile counts nulls and distincts per column (default sketched " +
      "mode, sparse-exact at these cardinalities)") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    assert(p("s").getLong(2) == 1 && p("s").getLong(3) == 2)
    assert(p("id").getLong(1) == 3 && p("id").getLong(2) == 0)
    // numeric min/max: 9 < 10 even though "10" < "9" lexicographically
    assert(p("v").getString(4) == "9" && p("v").getString(5) == "10")
  }

  test("profile distinct modes: exact opt-in equals ground truth; the " +
      "default sketch lands inside its error bound on a wide column") {
    // 5000 distinct ids — past sparse mode at rsd 0.02, so this pins the
    // ESTIMATOR's bound, not sparse-mode exactness
    val wide = spark.range(5000L).toDF("id")
      .select(col("id"), (col("id") % 7).as("small"))
    val exact = Profile.profile(wide, Seq("id", "small"),
        exactDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact("id") == 5000L && exact("small") == 7L)
    val approx = Profile.profile(wide, Seq("id", "small"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx("small") == 7L, "sparse-exact on the narrow column")
    assert(math.abs(approx("id") - 5000.0) / 5000.0 <= 0.05,
      s"sketch estimate ${approx("id")} outside 5% of 5000")
    intercept[IllegalArgumentException](
      Profile.profile(wide, Seq("id"), rsd = 0.0))
  }

  test("profile plan shape: the default mode shuffles sketches (no " +
      "Expand), the exact opt-in pays the Expand + value-keyed shuffle") {
    val wide = spark.range(100L).toDF("id")
      .select(col("id"), (col("id") % 7).as("small"))
    val approxPlan = Profile.profile(wide, Seq("id", "small"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      "default (sketched) profile must not plan an Expand — partials " +
        "are fixed-size HLL++ sketches at any cardinality")
    val exactPlan = Profile.profile(wide, Seq("id", "small"),
        exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "the exact opt-in IS the Expand plan — that cost is the reason " +
        "exactness is not the default")
  }

  test("profile restricts to requested columns and rejects unknown ones") {
    val one = Profile.profile(df, Seq("id")).collect()
    assert(one.length == 1 && one(0).getString(0) == "id")
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
  }

  test("moments: exact integer sums, null accounting, overflow headroom") {
    val m = Seq(("a", Some(3L)), ("b", None), ("a", Some(-2L)),
        ("b", Some(7L)))
      .map { case (g, v) => (g, v.map(Long.box).orNull) }
      .toDF("g", "v")
    val r = Profile.moments(m, "v").head()
    // (n_rows, n, n_null, vmin, vmax, vsum, vsum_sq)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(r.getLong(3) == -2L && r.getLong(4) == 7L)
    assert(r.getDecimal(5).longValueExact() == 8L)
    assert(r.getDecimal(6).longValueExact() == 9L + 4L + 49L)
    // a long² near the top of the range stays exact (decimal(38,0)
    // headroom — a double would have rounded 18 digits ago)
    val big = Seq(3037000499L, 3037000499L).toDF("v")
    val rb = Profile.moments(big, "v").head()
    assert(BigInt(rb.getDecimal(6).toBigInteger) ==
      BigInt(3037000499L) * 3037000499L * 2)
    intercept[IllegalArgumentException](Profile.moments(m, "nope"))
  }

  test("momentsPerGroup: per-group exactness, null groups excluded") {
    val m = Seq((Some("a"), Some(3L)), (None, Some(100L)),
        (Some("a"), None), (Some("b"), Some(-1L)))
      .map { case (g, v) => (g.orNull, v.map(Long.box).orNull) }
      .toDF("g", "v")
    val rows = Profile.momentsPerGroup(m, "g", "v").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"),
      "null group excluded; ordered by group")
    val a = rows(0)
    assert(a.getLong(1) == 2L && a.getLong(2) == 1L && a.getLong(3) == 1L)
    assert(a.getLong(4) == 3L && a.getLong(5) == 3L)
    val b = rows(1)
    assert(b.getDecimal(6).longValueExact() == -1L &&
      b.getDecimal(7).longValueExact() == 1L)
    intercept[IllegalArgumentException](
      Profile.momentsPerGroup(m, "nope", "v"))
  }

  test("profile handles parser-special column names (dots, backticks)") {
    // a dotted name must resolve as the top-level column the validation
    // accepted — not parse as a nested-field path and fail the select
    val weird = Seq((1L, "a"), (2L, null), (3L, "c"))
      .toDF("user.id", "na`me")
    val p = Profile.profile(weird).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("user.id", "na`me"))
    assert(p("user.id").getLong(1) == 3 && p("user.id").getLong(3) == 3)
    assert(p("na`me").getLong(2) == 1 && p("na`me").getLong(3) == 2)
  }
}
