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

  test("profile counts nulls and exact distincts per column") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    assert(p("s").getLong(2) == 1 && p("s").getLong(3) == 2)
    assert(p("id").getLong(1) == 3 && p("id").getLong(2) == 0)
    // numeric min/max: 9 < 10 even though "10" < "9" lexicographically
    assert(p("v").getString(4) == "9" && p("v").getString(5) == "10")
  }

  test("profile restricts to requested columns and rejects unknown ones") {
    val one = Profile.profile(df, Seq("id")).collect()
    assert(one.length == 1 && one(0).getString(0) == "id")
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
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
