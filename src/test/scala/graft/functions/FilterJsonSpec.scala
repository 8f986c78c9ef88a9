package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FIXTURES.md §3 filter-language conformance corpus
  * (mirrors `/root/reference/src/core/metadata_filter.rs:375-616` and
  * `tests/unit/metadata_filter_tests.rs`).
  */
class FilterJsonSpec extends SparkSpec {

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      1 -> """{"category": "technology", "title": "AI News", "published": true}""",
      2 -> """{"category": "sports", "title": "Game Results", "published": false}""",
      3 -> """{"status": "active", "priority": 1}""",
      4 -> """{"status": "pending", "priority": 8}""",
      5 -> """{"status": "archived", "priority": 2}""",
      6 -> """{"age": 17}""", 7 -> """{"age": 25}""",
      8 -> """{"age": 65}""", 9 -> """{"age": 66}""",
      10 -> """{"views": 999}""", 11 -> """{"views": 1000}""",
      12 -> """{"views": 5000}""", 13 -> """{"views": 5001}""",
      14 -> """{"tags": ["ai", "ml", "technology"]}""",
      15 -> """{"user": {"id": "123", "name": "Alice", "profile": {"email": "test@example.com"}}}""",
      16 -> """{"age": "18"}""",
      17 -> """{"status": "urgent"}"""
    ).toDF("id", "metadata").cache()
  }

  private def matches(filter: String): Set[Int] =
    docs.filter(FilterJson.predicate(filter, col("metadata")))
      .select("id").collect().map(_.getInt(0)).toSet

  test("F1 equals on string") {
    assert(matches("""{"category": "technology"}""") == Set(1))
  }
  test("F1 equals on boolean") {
    assert(matches("""{"published": true}""") == Set(1))
    assert(matches("""{"published": false}""") == Set(2))
  }
  test("F2 $in membership") {
    assert(matches("""{"status": {"$in": ["active", "pending"]}}""") == Set(3, 4))
    assert(matches("""{"status": {"$in": []}}""") == Set.empty[Int])
    // numeric membership (reference test_in_filter_numbers)
    assert(matches("""{"priority": {"$in": [1, 2, 3]}}""") == Set(3, 5))
  }

  test("complex nested $and/$or over dot-paths (reference test_complex_nested_filter)") {
    import spark.implicits._
    val df = Seq(
      (1, """{"article": {"category": "technology", "views": 1500, "featured": false}, "author": {"verified": true}}"""),
      (2, """{"article": {"category": "technology", "views": 10, "featured": true}, "author": {"verified": true}}"""),
      (3, """{"article": {"category": "technology", "views": 10, "featured": false}, "author": {"verified": true}}"""),
      (4, """{"article": {"category": "sports", "views": 1500, "featured": true}, "author": {"verified": true}}"""),
      (5, """{"article": {"category": "technology", "views": 1500, "featured": true}, "author": {"verified": false}}""")
    ).toDF("id", "metadata")
    val f = """{"$and": [
      {"article.category": "technology"},
      {"$or": [{"article.views": {"$gte": 1000}}, {"article.featured": true}]},
      {"author.verified": true}]}"""
    assert(df.filter(FilterJson.predicate(f, col("metadata")))
      .select("id").collect().map(_.getInt(0)).toSet == Set(1, 2))
  }
  test("F3 inclusive range $gte/$lte") {
    assert(matches("""{"age": {"$gte": 18, "$lte": 65}}""") == Set(7, 8))
  }
  test("F3 exclusive bounds $gt/$lt") {
    assert(matches("""{"views": {"$gt": 999, "$lt": 5001}}""") == Set(11, 12))
  }
  test("F3 mixed $gte+$gt is a parse error") {
    intercept[FilterJson.FilterParseException] {
      FilterJson.predicate("""{"age": {"$gte": 1, "$gt": 2}}""", col("metadata"))
    }
  }
  test("F3 numeric filter does not match stored string (type-exact)") {
    assert(matches("""{"age": {"$gte": 18}}""") == Set(7, 8, 9)) // id 16 has "18" string
    assert(matches("""{"age": 18}""") == Set.empty[Int])
    assert(matches("""{"age": "18"}""") == Set(16))
  }
  test("F4 $and + implicit AND of multiple fields") {
    assert(matches("""{"$and": [{"category": "technology"}, {"published": true}]}""") == Set(1))
    assert(matches("""{"category": "technology", "published": true}""") == Set(1))
    assert(matches("""{"category": "technology", "published": false}""") == Set.empty[Int])
    assert(matches("""{"$and": []}""") == docs.select("id").collect().map(_.getInt(0)).toSet)
  }
  test("F5 $or") {
    assert(matches("""{"$or": [{"status": "urgent"}, {"priority": {"$gte": 8}}]}""") == Set(4, 17))
    assert(matches("""{"$or": []}""") == Set.empty[Int])
  }
  test("F6 dot-path nested access; missing path never matches") {
    assert(matches("""{"user.id": "123"}""") == Set(15))
    assert(matches("""{"user.profile.email": "test@example.com"}""") == Set(15))
    assert(matches("""{"user.missing.path": "x"}""") == Set.empty[Int])
  }
  test("F1 array containment") {
    assert(matches("""{"tags": "ai"}""") == Set(14))
    assert(matches("""{"tags": "nope"}""") == Set.empty[Int])
  }
  test("F7 unsupported operator / empty object value are parse errors") {
    intercept[FilterJson.FilterParseException] {
      FilterJson.predicate("""{"$invalid": "x"}""", col("metadata"))
    }
    intercept[FilterJson.FilterParseException] {
      FilterJson.predicate("""{"f": {}}""", col("metadata"))
    }
  }
  test("F8 empty filter matches everything (delete path)") {
    assert(matches("{}") == docs.select("id").collect().map(_.getInt(0)).toSet)
  }
  test("nested-object-as-equals fallback") {
    assert(matches("""{"user.profile": {"email": "test@example.com"}}""") == Set(15))
  }

  test("nested-object equality is structural (key order never matters)") {
    import spark.implicits._
    val df = Seq((1, """{"obj": {"b": 1, "a": "x"}}"""))
      .toDF("id", "metadata")
    def hit(f: String) =
      df.filter(FilterJson.predicate(f, col("metadata"))).count() == 1
    assert(hit("""{"obj": {"a": "x", "b": 1}}"""))
    assert(hit("""{"obj": {"b": 1, "a": "x"}}"""))
    assert(!hit("""{"obj": {"a": "x", "b": 2}}"""))
    // equality against a stored ARRAY is containment of the value as an
    // ELEMENT — an object filter value matches an element structurally...
    val arr = Seq((1, """{"list": [{"y": 2, "x": 1}]}""")).toDF("id", "metadata")
    assert(arr.filter(FilterJson.predicate(
      """{"list": {"x": 1, "y": 2}}""", col("metadata"))).count() == 1)
    // ...while WHOLE-ARRAY equality deliberately does NOT match: the
    // reference's array branch is containment only (metadata_filter.rs
    // :274-279 — arr.contains(value), so [..] is looked up as an element)
    assert(arr.filter(FilterJson.predicate(
      """{"list": [{"x": 1, "y": 2}]}""", col("metadata"))).count() == 0)
    // $in, by contrast, compares WHOLE values (:285-291): the stored
    // array matches an identical array listed in $in
    assert(arr.filter(FilterJson.predicate(
      """{"list": {"$in": [[{"x": 1, "y": 2}]]}}""", col("metadata"))).count() == 1)
  }

  test("reference-exact leniency: $and claims the filter; operator-object fallbacks") {
    // a top-level $and claims the whole filter — sibling keys are IGNORED
    // (from_json:91-97 early-returns before reading anything else)
    assert(matches("""{"$and": [{"category": "technology"}], "published": false}""") == Set(1))
    // a $in key claims the operator object — sibling ops ignored (:162)
    assert(matches("""{"status": {"$in": ["active"], "$gte": 99}}""") == Set(3))
    // a non-numeric bound is ignored while the numeric one applies
    // (as_f64 = None, :166-169): only $lt 66 is live here
    assert(matches("""{"age": {"$gte": "x", "$lt": 66}}""") == Set(6, 7, 8))
    // an operator object with NO numeric bound degrades to structural
    // equality on the literal object (:225-229) — no rows store it, so
    // it matches nothing, and it must NOT be a parse error
    assert(matches("""{"age": {"$gte": "x"}}""") == Set.empty[Int])
    // ...but an unrecognized $op (with no live bound) still errors (:205-216)
    intercept[FilterJson.FilterParseException] {
      matches("""{"age": {"$bogus": 1}}""")
    }
    // a bogus $op NEXT TO a live numeric bound is ignored (:192-203
    // returns the range before any key check)
    assert(matches("""{"age": {"$gte": 18, "$bogus": 1, "also": 2}}""") == Set(7, 8, 9))
  }

  test("$and/$or reject non-object elements (never match-everything)") {
    intercept[FilterJson.FilterParseException] {
      matches("""{"$or": ["oops"]}""")
    }
    intercept[FilterJson.FilterParseException] {
      matches("""{"$and": [{"age": 25}, 7]}""")
    }
  }

  test("array containment is type-exact and tolerates mixed-type arrays") {
    import spark.implicits._
    val df = Seq(
      (1, """{"tags": [5, "x"]}"""),
      (2, """{"tags": ["5"]}"""),
      (3, """{"tags": [true]}""")
    ).toDF("id", "metadata")
    def hit(f: String) = df.filter(FilterJson.predicate(f, col("metadata")))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(hit("""{"tags": 5}""") == Set(1))   // number matches number only,
                                               // even next to a string element
    assert(hit("""{"tags": "5"}""") == Set(2)) // string matches string only
    assert(hit("""{"tags": "x"}""") == Set(1))
    assert(hit("""{"tags": true}""") == Set(3))
  }

  test("null metadata rows never match field filters but match the empty filter") {
    import spark.implicits._
    val df = Seq((1, Some("""{"a": 1}""")), (2, Option.empty[String]))
      .toDF("id", "metadata")
    def ids(f: String): Set[Int] =
      df.filter(FilterJson.predicate(f, col("metadata")))
        .select("id").collect().map(_.getInt(0)).toSet
    assert(ids("""{"a": 1}""") == Set(1))
    assert(ids("""{"a": {"$gte": 0}}""") == Set(1))
    assert(ids("{}") == Set(1, 2)) // empty filter matches everything, null too
  }
}
