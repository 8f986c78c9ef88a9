package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import scala.jdk.CollectionConverters._

/** MongoDB-style metadata filter language -> Catalyst predicate (SURVEY.md
  * §2.2 F1-F8): translator for the reference's filter AST
  * (`/root/reference/src/core/metadata_filter.rs:86-373`).
  *
  * Operates on a JSON-string metadata column. JSON *type* semantics are
  * preserved via the raw-token trick: `to_json(variant_get(v, path))` yields
  * the raw JSON token (`18` vs `"18"`), so numeric filters do not match
  * stored strings (metadata_filter.rs:293-317) and equality is type-exact.
  *
  * Reference semantics honored (r10: made reference-EXACT after a
  * line-by-line diff, including the lenient fallbacks a strict translator
  * would reject — a reference user's filters must behave identically):
  *  - equality on a stored ARRAY field is containment ONLY — the filter
  *    value (of ANY type, object/array included) is matched against the
  *    array's ELEMENTS, never against the whole array (`:274-279`:
  *    `arr.contains(value)` is the entire array branch)
  *  - `$in` membership compares WHOLE values (a stored array matches only
  *    if the $in list contains the entire array) (`:285-291`); a `$in`
  *    key claims the operator object — sibling keys are ignored (`:162`)
  *  - `$gt/$gte/$lt/$lte` numeric ranges; a NON-NUMERIC bound is ignored
  *    (as_f64 = None, `:166-169`); mixing `$gte`+`$gt` (or `$lte`+`$lt`)
  *    errors only when BOTH parse as numbers (`:172-177`); non-$ sibling
  *    keys are ignored when a range matches (`:192-203` returns before
  *    any key check); non-numeric stored value never matches (`:293-317`)
  *  - an operator-shaped object with NO recognized numeric bound and no
  *    unsupported `$op` falls back to STRUCTURAL EQUALITY on the whole
  *    object (`:225-229`) — `{"age": {"$gte": "x"}}` is an equality
  *    filter for the literal object, not an error
  *  - `$and` (empty => true), `$or` (empty => false) (`:319-333`); a
  *    top-level `$and` claims the whole filter and sibling keys are
  *    IGNORED, then `$or` likewise (`:91-97` early-returns)
  *  - multiple top-level fields are implicit AND (`:111-116`)
  *  - dot-path nested access; missing path never matches (`:359-373`)
  *  - unsupported top-level/field `$op` and empty object value are parse
  *    errors (`:99-104`, `:205-223`)
  *  - top-level `{}` matches everything (And([]) vacuous truth; the
  *    delete path relies on it, `bindings/node/src/session.rs:838-841`)
  *
  * Known deviation (documented): numeric equality compares as double, so
  * `18` matches `18.0` (serde_json distinguishes i64/f64 representations).
  */
object FilterJson {

  final class FilterParseException(msg: String) extends IllegalArgumentException(msg)

  private val mapper = new ObjectMapper()
  private val rangeOps = Set("$gt", "$gte", "$lt", "$lte")

  /** Parse + translate a filter JSON against a JSON-string metadata column. */
  def predicate(filterJson: String, metadataCol: Column): Column = {
    val root = parse(filterJson)
    translate(root, parse_json(metadataCol))
  }

  /** Same, but the metadata column is already VARIANT. */
  def predicateOnVariant(filterJson: String, v: Column): Column =
    translate(parse(filterJson), v)

  private def parse(filterJson: String): JsonNode = {
    val root =
      try mapper.readTree(filterJson)
      catch { case e: Exception => throw new FilterParseException(s"invalid filter JSON: ${e.getMessage}") }
    if (root == null || !root.isObject)
      throw new FilterParseException("filter must be a JSON object")
    root
  }

  private def translate(obj: JsonNode, v: Column): Column = {
    val fields = obj.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
    if (fields.isEmpty) return lit(true) // empty filter matches everything
    // reference precedence (from_json:91-97): a $and key CLAIMS the whole
    // filter and every sibling key is ignored; then $or likewise
    fields.find(_._1 == "$and").foreach { case (_, value) =>
      if (!value.isArray) throw new FilterParseException("$and expects an array")
      val subs = value.elements().asScala.toSeq.map(clause("$and", _)).map(translate(_, v))
      return if (subs.isEmpty) lit(true) else subs.reduce(_ && _)
    }
    fields.find(_._1 == "$or").foreach { case (_, value) =>
      if (!value.isArray) throw new FilterParseException("$or expects an array")
      val subs = value.elements().asScala.toSeq.map(clause("$or", _)).map(translate(_, v))
      return if (subs.isEmpty) lit(false) else subs.reduce(_ || _)
    }
    val preds = fields.map {
      case (op, _) if op.startsWith("$") =>
        throw new FilterParseException(s"unsupported operator: $op")
      case (field, value) => fieldPredicate(field, value, v)
    }
    preds.reduce(_ && _)
  }

  /** Each $and/$or element must itself be a filter object — a stray scalar
    * would otherwise translate like an empty filter (match-everything),
    * which turns a malformed delete filter into delete-everything. */
  private def clause(op: String, n: JsonNode): JsonNode = {
    if (!n.isObject)
      throw new FilterParseException(s"$op elements must be objects, got: ${compact(n)}")
    n
  }

  private def fieldPredicate(field: String, value: JsonNode, v: Column): Column = {
    if (value.isObject) {
      val keys = value.properties().asScala.toSeq.map(_.getKey)
      if (keys.isEmpty)
        throw new FilterParseException(s"empty object value for field '$field'")
      if (keys.exists(_.startsWith("$"))) {
        operatorPredicate(field, value, keys, v)
      } else {
        // nested-object-as-equals fallback: structural match (containment
        // against a stored array's elements, like every equality)
        equalsPredicate(field, value, v)
      }
    } else {
      equalsPredicate(field, value, v)
    }
  }

  /** Reference-exact operator-object translation — including its lenient
    * fallbacks (parse_field_filter:160-239, see object scaladoc): `$in`
    * claims the object; numeric range bounds win next (non-numeric bounds
    * and non-$ siblings ignored, same-side mixing errors only when both
    * bounds are numeric); an unrecognized `$op` errors; and an operator
    * object with no numeric bound degrades to structural EQUALITY on the
    * whole object. */
  private def operatorPredicate(field: String, value: JsonNode, keys: Seq[String], v: Column): Column = {
    if (keys.contains("$in")) {
      val arr = value.get("$in")
      if (!arr.isArray) throw new FilterParseException("$in expects an array")
      val elems = arr.elements().asScala.toSeq
      if (elems.isEmpty) lit(false)
      else elems.map(equalsPredicate(field, _, v, arrayContainment = false)).reduce(_ || _)
    } else {
      def numOf(k: String): Option[Double] =
        Option(value.get(k)).filter(_.isNumber).map(_.asDouble())
      val gte = numOf("$gte"); val gt = numOf("$gt")
      val lte = numOf("$lte"); val lt = numOf("$lt")
      if (gte.isDefined && gt.isDefined)
        throw new FilterParseException(s"cannot mix $$gt and $$gte on '$field'")
      if (lte.isDefined && lt.isDefined)
        throw new FilterParseException(s"cannot mix $$lt and $$lte on '$field'")
      val num = numToken(field, v)
      val bounds =
        gte.map(b => num >= lit(b)).toSeq ++ gt.map(b => num > lit(b)) ++
          lte.map(b => num <= lit(b)) ++ lt.map(b => num < lit(b))
      if (bounds.nonEmpty) bounds.reduce(_ && _)
      else {
        keys.find(k => k.startsWith("$") && !rangeOps.contains(k))
          .foreach(k => throw new FilterParseException(s"unsupported operator: $k"))
        // no numeric bound parsed and every $op recognized: the reference
        // treats the whole object as an equality literal (:225-229)
        equalsPredicate(field, value, v)
      }
    }
  }

  /** Raw JSON token of a dot-path field: `18`, `"18"`, `true`, `[...]`,
    * `{...}`, `null`; SQL NULL when the path is missing. */
  private def rawToken(field: String, v: Column): Column =
    to_json(variant_get(v, jsonPath(field), "variant"))

  /** Double value of the field when it is a JSON number, else SQL NULL.
    * A JSON number token starts with a digit or '-'; the guard keeps ANSI
    * cast from throwing on quoted strings/booleans/arrays. */
  private def numToken(field: String, v: Column): Column = {
    val raw = rawToken(field, v)
    when(raw.rlike("^-?[0-9]"), raw.cast(DoubleType))
  }

  private def jsonPath(field: String): String =
    "$." + field // dot-paths pass through: "user.id" -> "$.user.id"

  /** Reference-exact equality (matches:270-283): when the STORED field is
    * an array, the filter value — of ANY type, arrays and objects
    * included — is matched against the array's ELEMENTS (containment),
    * and whole-array equality is deliberately NOT a match (`arr.contains
    * (value)` is the reference's entire array branch); when the stored
    * field is not an array, equality is structural. `$in` passes
    * `arrayContainment = false`: the reference compares each $in element
    * against the WHOLE stored value there (:285-291), so a stored array
    * can only match an identical array listed in $in.
    *
    * Tokens compare raw (try_variant_get / to_json), keeping
    * type-exactness: "5" never matches stored [5], and a stray string
    * element can't poison numeric containment the way a typed from_json
    * parse (null whole-array on mixed types) would. */
  private def equalsPredicate(field: String, value: JsonNode, v: Column,
      arrayContainment: Boolean = true): Column = {
    val raw = rawToken(field, v)
    def numGuard(tok: Column): Column =
      when(tok.rlike("^-?[0-9]"), tok.cast(DoubleType))
    val litTok: String =
      if (value.isTextual) compact(value)
      else if (value.isBoolean) value.asBoolean().toString
      else if (value.isNull) "null"
      else if (value.isNumber || value.isArray || value.isObject)
        compact(canonicalize(value))
      else throw new FilterParseException(s"unsupported literal for '$field'")
    def eqTok(tok: Column): Column =
      if (value.isNumber) numGuard(tok) === lit(value.asDouble())
      else tok === lit(litTok)
    val scalar = eqTok(raw)
    if (!arrayContainment) scalar
    else {
      val elems = try_variant_get(v, jsonPath(field), "array<variant>")
      when(elems.isNotNull,
        coalesce(exists(elems, x => eqTok(to_json(x))), lit(false)))
        .otherwise(scalar)
    }
  }

  private def compact(n: JsonNode): String = mapper.writeValueAsString(n)

  /** Recursively sort object keys: variant `to_json` renders objects in
    * canonical (sorted-key) form, so object equality must compare the
    * filter literal in the same form — the reference compares
    * serde_json::Value structurally (metadata_filter.rs equality), where
    * key order never matters. */
  private def canonicalize(n: JsonNode): JsonNode =
    if (n.isObject) {
      val sorted = mapper.createObjectNode()
      n.properties().asScala.toSeq.sortBy(_.getKey)
        .foreach(e => sorted.set[JsonNode](e.getKey, canonicalize(e.getValue)))
      sorted
    } else if (n.isArray) {
      val arr = mapper.createArrayNode()
      n.elements().asScala.foreach(e => arr.add(canonicalize(e)))
      arr
    } else n
}
