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
  * Reference semantics honored:
  *  - equality on a stored ARRAY field is containment (`:274-279`)
  *  - `$in` membership (`:285-291`)
  *  - `$gt/$gte/$lt/$lte` numeric ranges; mixing `$gte`+`$gt` (or
  *    `$lte`+`$lt`) is a parse error (`:172-177`); non-numeric stored value
  *    never matches (`:293-317`)
  *  - `$and` (empty => true), `$or` (empty => false) (`:319-333`)
  *  - multiple top-level fields are implicit AND (`:111-116`)
  *  - dot-path nested access; missing path never matches (`:359-373`)
  *  - unsupported `$op` / empty object value are parse errors (`:218-239`)
  *  - top-level `{}` matches everything (delete path,
  *    `bindings/node/src/session.rs:838-841`)
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
    val preds = fields.map {
      case ("$and", value) =>
        if (!value.isArray) throw new FilterParseException("$and expects an array")
        val subs = value.elements().asScala.toSeq.map(clause("$and", _)).map(translate(_, v))
        if (subs.isEmpty) lit(true) else subs.reduce(_ && _)
      case ("$or", value) =>
        if (!value.isArray) throw new FilterParseException("$or expects an array")
        val subs = value.elements().asScala.toSeq.map(clause("$or", _)).map(translate(_, v))
        if (subs.isEmpty) lit(false) else subs.reduce(_ || _)
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
        // nested-object-as-equals fallback: structural match — canonicalize
        // the filter side to the sorted-key form variant to_json emits
        rawToken(field, v) === lit(compact(canonicalize(value)))
      }
    } else {
      equalsPredicate(field, value, v)
    }
  }

  private def operatorPredicate(field: String, value: JsonNode, keys: Seq[String], v: Column): Column = {
    keys.find(k => !k.startsWith("$")).foreach { k =>
      throw new FilterParseException(s"cannot mix operators and fields ('$k' in '$field')")
    }
    if (keys.contains("$in")) {
      if (keys.length > 1) throw new FilterParseException("$in cannot be combined with other operators")
      val arr = value.get("$in")
      if (!arr.isArray) throw new FilterParseException("$in expects an array")
      val elems = arr.elements().asScala.toSeq
      if (elems.isEmpty) lit(false)
      else elems.map(equalsPredicate(field, _, v, arrayContainment = false)).reduce(_ || _)
    } else if (keys.forall(rangeOps.contains)) {
      if (keys.contains("$gt") && keys.contains("$gte"))
        throw new FilterParseException(s"cannot mix $$gt and $$gte on '$field'")
      if (keys.contains("$lt") && keys.contains("$lte"))
        throw new FilterParseException(s"cannot mix $$lt and $$lte on '$field'")
      val num = numToken(field, v)
      val bounds = keys.map { k =>
        val bound = value.get(k)
        if (!bound.isNumber) throw new FilterParseException(s"$k expects a number")
        val b = lit(bound.asDouble())
        k match {
          case "$gt" => num > b
          case "$gte" => num >= b
          case "$lt" => num < b
          case "$lte" => num <= b
        }
      }
      bounds.reduce(_ && _)
    } else {
      val bad = keys.filterNot(k => rangeOps.contains(k) || k == "$in").head
      throw new FilterParseException(s"unsupported operator: $bad")
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

  private def equalsPredicate(field: String, value: JsonNode, v: Column,
      arrayContainment: Boolean = true): Column = {
    val raw = rawToken(field, v)
    val scalar: Column =
      if (value.isTextual) raw === lit(compact(value))
      else if (value.isNumber)
        when(raw.rlike("^-?[0-9]"), raw.cast(DoubleType)) === lit(value.asDouble())
      else if (value.isBoolean) raw === lit(value.asBoolean().toString)
      else if (value.isNull) raw === lit("null")
      else if (value.isArray || value.isObject) raw === lit(compact(canonicalize(value)))
      else throw new FilterParseException(s"unsupported literal for '$field'")
    // containment compares element RAW TOKENS (try_variant_get to
    // array<variant>, null for non-arrays), keeping the module's
    // type-exactness: "5" never matches stored [5], and a stray string
    // element can't poison numeric containment the way a typed from_json
    // parse (null whole-array on mixed types) would
    def elemTok(x: Column) = to_json(x)
    val elems = try_variant_get(v, jsonPath(field), "array<variant>")
    val contains: Option[Column] =
      if (!arrayContainment) None
      else if (value.isTextual)
        Some(coalesce(exists(elems, x => elemTok(x) === lit(compact(value))), lit(false)))
      else if (value.isNumber)
        Some(coalesce(exists(elems, x =>
          when(elemTok(x).rlike("^-?[0-9]"), elemTok(x).cast(DoubleType))
            === lit(value.asDouble())), lit(false)))
      else if (value.isBoolean)
        Some(coalesce(exists(elems, x =>
          elemTok(x) === lit(value.asBoolean().toString)), lit(false)))
      else None
    contains match {
      case Some(c) => scalar || c
      case None => scalar
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
