package graft.store

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Optional metadata schema validation (SURVEY.md §2.2 F11,
  * `/root/reference/src/core/schema.rs:36-207`): field type declarations
  * (string/number/boolean/array/object, recursive), a `required` set, and
  * null-is-always-valid semantics (`schema.rs:68-71`).
  *
  * Validation runs driver-side per batch on the parsed JSON (insert batches
  * are bounded); the stored schema serializes to the same JSON shape the
  * reference uses, as the `schema.json` sidecar.
  */
object MetadataSchema {
  private val mapper = new ObjectMapper()

  final class SchemaViolation(msg: String) extends IllegalArgumentException(msg)

  case class Schema(raw: JsonNode) {
    private val fields: Map[String, JsonNode] =
      Option(raw.get("fields")).map(_.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
        .getOrElse(Map.empty)
    private val required: Set[String] =
      Option(raw.get("required")).map(_.elements().asScala.map(_.asText()).toSet)
        .getOrElse(Set.empty)

    def json: String = mapper.writeValueAsString(raw)

    /** Validate one metadata JSON document; returns the first violation.
      *
      * Absent/null metadata is a violation whenever a schema is set —
      * reference-exact: `validate` requires an object unconditionally
      * (`schema.rs:181-188` — a napi null metadata arrives as
      * `Value::Null` and fails `is_object()` even with zero required
      * fields), so a reference user with a schema can never insert
      * metadata-less rows, and neither can ours. */
    def validate(metadataJson: Option[String]): Option[String] = {
      val doc = metadataJson match {
        case None | Some(null) =>
          return Some("metadata must be a JSON object (schema is set, got null)")
        case Some(s) =>
          try mapper.readTree(s)
          catch { case e: Exception => return Some(s"invalid JSON: ${e.getMessage}") }
      }
      if (!doc.isObject) return Some("metadata must be a JSON object")
      // required = the key must be PRESENT; an explicit null value is fine
      // (null-is-always-valid, schema.rs:68-71). Checking absence alone also
      // keeps a null-valued early field from shadowing a genuinely missing
      // later one.
      required.find(f => !doc.has(f)) match {
        case Some(f) => return Some(s"missing required field: $f")
        case None =>
      }
      fields.iterator.flatMap { case (name, spec) =>
        Option(doc.get(name)).filterNot(_.isNull).flatMap(v => check(name, v, spec))
      }.take(1).toList.headOption
    }

    private def check(path: String, v: JsonNode, spec: JsonNode): Option[String] = {
      val t = Option(spec.get("type")).map(_.asText()).getOrElse("any")
      t match {
        case "string" => if (v.isTextual) None else Some(s"$path: expected string")
        case "number" => if (v.isNumber) None else Some(s"$path: expected number")
        case "boolean" => if (v.isBoolean) None else Some(s"$path: expected boolean")
        case "array" =>
          if (!v.isArray) Some(s"$path: expected array")
          else Option(spec.get("items")) match {
            case Some(items) =>
              v.elements().asScala.zipWithIndex
                .flatMap { case (e, i) => if (e.isNull) None else check(s"$path[$i]", e, items) }
                .take(1).toList.headOption
            case None => None
          }
        case "object" =>
          if (!v.isObject) Some(s"$path: expected object")
          else Option(spec.get("fields")) match {
            case Some(fs) =>
              fs.properties().asScala.iterator.flatMap { e =>
                Option(v.get(e.getKey)).filterNot(_.isNull)
                  .flatMap(child => check(s"$path.${e.getKey}", child, e.getValue))
              }.take(1).toList.headOption
            case None => None
          }
        case "any" => None
        case other => Some(s"$path: unknown type '$other'")
      }
    }
  }

  def parse(schemaJson: String): Schema = {
    val node = mapper.readTree(schemaJson)
    if (node == null || !node.isObject)
      throw new SchemaViolation("schema must be a JSON object")
    Schema(node)
  }
}
