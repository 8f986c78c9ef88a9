package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The reference's typed metadata structs
  * (`/root/reference/src/types/mod.rs:26-90`) re-expressed Spark-first:
  * case classes (Dataset[VideoNftMetadata] via the implicit product
  * encoder), a JSON bridge honoring the reference's serde aliases
  * (`mint_date_time`/`mintDateTime`, `poster_image`/`posterImage`,
  * `user_pub`/`userPub`) and its skip-None serialization, a StructType +
  * column parser for bulk DataFrame use, and a [[graft.store
  * .MetadataSchema]] declaration so a store can validate NFT metadata at
  * insert. CBOR round-trip is not mirrored: parquet+zstd is this engine's
  * wire format (SURVEY S7).
  *
  * Attribute values are `serde_json::Value` in the reference — arbitrary
  * JSON. Here they are carried as raw JSON token strings (`"18"` vs
  * `18` stays distinguishable), the same trick FilterJson uses.
  */
object NftTypes {

  case class NftAttribute(key: String, value: String) // value = raw JSON token

  case class VideoNftMetadata(
      address: String,
      attributes: Seq[NftAttribute] = Nil,
      description: Option[String] = None,
      genre: Seq[String] = Nil,
      id: String,
      image: String,
      mintDateTime: java.sql.Timestamp,
      name: String,
      posterImage: Option[String] = None,
      summary: Option[String] = None,
      supply: Option[Int] = None,
      symbol: Option[String] = None,
      nftType: String, // `type` in JSON (rust r#type)
      uri: Option[String] = None,
      userPub: Option[String] = None,
      video: Option[String] = None,
      animationUrl: Option[String] = None)

  case class S5Metadata(cid: String, size: Long, mimeType: String,
      createdAt: Long, encryption: Option[String] = None)

  private val mapper = new ObjectMapper()

  private def optText(n: ObjectNode, names: String*): Option[String] =
    names.iterator.map(n.get).find(v => v != null && !v.isNull).map(_.asText())

  /** Parse one VideoNFT JSON document, accepting both snake_case and
    * camelCase for the aliased fields (serde `alias` parity). */
  def parseVideoNft(json: String): VideoNftMetadata = {
    val n = mapper.readTree(json) match {
      case o: ObjectNode => o
      case _ => throw new IllegalArgumentException("NFT metadata must be a JSON object")
    }
    def req(name: String): String = optText(n, name).getOrElse(
      throw new IllegalArgumentException(s"missing required field: $name"))
    val attrs = Option(n.get("attributes")).map(_.elements().asScala.map { a =>
      val key = Option(a.get("key")).filterNot(_.isNull).map(_.asText())
        .getOrElse(throw new IllegalArgumentException("attribute missing key"))
      // a MISSING value field is a malformed attribute, not a null value:
      // serde has no default for it, so the reference rejects the document
      // — writeValueAsString(javaNull) would instead fabricate "null" and
      // make missing indistinguishable from an explicit JSON null
      val value = Option(a.get("value")).getOrElse(
        throw new IllegalArgumentException(s"attribute '$key' missing value"))
      NftAttribute(key, mapper.writeValueAsString(value))
    }.toSeq).getOrElse(Nil)
    val genre = Option(n.get("genre"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    val mint = optText(n, "mint_date_time", "mintDateTime").getOrElse(
      throw new IllegalArgumentException("missing required field: mint_date_time"))
    VideoNftMetadata(
      address = req("address"),
      attributes = attrs,
      description = optText(n, "description"),
      genre = genre,
      id = req("id"),
      image = req("image"),
      // OffsetDateTime, not Instant: the reference's chrono deserializer
      // accepts numeric UTC offsets ("+02:00") and normalizes to UTC
      mintDateTime = java.sql.Timestamp.from(
        java.time.OffsetDateTime.parse(mint).toInstant),
      name = req("name"),
      posterImage = optText(n, "poster_image", "posterImage"),
      summary = optText(n, "summary"),
      supply = Option(n.get("supply")).filterNot(_.isNull).map(_.asInt()),
      symbol = optText(n, "symbol"),
      nftType = req("type"),
      uri = optText(n, "uri"),
      userPub = optText(n, "user_pub", "userPub"),
      video = optText(n, "video"),
      animationUrl = optText(n, "animation_url"))
  }

  /** Canonical snake_case serialization, None fields skipped (serde
    * `skip_serializing_if` parity). */
  def toJson(m: VideoNftMetadata): String = {
    val n = mapper.createObjectNode()
    n.put("address", m.address)
    val arr = n.putArray("attributes")
    m.attributes.foreach { a =>
      val o = arr.addObject()
      o.put("key", a.key)
      o.set[ObjectNode]("value", mapper.readTree(a.value))
    }
    m.description.foreach(n.put("description", _))
    val g = n.putArray("genre"); m.genre.foreach(g.add)
    n.put("id", m.id)
    n.put("image", m.image)
    n.put("mint_date_time", m.mintDateTime.toInstant.toString)
    n.put("name", m.name)
    m.posterImage.foreach(n.put("poster_image", _))
    m.summary.foreach(n.put("summary", _))
    m.supply.foreach(n.put("supply", _))
    m.symbol.foreach(n.put("symbol", _))
    n.put("type", m.nftType)
    m.uri.foreach(n.put("uri", _))
    m.userPub.foreach(n.put("user_pub", _))
    m.video.foreach(n.put("video", _))
    m.animationUrl.foreach(n.put("animation_url", _))
    mapper.writeValueAsString(n)
  }

  /** StructType of the canonical (snake_case) JSON shape, for
    * `from_json` over a metadata column. Attribute values surface as
    * VARIANT so numbers/strings/objects all survive. */
  val videoNftStructType: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("attributes", ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", VariantType))))),
    StructField("description", StringType),
    StructField("genre", ArrayType(StringType)),
    StructField("id", StringType),
    StructField("image", StringType),
    StructField("mint_date_time", StringType),
    StructField("mintDateTime", StringType),
    StructField("name", StringType),
    StructField("poster_image", StringType),
    StructField("posterImage", StringType),
    StructField("summary", StringType),
    StructField("supply", IntegerType),
    StructField("symbol", StringType),
    StructField("type", StringType),
    StructField("uri", StringType),
    StructField("user_pub", StringType),
    StructField("userPub", StringType),
    StructField("video", StringType),
    StructField("animation_url", StringType)))

  /** Bulk column parser: metadata JSON string -> typed nested struct with
    * the aliases resolved (coalesce of snake_case and camelCase) and the
    * mint timestamp cast — the whole pipeline stays in Catalyst, no UDF. */
  def videoNftColumn(metadataCol: Column): Column = {
    val p = from_json(metadataCol, videoNftStructType)
    struct(
      p("address").as("address"),
      p("attributes").as("attributes"),
      p("description").as("description"),
      p("genre").as("genre"),
      p("id").as("id"),
      p("image").as("image"),
      to_timestamp(coalesce(p("mint_date_time"), p("mintDateTime")))
        .as("mint_date_time"),
      p("name").as("name"),
      coalesce(p("poster_image"), p("posterImage")).as("poster_image"),
      p("summary").as("summary"),
      p("supply").as("supply"),
      p("symbol").as("symbol"),
      p("type").as("type"),
      p("uri").as("uri"),
      coalesce(p("user_pub"), p("userPub")).as("user_pub"),
      p("video").as("video"),
      p("animation_url").as("animation_url"))
  }

  /** [[graft.store.MetadataSchema]] declaration for a store holding
    * VideoNFT metadata — required fields per the reference's non-Option
    * struct members. */
  val videoNftMetadataSchema: String =
    """{"fields": {
      |  "address": {"type": "string"},
      |  "attributes": {"type": "array"},
      |  "genre": {"type": "array"},
      |  "id": {"type": "string"},
      |  "image": {"type": "string"},
      |  "mint_date_time": {"type": "string"},
      |  "name": {"type": "string"},
      |  "supply": {"type": "number"},
      |  "type": {"type": "string"}
      |}, "required": ["address", "id", "image", "mint_date_time", "name", "type"]}""".stripMargin
}
