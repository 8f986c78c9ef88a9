package graft.core

import graft.SparkSpec
import graft.core.NftTypes._
import org.apache.spark.sql.functions._

/** Typed VideoNFT/S5 metadata conformance: serde alias + skip-None
  * parity of the JSON bridge, bulk column parsing, and store schema
  * validation (`/root/reference/src/types/mod.rs:26-90`). */
class NftTypesSpec extends SparkSpec {

  private val canonical =
    """{"address": "0xabc", "attributes": [{"key": "rarity", "value": 3},
      |{"key": "tier", "value": "gold"}], "genre": ["scifi", "drama"],
      |"id": "nft1", "image": "s5://img", "mint_date_time": "2026-01-02T03:04:05Z",
      |"name": "Clip", "type": "video", "supply": 100,
      |"user_pub": "pubkey"}""".stripMargin.replaceAll("\n", " ")

  test("parse honors snake_case and camelCase aliases; round-trip is canonical") {
    val m = parseVideoNft(canonical)
    assert(m.address == "0xabc" && m.nftType == "video" && m.supply.contains(100))
    assert(m.userPub.contains("pubkey"))
    assert(m.mintDateTime.toInstant.toString == "2026-01-02T03:04:05Z")
    // raw-token attribute values: number vs string stays distinguishable
    assert(m.attributes == Seq(NftAttribute("rarity", "3"), NftAttribute("tier", "\"gold\"")))
    // camelCase aliases parse to the same struct
    val camel = canonical
      .replace("\"mint_date_time\"", "\"mintDateTime\"")
      .replace("\"user_pub\"", "\"userPub\"")
    assert(parseVideoNft(camel) == m)
    // serialization is canonical snake_case and skips absent options
    val json = toJson(m)
    assert(json.contains("\"mint_date_time\"") && !json.contains("mintDateTime"))
    assert(!json.contains("description") && !json.contains("symbol"))
    assert(parseVideoNft(json) == m)
    // missing required field fails
    intercept[IllegalArgumentException] {
      parseVideoNft("""{"id": "x", "name": "n"}""")
    }
    // numeric UTC offsets parse (chrono parity) and normalize to UTC
    val offset = parseVideoNft(
      canonical.replace("2026-01-02T03:04:05Z", "2026-01-02T05:04:05+02:00"))
    assert(offset.mintDateTime == m.mintDateTime)
    // malformed attribute (no key) raises the IAE contract, not an NPE
    intercept[IllegalArgumentException] {
      parseVideoNft(canonical.replace("""{"key": "rarity", "value": 3}""",
        """{"value": 3}"""))
    }
  }

  test("bulk column parser resolves aliases in Catalyst, no UDF") {
    import spark.implicits._
    val camel = canonical
      .replace("\"mint_date_time\"", "\"mintDateTime\"")
      .replace("\"user_pub\"", "\"userPub\"")
    val df = Seq(("a", canonical), ("b", camel)).toDF("id", "metadata")
      .withColumn("nft", videoNftColumn(col("metadata")))
    val rows = df.select(col("id"), col("nft.mint_date_time").cast("string"),
      col("nft.user_pub"), col("nft.type"), col("nft.supply")).collect()
    rows.foreach { r =>
      assert(r.getString(1).startsWith("2026-01-02"))
      assert(r.getString(2) == "pubkey" && r.getString(3) == "video" && r.getInt(4) == 100)
    }
    // variant attribute values keep their JSON types
    val v = df.select(explode(col("nft.attributes")).as("a"))
      .select(col("a.key"), to_json(col("a.value")).as("raw")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v("rarity") == "3" && v("tier") == "\"gold\"")
  }

  test("store validates VideoNFT metadata via the declared schema") {
    val st = new graft.store.VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_nft_").toString)
    st.setSchema(videoNftMetadataSchema)
    val vec = Array.tabulate(8)(j => math.sin(j + 1).toFloat)
    val ok = st.insert(Seq(graft.store.VectorStore.VectorRecord(
      "nft1", vec, Some(canonical))))
    assert(ok.inserted == 1)
    intercept[graft.store.MetadataSchema.SchemaViolation] {
      st.insert(Seq(graft.store.VectorStore.VectorRecord(
        "nft2", vec, Some("""{"address": "0xdef", "id": "nft2"}"""))))
    }
  }
}
