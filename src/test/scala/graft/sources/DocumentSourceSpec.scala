package graft.sources

import graft.SparkSpec

/** Unit coverage for corpus ingest: JSONL/CSV roundtrips, and the
  * quarantine contract — malformed lines and schema-valid-but-incomplete
  * rows cost one quarantined row each, never a failed job. */
class DocumentSourceSpec extends SparkSpec {
  import spark.implicits._

  private def stage(lines: Seq[String], name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_spec_")
    java.nio.file.Files.write(dir.resolve(name),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("jsonl: valid rows load typed; junk and id-less rows quarantine") {
    val path = stage(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11}""",
      """{"doc_id": 2, "text": "zwei", "lang": "de", "source": "s1", "n_chars": 4}""",
      """this is not json at all""",
      """{"text": "no id on this row"}"""), "part.jsonl")
    val (clean, bad) = DocumentSource.quarantine(DocumentSource.jsonl(spark, path))
    assert(clean.count() == 2 && bad.count() == 2)
    assert(!clean.columns.contains(DocumentSource.Corrupt))
    val r = clean.orderBy("doc_id").as[(Long, String, String, String, Long)].collect()
    assert(r(0) == ((1L, "hello world", "en", "s1", 11L)))
    // the raw junk line is preserved for inspection
    assert(bad.filter(org.apache.spark.sql.functions.col(DocumentSource.Corrupt)
      .contains("not json")).count() == 1)
  }

  test("csv: header + quoting roundtrip; malformed row quarantines") {
    val path = stage(Seq(
      "doc_id,text,lang,source,n_chars",
      """5,"comma, inside",en,s2,13""",
      "not_a_long,oops,xx,s2,0"), "part.csv")
    val (clean, bad) = DocumentSource.quarantine(DocumentSource.csv(spark, path))
    assert(clean.count() == 1 && bad.count() == 1)
    assert(clean.head().getString(1) == "comma, inside")
  }

  test("jsonl write-read roundtrip is lossless for the documents shape") {
    val docs = Seq((1L, "a\tb\nc", "en", "s", 5L), (2L, "plain", "de", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_src_rt_").toString
    docs.write.mode("overwrite").json(s"$dir/d")
    val (clean, bad) = DocumentSource.quarantine(DocumentSource.jsonl(spark, s"$dir/d"))
    assert(bad.count() == 0)
    assert(clean.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }
}
