package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus ingest for the text pipeline: JSONL (the de-facto
  * corpus interchange format) and CSV, read against the documents-table
  * schema with PERMISSIVE corrupt-record quarantine — a 100 TB crawl
  * always contains malformed lines, and one bad record must cost one
  * quarantined row, never a failed job. Both readers are plain Spark
  * sources, so partitioning, predicate pushdown (CSV), and parallel
  * listing come for free; the parquet path stays [[graft.core.Tables]].
  */
object DocumentSource {

  val Corrupt = "_corrupt"

  /** The documents-table schema plus the quarantine column. */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField(Corrupt, StringType)))

  /** JSONL reader: one document object per line. Malformed lines land
    * with every schema field null and the raw line in `_corrupt`. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocumentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)

  /** CSV reader (header row, standard quoting). Same quarantine rule. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocumentsSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .csv(path)

  /** Split an ingested frame into (clean, quarantined). Clean rows drop
    * the quarantine column and must carry the two load-bearing fields;
    * everything else — parse failures AND schema-valid rows missing
    * id/text — goes to quarantine for inspection. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val bad = df.filter(col(Corrupt).isNotNull ||
      col("doc_id").isNull || col("text").isNull)
    val clean = df.filter(col(Corrupt).isNull &&
      col("doc_id").isNotNull && col("text").isNotNull).drop(Corrupt)
    (clean, bad)
  }
}
