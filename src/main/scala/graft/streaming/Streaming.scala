package graft.streaming

import graft.store.VectorStore
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.11). The reference declares
  * but never wires an update stream (`src/api/rest.rs:727-738`,
  * `src/client/rust.rs:71-98`); its genuinely streaming-shaped semantics —
  * continuous ingestion, id-dedup, periodic recent->historical migration
  * (X15/X16, `hybrid/maintenance.rs:286-475`) — map to:
  *
  *  - `readStream` over an arrival directory
  *  - watermarked `dropDuplicatesWithinWatermark` on the vector id (the
  *    reference dedups by id at insert, `hybrid/core.rs:317-321`)
  *  - `foreachBatch` appending into the store's recent tier, with the
  *    migration job as a micro-batch side task (the MigrationScheduler
  *    analog — a Spark trigger instead of a tokio loop)
  *  - event-time windowed aggregation over event streams (watermark + late
  *    data handling), which the reference lacks entirely
  */
object Streaming {

  /** Source schema for vector arrival files: (id, embedding, metadata, ts). */
  val arrivalSchema: StructType = StructType(
    VectorStore.vectorSchema.filterNot(_.name == "vid"))

  /** Continuous ingest into a VectorStore. Each micro-batch: dedup within
    * the stream (watermarked), anti-join against already-stored vids, append
    * to the recent tier; every `migrateEvery` batches run tier migration. */
  def ingest(store: VectorStore, sourceDir: String, checkpointDir: String,
      watermark: String = "10 minutes", migrateEvery: Int = 0): StreamingQuery = {
    val spark = store.spark
    val src = spark.readStream.schema(arrivalSchema).parquet(sourceDir)
    val deduped = src
      .withColumn("vid", VectorStore.vidExpr(col("id")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("vid")
    deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.dimension match {
          case None =>
            val d = batch.select(size(col("embedding"))).head(1)
            if (d.nonEmpty) store.initIfNeeded(d.head.getInt(0))
          case Some(_) =>
        }
        if (store.dimension.nonEmpty) {
          val fresh = batch
            .select("id", "vid", "embedding", "metadata", "ts")
            .join(store.vectors.select("vid"), Seq("vid"), "left_anti")
          fresh.write.mode(SaveMode.Append).parquet(s"${store.path}/recent")
          if (migrateEvery > 0 && batchId > 0 && batchId % migrateEvery == 0)
            store.migrate()
        }
        ()
      }
      .start()
  }

  /** Event-time windowed aggregation over an event stream: tumbling window
    * counts+sums per event_type with late-data tolerance. Returns the
    * streaming DataFrame to be bound to any sink. */
  def windowedEventCounts(events: DataFrame, windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
}
