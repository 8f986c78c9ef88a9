package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The promoted ring state-file scaffold — the parse/write/read/
  * applyBatch/ingest skeleton every windowed face shares, extracted at
  * [[WindowedRing]]'s own documented threshold (the THIRD instantiation,
  * [[StreamingWindowedDistinct]], promotes the scaffold; two faces'
  * worth of duplication was the line). Each face supplies its snapshot
  * type and codec — where the types genuinely differ — and keeps its
  * own binding-refusal messages; the store owns everything that must
  * NOT drift between faces:
  *
  *  - the [[graft.core.SwapStateFile]] wiring (tmp+marker swap, loud
  *    reads, the linearizable locked read);
  *  - the required-binding-fields refusal on parse (a state file
  *    missing its identity fields is never guessed at);
  *  - the applyBatch skeleton: fresh-state-vs-checkpoint probe, replay
  *    idempotence off the last applied batch id, fold-then-write;
  *  - the ingest chokepoint: window validation, the atomic-rename
  *    capability probe at open, checkpoint qualification, the
  *    entry-time binding check BEFORE any checkpoint WAL, and the
  *    AvailableNow foreachBatch loop.
  *
  * `stateName` must be registered in [[WindowedRing.StateFileNames]] so
  * [[StateMerge]] can name a ring dir fed to an all-time merge. */
private[streaming] final class RingStateStore[S](
    face: String, stateName: String, swapMarker: String,
    requiredFields: Seq[String], empty: S, lastBatchIdOf: S => Long,
    encode: (ObjectNode, S) => Unit, decode: JsonNode => S) {

  require(WindowedRing.StateFileNames.contains(stateName),
    s"ring state file '$stateName' must be registered in " +
      "WindowedRing.StateFileNames (the StateMerge ring probe reads " +
      "that list)")

  private def file(spark: SparkSession, stateDir: String) =
    new graft.core.SwapStateFile(
      new Path(stateDir, stateName)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      stateDir, stateName, swapMarker, face)

  private def parse(stateDir: String)(txt: String): S = {
    val node = new ObjectMapper().readTree(txt)
    if (requiredFields.exists(f => node.get(f) == null))
      throw new IllegalStateException(
        s"$face file under $stateDir lacks the " +
          requiredFields.mkString("/") + " binding fields — refusing " +
          "to guess which stream it belongs to; re-fold from the " +
          "source with a fresh state dir")
    decode(node)
  }

  /** Lock-free read ([[graft.core.SwapStateFile.read]] protocol);
    * absent file = empty stream. */
  def read(spark: SparkSession, stateDir: String): S =
    file(spark, stateDir).read(parse(stateDir), empty)

  /** Linearizable read under the writer's own swap lock. */
  def readLocked(spark: SparkSession, stateDir: String): S =
    file(spark, stateDir).readLocked(parse(stateDir), empty)

  def write(spark: SparkSession, stateDir: String, snap: S): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    encode(root, snap)
    file(spark, stateDir).write(mapper.writeValueAsBytes(root))
  }

  /** The applyBatch skeleton: read, face binding check, fresh-state
    * probe, replay idempotence, fold-then-write. `fold` computes the
    * NEXT snapshot (the face appends its per-batch summary and slides
    * via [[WindowedRing.slide]]). */
  def applyBatch(spark: SparkSession, stateDir: String, batchId: Long,
      checkBindings: S => Unit, fold: S => S): S = {
    val st = read(spark, stateDir)
    checkBindings(st)
    StreamingHeavyHitters.checkFreshStateVsCheckpoint(lastBatchIdOf(st),
      stateDir, batchId, face)
    if (batchId <= lastBatchIdOf(st)) st // replayed batch: already folded
    else {
      val next = fold(st)
      write(spark, stateDir, next)
      next
    }
  }

  /** The ingest chokepoint skeleton. `entryCheck` runs the face's
    * binding refusals against (current state, qualified checkpoint id)
    * BEFORE any checkpoint WAL is written; `applyB` is the face's
    * per-batch fold, handed the same qualified checkpoint id. */
  def ingest(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String, window: Int, srcSchema: StructType,
      maxFilesPerTrigger: Int, entryCheck: (S, String) => Unit,
      applyB: (DataFrame, Long, String) => Unit): StreamingQuery = {
    WindowedRing.requireWindow(window)
    val stateFs = new Path(stateDir, stateName)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.FsCapabilities.assertAtomicRenameAtOpen(stateFs,
      new Path(stateDir), s"streaming $face commit")
    val ckptPath = new Path(checkpointDir)
    val ckptId = ckptPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(ckptPath).toString
    entryCheck(read(spark, stateDir), ckptId)
    val reader = spark.readStream.schema(srcSchema)
    val src =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(sourceDir)
      else reader.parquet(sourceDir)
    src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchShuffleTuning.tune(batch)
        applyB(batch, batchId, ckptId); ()
      }
      .start()
  }
}
