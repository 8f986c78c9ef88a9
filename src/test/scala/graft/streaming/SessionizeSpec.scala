package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {

  test("streaming sessionization matches batch ground truth for closed sessions") {
    import spark.implicits._
    val base = 1700000000000L
    // user 1: two sessions (gap 700s); user 2: one session
    val evs = Seq(
      (1L, 0L, 1.0), (1L, 100L, 2.0), (1L, 200L, 3.0),
      (1L, 900L, 4.0), (1L, 950L, 5.0),
      (2L, 0L, 7.0), (2L, 50L, 8.0))
      .map { case (u, off, v) => (u, new Timestamp(base + off * 1000), v) }
    val src = java.nio.file.Files.createTempDirectory("graft_sess_").toString
    evs.toDF("user_id", "ts", "value").coalesce(1).write.mode("overwrite").parquet(src)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(src).as[Sessionize.Ev]
    val q = Sessionize.sessions(stream, gapSeconds = 600)
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .trigger(Trigger.AvailableNow()).start()
    // event-time timers: AvailableNow drains the file, runs one final
    // timer batch at the advanced watermark, and terminates — a hang or
    // churn regression fails here instead of leaking a live query
    assert(q.awaitTermination(120000), "sessionize query did not terminate")
    val emitted = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getDouble(4))).sorted
    // closed in the bounded run: user 1's first session (gap exceeded by
    // the 900s event) AND user 2's only session (watermark = max event ts
    // 950s passed its 50+600s gap horizon). User 1's second session stays
    // open: its horizon 950+600 is past the final watermark.
    assert(emitted.toSeq == Seq((1L, 3, 6.0), (2L, 2, 15.0)), emitted.toSeq)

    // batch ground truth finds all three sessions
    val batch = Sessionize.sessionsBatch(evs.toDF("user_id", "ts", "value"), 600)
      .orderBy("user_id", "session_start").collect()
    assert(batch.length == 3)
    assert(batch.map(r => (r.getLong(0), r.getInt(3))).toSeq ==
      Seq((1L, 3), (1L, 2), (2L, 2)))
    // every streaming-closed session agrees with a batch session
    val batchSet = batch.map(r => (r.getLong(0), r.getInt(3), r.getDouble(4))).toSet
    assert(emitted.forall(batchSet.contains), s"streaming emitted $emitted not in $batchSet")
  }
}
