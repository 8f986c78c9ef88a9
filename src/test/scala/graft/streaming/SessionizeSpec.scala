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

  test("late events: gap-separated late event forms its own session; a bridge merges fragments") {
    import spark.implicits._
    val base = 1700000000000L
    def ev(u: Long, offS: Long, v: Double) = (u, new Timestamp(base + offS * 1000), v)
    // batch 1 (in order): user 7 @1000s; user 9 @800s and @860s (gap 30s
    // -> two fragments); batch 2 (late, within the 300s watermark delay):
    // user 7 @900s (gap-separated BEFORE the 1000s session -> its own
    // session, NOT a merge), user 9 @830s (bridges 800 and 860 into ONE
    // session), plus user 8 @2000s to advance the final watermark past
    // every user-7/9 horizon
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_late_").toString
    Seq(ev(7L, 1000, 1.0), ev(9L, 800, 1.0), ev(9L, 860, 1.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(s"$dir/f0")
    Seq(ev(7L, 900, 5.0), ev(9L, 830, 1.0), ev(8L, 2000, 9.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(s"$dir/f1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    // one file per micro-batch so the f1 events really arrive LATE (after
    // the watermark advanced off f0), not interleaved in one batch
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/f*").as[Sessionize.Ev]
    val q = Sessionize.sessions(stream, gapSeconds = 30, watermarkDelaySeconds = 300)
      .writeStream.outputMode("append").format("memory").queryName("sess_late")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "late-event sessionize did not terminate")
    val emitted = spark.table("sess_late").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime - base,
        r.getTimestamp(2).getTime - base, r.getInt(3), r.getDouble(4))).sorted.toSeq
    // user 7: TWO sessions — the late 900s event must not fold into the
    // 1000s session (the single-running-session bug) nor steal its start;
    // user 9: ONE bridged session spanning 800..860 with all 3 events;
    // user 8 stays open (horizon past the final watermark)
    assert(emitted == Seq(
      (7L, 900000L, 900000L, 1, 5.0),
      (7L, 1000000L, 1000000L, 1, 1.0),
      (9L, 800000L, 860000L, 3, 3.0)), emitted)
  }

  test("sessionsBatch compares gaps in milliseconds, like the stream") {
    import spark.implicits._
    // 1.9s apart with a 1s gap: whole-second truncation would read 1s and
    // keep one session; the stream (ms math) splits — batch must agree
    val evs = Seq(
      (1L, new Timestamp(10000), 1.0), (1L, new Timestamp(11900), 2.0))
      .toDF("user_id", "ts", "value")
    val sess = Sessionize.sessionsBatch(evs, gapSeconds = 1).collect()
    assert(sess.length == 2, sess.mkString("; "))
  }
}
