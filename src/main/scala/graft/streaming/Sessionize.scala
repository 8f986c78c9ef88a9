package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — the custom-state
  * Structured Streaming operator (`flatMapGroupsWithState`) the reference
  * has no analog for but a training-data/event pipeline needs: group events
  * per user into sessions closed after `gapSeconds` of inactivity.
  *
  * Works identically over a bounded stream (AvailableNow) and a live one;
  * the batch variant (window lag/sum over ts) is provided for ground-truth
  * comparison.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Streaming sessionization with EVENT-TIME timeout: a session closes
    * when a newer event exceeds the gap, or when the watermark passes the
    * session's gap horizon (last event + gap). Event-time timers are the
    * load-bearing choice: a processing-time timeout under AvailableNow (or
    * any backfill) makes the engine self-schedule empty micro-batches
    * back-to-back until wall-clock timers fire — minutes of checkpoint
    * churn per run at test scale, unbounded on a 100 TB replay — whereas
    * event-time timers advance with the data and the bounded run
    * terminates deterministically after one final timer batch.
    *
    * @param watermarkDelaySeconds max expected event lateness; 0 = ordered
    */
  def sessions(events: Dataset[Ev], gapSeconds: Long,
      watermarkDelaySeconds: Long = 0): Dataset[Session] = {
    events
      .withWatermark("ts", s"$watermarkDelaySeconds seconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          if (state.hasTimedOut) {
            // watermark passed last+gap: no in-gap event can arrive anymore
            state.getOption.foreach { s =>
              out += Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
            }
            state.remove()
          } else {
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapSeconds * 1000 =>
                  out += Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timer at the gap horizon; a timer must sit strictly past
              // the current watermark (late-heavy groups could otherwise
              // request an already-expired timestamp, which Spark rejects)
              state.setTimeoutTimestamp(
                math.max(s.last + gapSeconds * 1000, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
        })(Encoders.product[SessionState], Encoders.product[Session])
  }

  /** Batch ground truth: same sessions via window functions (new session
    * when the gap from the previous event exceeds gapSeconds). */
  def sessionsBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).cast("int").as("n_events"), sum("value").as("total_value"))
      .drop("sess_id")
  }
}
