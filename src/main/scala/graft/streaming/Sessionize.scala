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
  case class FragState(frags: List[SessionState])
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Streaming sessionization with EVENT-TIME timeout. State per user is a
    * LIST of gap-separated session fragments, not one running session —
    * the shape that makes LATE (out-of-order) events correct: a late event
    * inside an existing session's gap merges into it (extending
    * session_start backwards when it precedes it), one beyond the gap
    * forms its own fragment, and a late event BETWEEN two fragments can
    * bridge them into one session. A single-session state can do none of
    * these (it either mis-extends forward or invents a wrong
    * session_start), and premature emission on "newer event exceeds the
    * gap" is wrong under lateness for the same reason — a late bridging
    * event may still arrive. So emission is purely WATERMARK-driven: a
    * fragment closes only when the watermark passes its gap horizon
    * (last + gap), at which point no admissible event can extend it
    * forward (would need t <= last+gap < wm) or backward (t < start < wm)
    * — both later than the watermark allows.
    *
    * Event-time timers are the load-bearing choice: a processing-time
    * timeout under AvailableNow (or any backfill) makes the engine
    * self-schedule empty micro-batches back-to-back until wall-clock
    * timers fire — minutes of checkpoint churn per run at test scale,
    * unbounded on a 100 TB replay — whereas event-time timers advance with
    * the data and the bounded run terminates deterministically after one
    * final timer batch.
    *
    * @param watermarkDelaySeconds max expected event lateness; 0 = ordered
    */
  def sessions(events: Dataset[Ev], gapSeconds: Long,
      watermarkDelaySeconds: Long = 0): Dataset[Session] = {
    val gapMs = gapSeconds * 1000
    events
      .withWatermark("ts", s"$watermarkDelaySeconds seconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Ev], state: GroupState[FragState]) => {
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.map(_.frags).getOrElse(Nil)
          val fresh = evs.map(e =>
            SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)).toList
          // merge pass over the start-sorted fragments: gap-connected
          // neighbors coalesce (this is where a late bridging event glues
          // two fragments into one session)
          val merged = (prior ++ fresh).sortBy(s => (s.start, s.last))
            .foldLeft(List.empty[SessionState]) { (acc, f) =>
              acc match {
                case h :: t if f.start - h.last <= gapMs =>
                  SessionState(h.start, math.max(h.last, f.last),
                    h.n + f.n, h.total + f.total) :: t
                case _ => f :: acc
              }
            }.reverse
          val (closed, open) = merged.partition(s => wm > s.last + gapMs)
          if (open.isEmpty) state.remove()
          else {
            state.update(FragState(open))
            // timer at the EARLIEST open horizon; a timer must sit
            // strictly past the current watermark (late-heavy groups could
            // otherwise request an already-expired timestamp, which Spark
            // rejects)
            state.setTimeoutTimestamp(
              math.max(open.map(_.last + gapMs).min, wm + 1))
          }
          closed.map(s => Session(user, new Timestamp(s.start),
            new Timestamp(s.last), s.n, s.total)).iterator
        })(Encoders.product[FragState], Encoders.product[Session])
  }

  /** Batch ground truth: same sessions via window functions (new session
    * when the gap from the previous event exceeds gapSeconds). Gaps
    * compare in MILLISECONDS like the streaming path — unix_timestamp's
    * whole-second truncation would make the two disagree on sub-second
    * data (1.9 s read as 1 s would not exceed a 1 s gap here while the
    * stream splits the session). */
  def sessionsBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapSeconds * 1000, 1)
          .otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).cast("int").as("n_events"), sum("value").as("total_value"))
      .drop("sess_id")
  }
}
