package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization + stateful streaming counters over the events table.
  *
  * Batch path: gap-based sessions as pure window functions (lag → gap
  * flag → running sum = session id) — fully codegen'd, one shuffle on
  * user_id, DuckDB-oracle-verified (q26).
  *
  * Streaming path: per-user running state via
  * `KeyValueGroupedDataset.mapGroupsWithState` — the engine's custom-
  * state operator (SURVEY §2.9 note); batch/stream parity is tested.
  */
object Sessionize {

  /** Gap-based sessions: a new session starts when the previous event of
    * the same user is more than gapSeconds older. Output one row per
    * session with counts and bounds (epoch seconds).
    */
  def sessions(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("epoch", col("ts").cast("timestamp").cast("long"))
      .withColumn("prev", lag("epoch", 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("epoch") - col("prev") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("epoch").as("session_start"),
        max("epoch").as("session_end"))
  }

  case class UserEvent(user_id: Long, event_id: Long, value: Double)
  case class UserCount(user_id: Long, n_events: Long, total_value: Double)

  /** Streaming running per-user counters with explicit state — survives
    * across micro-batches; Update-mode output emits the current state
    * each batch.
    */
  def runningUserCounts(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserCount] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserCount, UserCount](GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[UserCount]) =>
          val prev = state.getOption.getOrElse(UserCount(user, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserCount(user, n, tot)
          state.update(next)
          next
      }
  }

  case class TimedEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Long)

  /** Shared per-user session callback: closure-by-successor within and
    * across micro-batches; with `timeoutFlush` the same callback also
    * handles the watermark-driven timeout branch — a timed-out user's
    * open session is emitted and the state removed.
    */
  private def sessionCallback(gapSeconds: Long, timeoutFlush: Boolean)
      : (Long, Iterator[TimedEvent], GroupState[OpenSession]) => Iterator[ClosedSession] =
    (user, it, state) =>
      if (timeoutFlush && state.hasTimedOut) {
        // watermark passed last+gap: no admissible event can extend this
        // session any more — flush it and free the user's state
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(user, s.start, s.last, s.n))
      } else {
        // within one micro-batch the iterator is unordered
        val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        var cur = state.getOption
        evs.foreach { e =>
          val t = e.ts.getTime / 1000
          cur match {
            case Some(s) if t - s.last > gapSeconds =>
              closed += ClosedSession(user, s.start, s.last, s.n)
              cur = Some(OpenSession(t, t, 1))
            case Some(s) =>
              // a LATE cross-batch event (t <= s.last, admissible under
              // the watermark) joins the open session but must never move
              // its bounds backward: the next gap decision keeps measuring
              // from the true max event time, and an event older than the
              // recorded start widens the session start (bounded state
              // cannot retroactively split an earlier session off)
              cur = Some(OpenSession(math.min(s.start, t),
                math.max(s.last, t), s.n + 1))
            case None =>
              cur = Some(OpenSession(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (timeoutFlush)
            // a timeout timestamp must sit above the current watermark
            state.setTimeoutTimestamp(math.max(
              s.last * 1000L + gapSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1L))
        }
        closed.iterator
      }

  /** Streaming gap sessionization via `flatMapGroupsWithState` — the
    * custom-state operator that the batch window chain (q26) cannot
    * express incrementally. A session CLOSES when a later event of the
    * same user arrives more than `gapSeconds` after it (closure by
    * successor); the per-user state is exactly one open session, bounded
    * regardless of stream length. The still-open tail session stays in
    * state — use [[gapSessionsEventTime]] in production so idle users'
    * sessions flush on watermark advance instead of lingering forever.
    */
  def gapSessions(spark: SparkSession, events: Dataset[TimedEvent],
                  gapSeconds: Long = 1800): Dataset[ClosedSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionCallback(gapSeconds, timeoutFlush = false))
  }

  /** Production variant of [[gapSessions]]: watermarked input +
    * `EventTimeTimeout`, so the tail session of a user who simply goes
    * quiet is FLUSHED once the watermark passes last+gap — per-user state
    * is freed instead of accumulating one open session per ever-seen
    * user. Same callback, one more branch; closed-by-successor output is
    * identical to [[gapSessions]] (events later than the watermark bound
    * are the usual streaming late-data trade).
    */
  def gapSessionsEventTime(spark: SparkSession, events: Dataset[TimedEvent],
                           gapSeconds: Long = 1800,
                           watermarkDelay: String = "10 seconds"): Dataset[ClosedSession] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionCallback(gapSeconds, timeoutFlush = true))
  }
}
