package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (SURVEY §2.3 — the
  * stateful-operator family the reference lacks): gap-based sessions
  * per user via `flatMapGroupsWithState`, the streaming twin of the
  * batch lag+cumsum query (q5_sessionize).
  *
  * State is Spark-managed (checkpointed, bounded by event-time
  * timeout) — the opposite of the reference's driver-resident mutexed
  * maps (`main.go:72-76`), and the pattern its TTL'd enrichment cache
  * would use if lazy-fill fidelity were required at scale.
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp) {
    def ts_ms: Long = ts.getTime
  }
  case class SessionState(start_ms: Long, last_ms: Long, n: Long)
  case class Session(user_id: Long, start_ms: Long, n_events: Long, dur_ms: Long)

  /** Closed sessions for a gap of `gapMs`. Input must carry an
    * event-time watermark on `ts` (see [[sessionsFromTimestamps]]); a
    * session closes when the watermark passes last-event + gap.
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start_ms, s.n, s.last_ms - s.start_ms))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_ms)
            var st = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              st match {
                case Some(s) if e.ts_ms - s.last_ms <= gapMs =>
                  st = Some(s.copy(last_ms = math.max(s.last_ms, e.ts_ms), n = s.n + 1))
                case Some(s) => // gap exceeded inside the batch: close + restart
                  closed += Session(userId, s.start_ms, s.n, s.last_ms - s.start_ms)
                  st = Some(SessionState(e.ts_ms, e.ts_ms, 1))
                case None =>
                  st = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              // close when the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Convenience: timestamped frame (`user_id`, `ts` timestamp) →
    * watermarked sessions. `as[Event]` keeps the event-time column
    * (a typed map would drop the watermark tag EventTimeTimeout needs).
    */
  def sessionsFromTimestamps(df: Dataset[_], watermark: String, gapMs: Long): Dataset[Session] = {
    val spark = df.sparkSession
    import spark.implicits._
    val evs = df.toDF()
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[Event]
    sessions(evs, gapMs)
  }
}
