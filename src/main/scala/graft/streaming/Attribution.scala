package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful twin of
  * q110_attribution's batch window: each purchase credits the user's
  * most recent click within a lookback, but here the "most recent
  * click" lives in Spark-managed per-user state instead of a window
  * frame, so purchases are attributed AS THEY ARRIVE, micro-batch by
  * micro-batch, with no re-read of click history.
  *
  * State per user is exactly one (ts, channel) pair — constant, not
  * proportional to activity — and is expired by event-time timeout
  * once the watermark passes last-click + lookback (an expired click
  * could never attribute again). That bound is what makes the state
  * store survive an unbounded user population: inactive users leave
  * the store instead of accumulating.
  *
  * Ordering contract: within a micro-batch the group iterator is
  * sorted by (ts, event_id) before folding, and the fold applies
  * clicks/purchases in that order — so a batch boundary placed
  * ANYWHERE in the event stream yields the same attributions as the
  * batch window (proved by `StreamingAttributionSpec`'s parity test).
  * Late events that arrive after the watermark passed them are
  * dropped by the upstream watermark, which is the standard streaming
  * trade the batch query does not face.
  */
object Attribution {

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                is_click: Boolean, channel: String) {
    def ts_ms: Long = ts.getTime
  }
  case class LastClick(ts_ms: Long, channel: String)
  case class Attributed(user_id: Long, event_id: Long, ts_ms: Long, channel: String)

  def attribute(events: Dataset[Ev], lookbackMs: Long): Dataset[Attributed] = {
    implicit val outEnc = Encoders.product[Attributed]
    implicit val stEnc = Encoders.product[LastClick]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastClick, Attributed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[LastClick]) =>
          if (state.hasTimedOut) {
            // the stored click is older than watermark − lookback: no
            // future purchase (all ≥ watermark) can credit it
            state.remove()
            Iterator.empty
          } else {
            // same deterministic interleaving as the batch window's
            // ORDER BY (ts, event_id)
            val sorted = batch.toSeq.sortBy(e => (e.ts_ms, e.event_id))
            var st = state.getOption
            val out = Seq.newBuilder[Attributed]
            sorted.foreach { e =>
              if (e.is_click) st = Some(LastClick(e.ts_ms, e.channel))
              else {
                val ch = st match {
                  case Some(c) if e.ts_ms - c.ts_ms <= lookbackMs => c.channel
                  case _ => "unattributed"
                }
                out += Attributed(userId, e.event_id, e.ts_ms, ch)
              }
            }
            st match {
              case Some(c) =>
                state.update(c)
                state.setTimeoutTimestamp(c.ts_ms + lookbackMs)
              case None => // only purchases seen, nothing to retain
            }
            out.result().iterator
          }
      }
  }
}
