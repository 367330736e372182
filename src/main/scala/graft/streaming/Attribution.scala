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
  * sorted by (ts, event_id) before folding; across batches, clicks
  * update state only if they are NEWER by (ts, event_id) — a lenient
  * watermark can admit a late batch whose clicks precede the stored
  * one, and overwriting would regress last-touch to an older click.
  * With those two rules, a batch boundary placed anywhere in an
  * event-time-ordered stream yields the same attributions as the
  * batch window (proved by `StreamingAttributionSpec`'s parity test),
  * and late CLICKS never corrupt state. The residual streaming trade:
  * a late PURCHASE that arrives after a newer click was stored
  * attributes to that (event-time-future) click — exact repair would
  * need the full click history inside the watermark, which is the
  * batch query's job; events past the watermark are dropped upstream.
  */
object Attribution {

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                is_click: Boolean, channel: String) {
    def ts_ms: Long = ts.getTime
  }
  case class LastClick(ts_ms: Long, event_id: Long, channel: String)
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
              if (e.is_click) {
                // keep the latest click by EVENT time, not arrival: a
                // lenient watermark admits a late batch whose clicks
                // precede the stored one — overwriting would regress
                // last-touch to an older click
                if (st.forall(c => c.ts_ms < e.ts_ms ||
                    (c.ts_ms == e.ts_ms && c.event_id < e.event_id)))
                  st = Some(LastClick(e.ts_ms, e.event_id, e.channel))
              } else {
                // the stored click must PRECEDE the purchase by
                // (ts, event_id) — a late purchase arriving after a
                // newer click was stored must not credit an
                // event-time-future click (it goes unattributed; the
                // exact 'older click' answer needs history only the
                // batch window has — documented residual trade)
                val ch = st match {
                  case Some(c)
                      if (c.ts_ms < e.ts_ms ||
                        (c.ts_ms == e.ts_ms && c.event_id < e.event_id)) &&
                        e.ts_ms - c.ts_ms <= lookbackMs => c.channel
                  case _ => "unattributed"
                }
                out += Attributed(userId, e.event_id, e.ts_ms, ch)
              }
            }
            st match {
              case Some(c) =>
                // the stored click may already be beyond the lookback
                // horizon (back-to-back data batches never take the
                // hasTimedOut path): setTimeoutTimestamp below the
                // current watermark THROWS and kills the query — an
                // expired click can never attribute, so drop it
                // strict <: Spark retains state at horizon == watermark
                // (setTimeoutTimestamp throws only on BELOW-watermark,
                // timeouts fire only on strictly-past), and a purchase
                // at ts == horizon still legitimately attributes
                val horizon = c.ts_ms + lookbackMs
                if (horizon < state.getCurrentWatermarkMs()) state.remove()
                else {
                  state.update(c)
                  state.setTimeoutTimestamp(horizon)
                }
              case None => // only purchases seen, nothing to retain
            }
            out.result().iterator
          }
      }
  }
}
