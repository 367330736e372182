package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online Holt linear-trend smoothing — the streaming twin of q246
  * (and the level+trend upgrade of [[SpikeDetector]]'s EWMA baseline):
  * each event's truncated-Holt state is emitted as the event arrives,
  * from a per-key ring of the last [[graft.QueriesAnalytics.HoltLags]]
  * settled-cents values carried in Spark-managed state.
  *
  * Exactness contract: the emitted `*_x16m` columns are the SAME
  * integer dot products q246 computes with window lags — weights from
  * the one [[graft.QueriesAnalytics.HoltWeights]] recurrence, missing
  * lags = 0 — so stream == batch bit-for-bit across arbitrary
  * micro-batch boundaries (spec-asserted), with no float anywhere.
  *
  * State is one ≤[[graft.QueriesAnalytics.HoltLags]]-slot long ring
  * per key — constant memory, no timeout needed at config-cardinality
  * keys (a web-scale per-user deployment would add the event-time
  * timeout pattern from [[Attribution]]). Ordering contract (the
  * [[Scd2Stream]]/[[SpikeDetector]] convention): within a batch the
  * group sorts by (ts_ms, event_id); an event at or before the last
  * folded (ts_ms, event_id) throws rather than silently corrupting
  * the ring — the per-shard ordered source guarantees this upstream.
  */
object HoltStream {
  import graft.QueriesAnalytics.{HoltLags, HoltWeights}

  case class Ev(user_id: Long, event_id: Long, ts_ms: Long, cents: Long)
  /** `ring` is most-recent-first, length ≤ HoltLags. */
  case class HoltState(ring: Seq[Long], lastTs: Long, lastId: Long)
  case class Smoothed(user_id: Long, event_id: Long, cents: Long,
                      level_x16m: Long, trend_x16m: Long, fcst_x16m: Long)

  /** Σ_j ring(j)·w(j)·4^(HoltLags−1−j) — q246's term list over the
    * materialized ring instead of window lags.
    */
  private def weighted(ring: Seq[Long], pick: ((Long, Long)) => Long): Long = {
    var acc = 0L
    var j = 0
    while (j < ring.length) {
      acc += ring(j) * (pick(HoltWeights(j)) * (1L << (2 * (HoltLags - 1 - j))))
      j += 1
    }
    acc
  }

  /** The one fold both twins run. Requires `evs` sorted by
    * (ts_ms, event_id); throws on an event at or before the state's
    * last folded position.
    */
  private[graft] def fold(uid: Long, st0: Option[HoltState], evs: Seq[Ev])
      : (Seq[Smoothed], Option[HoltState]) = {
    var st = st0
    val out = Seq.newBuilder[Smoothed]
    evs.foreach { e =>
      st.foreach { s =>
        if (e.ts_ms < s.lastTs || (e.ts_ms == s.lastTs && e.event_id <= s.lastId))
          throw new IllegalStateException(
            s"out-of-order event for user $uid: (${e.ts_ms}, ${e.event_id}) " +
              s"not after (${s.lastTs}, ${s.lastId})")
      }
      val ring = (e.cents +: st.map(_.ring).getOrElse(Seq.empty)).take(HoltLags)
      val lvl = weighted(ring, _._1)
      val tr = weighted(ring, _._2)
      out += Smoothed(uid, e.event_id, e.cents, lvl, tr, lvl + tr)
      st = Some(HoltState(ring, e.ts_ms, e.event_id))
    }
    (out.result(), st)
  }

  /** Batch twin: per-key sequential fold over time-sorted groups
    * (per-key event history is the bounded unit here; the production
    * batch path is q246's window-lag plan, asserted equal in the
    * spec).
    */
  def batchSmooth(evs: Dataset[Ev]): Dataset[Smoothed] = {
    implicit val outEnc = Encoders.product[Smoothed]
    implicit val keyEnc = Encoders.scalaLong
    evs.groupByKey(_.user_id).flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
      fold(uid, None, it.toSeq.sortBy(e => (e.ts_ms, e.event_id)))._1.iterator
    }
  }

  /** Streaming twin: same fold against Spark-managed state. */
  def smooth(evs: Dataset[Ev]): Dataset[Smoothed] = {
    implicit val outEnc = Encoders.product[Smoothed]
    implicit val stEnc = Encoders.product[HoltState]
    implicit val keyEnc = Encoders.scalaLong
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[HoltState, Smoothed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[HoltState]) =>
          val (out, st) = fold(uid, state.getOption,
            batch.toSeq.sortBy(e => (e.ts_ms, e.event_id)))
          st.foreach(state.update)
          out.iterator
      }
  }
}
