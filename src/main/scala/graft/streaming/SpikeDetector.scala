package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online spike detection over per-key daily counts — the STREAMING
  * member of the anomaly family (q65 retrospective moving stats, q95
  * retrospective deviation top-N, q107 windowed EWMA): each day's
  * count is compared against an exact integer EWMA baseline carried in
  * Spark-managed per-key state, so alerts fire as the day's aggregate
  * arrives instead of on the next batch re-scan.
  *
  * The baseline is a dyadic EWMA (α = 1/2^[[AlphaShift]]) kept as a
  * single scaled long: `e' = ((2^s − 1)·e + cnt·2^B) >> s`, floor-
  * truncated to [[ScaleBits]] fractional bits every step. Truncation
  * is what makes the fold a bounded-precision, engine-independent
  * integer sequence — the batch and streaming twins produce
  * bit-identical baselines because they run the SAME fold
  * ([[fold]] is the single source of truth), and the spec proves the
  * streaming runtime preserves it across arbitrary micro-batch
  * boundaries.
  *
  * A day flags once [[Warmup]] observations have seeded the baseline
  * and `cnt · 2^B > SpikeFactor · e_before` — integer compare, no
  * float anywhere. The first observation seeds the EWMA with itself
  * (never a spike).
  *
  * State is ONE long pair per key; keys are metric/event types
  * (config cardinality), so no expiry is needed — a per-user variant
  * would add an event-time timeout like
  * [[graft.streaming.Attribution]]'s. Ordering contract (the
  * [[Scd2Stream]] convention): within a batch the group sorts by day;
  * across batches a day ≤ the last folded day throws rather than
  * silently corrupting the baseline — upstream daily aggregation
  * emits each (key, day) exactly once, in watermark order.
  */
object SpikeDetector {

  /** Fractional bits of the scaled EWMA (2^15 denominator — q107's
    * scale).
    */
  val ScaleBits = 15
  /** α = 1/2^3 = 1/8. */
  val AlphaShift = 3
  /** Flag when the day's count exceeds SpikeFactor × baseline. */
  val SpikeFactor = 4L
  /** Observations before flags arm. */
  val Warmup = 3

  case class DayCount(key: String, day: String, cnt: Long)
  case class EwmaState(ewmaScaled: Long, n: Long, lastDay: String)
  /** `ewma_scaled` is the baseline BEFORE folding the day in. */
  case class Spike(key: String, day: String, cnt: Long,
                   ewma_scaled: Long, spike: Boolean)

  /** The one fold both twins run. Requires `days` sorted ascending;
    * throws on a day at or before the state's last folded day.
    */
  private[graft] def fold(key: String, st0: Option[EwmaState],
                          days: Seq[DayCount]): (Seq[Spike], Option[EwmaState]) = {
    var st = st0
    val out = Seq.newBuilder[Spike]
    days.foreach { d =>
      st.foreach { s =>
        if (d.day <= s.lastDay) throw new IllegalStateException(
          s"out-of-order day for key $key: ${d.day} not after ${s.lastDay} " +
            "(daily aggregates must arrive once, in order)")
      }
      val before = st.map(_.ewmaScaled).getOrElse(d.cnt << ScaleBits)
      val n = st.map(_.n).getOrElse(0L)
      val spike = n >= Warmup && (d.cnt << ScaleBits) > SpikeFactor * before
      out += Spike(key, d.day, d.cnt, before, spike)
      val updated = ((before << AlphaShift) - before + (d.cnt << ScaleBits)) >> AlphaShift
      st = Some(EwmaState(updated, n + 1, d.day))
    }
    (out.result(), st)
  }

  /** Batch twin: per-key sequential fold over day-sorted groups. The
    * group is days × keys — time-bounded metadata, not corpus rows —
    * so the in-memory sort is as legitimate as GlobalRank's offsets.
    */
  def batchDetect(days: Dataset[DayCount]): Dataset[Spike] = {
    implicit val outEnc = Encoders.product[Spike]
    implicit val strEnc = Encoders.STRING
    days.groupByKey(_.key).flatMapGroups { (k: String, it: Iterator[DayCount]) =>
      fold(k, None, it.toSeq.sortBy(_.day))._1.iterator
    }
  }

  /** Streaming twin: same fold against Spark-managed state. */
  def detect(days: Dataset[DayCount]): Dataset[Spike] = {
    implicit val outEnc = Encoders.product[Spike]
    implicit val stEnc = Encoders.product[EwmaState]
    implicit val strEnc = Encoders.STRING
    days.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, Spike](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, batch: Iterator[DayCount], state: GroupState[EwmaState]) =>
          val (out, st) = fold(k, state.getOption, batch.toSeq.sortBy(_.day))
          st.foreach(state.update)
          out.iterator
      }
  }
}
