package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 maintenance — the incremental twin of the batch
  * [[graft.operators.Scd2]] builder, and the history-keeping upgrade of
  * the reference's current-state-only TTL cache
  * (`caching_lazyfill.go:87-157`: every refresh OVERWRITES the entry;
  * the previous value is lost).
  *
  * Each key's latest version lives in Spark-managed state
  * (checkpointed, partitioned by key — never a driver-resident map);
  * when a change supersedes it, the CLOSED interval row
  * (valid_from, valid_to, version) is appended downstream. The open
  * (current) version stays in state until superseded, so the emitted
  * stream is exactly the batch builder's `valid_to IS NOT NULL` rows —
  * the parity `Scd2StreamSpec` asserts.
  *
  * Ordering contract: per-key in-order delivery, the same guarantee the
  * sharded source provides when the stream is keyed by partition key
  * (Kinesis per-shard sequence order, `consumer.go:121-139`); within a
  * micro-batch, same-key records sort by (ts, seq).
  */
object Scd2Stream {

  case class Change(k: Long, ts_ms: Long, seq: Long, attr: Double)
  case class VerState(version: Long, ts_ms: Long, seq: Long, attr: Double)
  case class ClosedVersion(k: Long, version: Long, valid_from_ms: Long,
                           valid_to_ms: Long, attr_value: Double)

  def closedVersions(changes: Dataset[Change]): Dataset[ClosedVersion] = {
    implicit val outEnc = Encoders.product[ClosedVersion]
    implicit val stEnc = Encoders.product[VerState]
    implicit val keyEnc = Encoders.scalaLong
    changes.groupByKey(_.k)
      .flatMapGroupsWithState[VerState, ClosedVersion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, batch: Iterator[Change], state: GroupState[VerState]) =>
          val sorted = batch.toSeq.sortBy(c => (c.ts_ms, c.seq))
          val out = Seq.newBuilder[ClosedVersion]
          var st = state.getOption
          sorted.foreach { c =>
            st match {
              case Some(v) =>
                // a change OLDER than the open version violates the
                // per-key-order contract; emitting would produce
                // valid_to < valid_from and silently break batch
                // parity — fail the task instead of corrupting output.
                // Same-ts with seq <= the open version's is the
                // cross-batch twin: the batch builder's (ts, seq)
                // ordering would sort it BEFORE the open version, an
                // ordering no append-only maintainer can reproduce —
                // reject it as loudly as the strict-ts case instead of
                // silently assigning it the losing side of the race.
                if (c.ts_ms < v.ts_ms ||
                    (c.ts_ms == v.ts_ms && c.seq <= v.seq)) throw new IllegalStateException(
                  s"out-of-order change for key $k: (ts ${c.ts_ms}, seq ${c.seq}) " +
                    s"not after open version at (ts ${v.ts_ms}, seq ${v.seq})")
                out += ClosedVersion(k, v.version, v.ts_ms, c.ts_ms, v.attr)
                st = Some(VerState(v.version + 1, c.ts_ms, c.seq, c.attr))
              case None =>
                st = Some(VerState(1L, c.ts_ms, c.seq, c.attr))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
