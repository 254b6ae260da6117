package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the flagship's serving-snapshot RANK state
  * (Flagship.scala `snap` stage / the S7 snapshot sink): per user, the
  * candidate CTR over the last ≤`frameLen` events, maintained online.
  *
  * Each micro-batch advances a ≤frameLen ring buffer per user (the
  * StatefulPit state shape keyed for SERVING: item + exact half-up ppm
  * CTR, not per-event counters) and re-emits the user's FULL refreshed
  * snapshot tagged with a per-user monotone version — the consumer
  * (spec, or a KV sink at production) keeps only each user's latest
  * version, which also retires rows whose item fell out of the frame
  * (the stale-row eviction a plain upsert-by-(user, item) would miss).
  *
  * State is bounded at frameLen tuples per user; one shuffle on the
  * user key — the same 1000-executor footprint as ST1.
  */
object StreamingServingSnapshot {

  case class Ev(user_id: Long, event_id: Long, ts: Long, item: String,
                label: Int)
  case class SnapOut(user_id: Long, ver: Long, item: String, imp: Long,
                     clk: Long, rank_ppm: Long)
  case class SnapState(events: List[(Long, Long, String, Int)],
                       ver: Long)

  def apply(events: Dataset[Ev], frameLen: Int = 10): Dataset[SnapOut] = {
    implicit val outEnc = Encoders.product[SnapOut]
    implicit val stEnc = Encoders.product[SnapState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SnapState, SnapOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SnapState]) =>
          val st = state.getOption.getOrElse(SnapState(Nil, 0L))
          // MERGE incoming with the buffered frame by (ts, event_id),
          // then keep the last frameLen: a late event arriving in a
          // later micro-batch slots into timestamp order instead of
          // appending after newer rows — the batch twin orders
          // globally. Cheap: ≤ frameLen + batch tuples per user.
          // Lateness beyond the retained frame is unrecoverable by
          // construction (the ring already forgot that prefix);
          // within-frame lateness lands exactly where batch puts it.
          val incoming = it.map(e => (e.ts, e.event_id, e.item, e.label))
          val buf = (st.events ++ incoming)
            .sortBy(t => (t._1, t._2)).takeRight(frameLen)
          val ver = st.ver + 1
          state.update(SnapState(buf, ver))
          buf.groupBy(_._3).map { case (item, evs) =>
            val imp = evs.size.toLong
            val clk = evs.iterator.map(_._4.toLong).sum
            SnapOut(uid, ver, item, imp, clk,
              (clk * 2000000L + imp) / (2L * imp))
          }.iterator
      }
  }
}
