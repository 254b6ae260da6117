package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST1 — the streaming form of the W2/W3 PIT dequeue (SURVEY §2.9).
  *
  * The reference's per-user sliding counter
  * (offline/preprocess/s2_term_trans.py:42-61) is a per-key,
  * event-time-ordered, bounded-state stateful scan: exactly
  * `flatMapGroupsWithState` with a ≤`frameLen`-element ring buffer per
  * user. Each event emits the counters computed from the buffer BEFORE
  * the event is appended (the strictly-before PIT contract), then the
  * buffer is advanced and truncated — state never exceeds `frameLen`
  * rows per key, so a 1000-executor cluster holds |users|×frameLen tiny
  * tuples of state, shuffled once on the user key.
  *
  * Late data: the reference assumes pre-sorted input
  * (s1_data_split.py:32); here each micro-batch is sorted per key on
  * (ts, event_id), matching that contract within a batch. A production
  * deployment would add `withWatermark` on ts to bound reordering
  * across batches.
  */
object StatefulPit {

  case class Ev(user_id: Long, event_id: Long, ts: Long, label: Int)
  case class PitOut(user_id: Long, event_id: Long, pit_imp: Long, pit_clk: Long)
  case class PitState(events: List[(Long, Int)])

  def apply(events: Dataset[Ev], frameLen: Int = 10): Dataset[PitOut] = {
    implicit val outEnc = Encoders.product[PitOut]
    implicit val stEnc = Encoders.product[PitState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[PitState, PitOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[PitState]) =>
          var buf = state.getOption.map(_.events).getOrElse(Nil)
          val out = it.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
            val snapshot = PitOut(uid, e.event_id, buf.size.toLong,
              buf.iterator.map(_._2.toLong).sum)
            buf = (buf :+ ((e.event_id, e.label))).takeRight(frameLen)
            snapshot
          }
          state.update(PitState(buf))
          out.iterator
      }
  }
}
