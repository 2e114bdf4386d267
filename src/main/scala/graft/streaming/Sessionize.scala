package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input event for streaming sessionization. */
case class SessEvent(user_id: Long, ts: Timestamp)

/** One session: bounds in epoch micros + event count. */
case class SessState(startUs: Long, lastUs: Long, n: Long)

/** Per-key state: gap-separated sessions, sorted by start, none yet
  * watermark-safe to emit. */
case class SessListState(sessions: Seq[SessState])

/** A closed session. Bounds in epoch micros (exact integer arithmetic on
  * both engines — no timestamp formatting in the comparison path). */
case class SessOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Streaming gap sessionization via `flatMapGroupsWithState` — the
  * custom-state tier of Structured Streaming (T-ops beyond windowed
  * aggregation, SURVEY §2.11).
  *
  * Emission is watermark-gated, the same contract as Spark's builtin
  * `session_window`: a session [s, l] is emitted only once the event-time
  * watermark passes l + gap — before that an in-watermark out-of-order
  * event could still extend it or bridge it with a neighbor, so eager
  * emission would diverge from the batch gap-fold. Under this rule the
  * streamed result equals the BATCH sessionization of the same events
  * for ANY arrival order within the watermark delay (property-tested on
  * randomized multi-batch disorder in StreamingSpec).
  *
  * State per key is the list of not-yet-safe sessions (merged
  * incrementally per batch, adjacent sessions coalescing when a late
  * event bridges them); the event-time timeout fires at the earliest
  * possible emission point, so idle keys drain without new data. State
  * is bounded by the watermark delay: sessions older than delay + gap
  * always emit, so a key holds at most the sessions of one delay window.
  *
  * Scale: state is partitioned by user key across executors in the state
  * store; each micro-batch touches only keys with new data plus timed-out
  * keys; nothing is driver-side.
  */
object Sessionize {

  /** 30-minute inactivity gap, in micros (matches the batch operator). */
  val GapUs: Long = 1800L * 1000000L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Merge sorted sessions with sorted event times into the canonical
    * gap-separated session list (identical arithmetic to the batch
    * fold: strictly-greater-than-gap splits). */
  private def merge(existing: Seq[SessState], ts: Array[Long]): List[SessState] = {
    val atoms = (existing ++ ts.map(t => SessState(t, t, 1L)))
      .sortBy(s => (s.startUs, s.lastUs))
    atoms.foldLeft(List.empty[SessState]) { (acc, a) =>
      acc match {
        case cur :: rest if a.startUs - cur.lastUs <= GapUs =>
          SessState(cur.startUs, math.max(cur.lastUs, a.lastUs), cur.n + a.n) :: rest
        case _ => a :: acc
      }
    }.reverse
  }

  /** Sessions over a (possibly streaming) event Dataset. */
  def sessions(events: Dataset[SessEvent], watermarkDelay: String): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events
      // ts is nullable in the source schema; a null event time has no
      // place on the session timeline (the batch operator's SQL drops it
      // the same way), and unguarded it would NPE in micros().
      .filter(org.apache.spark.sql.functions.col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessListState, SessOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val ts = it.map(e => micros(e.ts)).toArray
          java.util.Arrays.sort(ts)
          val merged = merge(existing, ts)
          val wUs = state.getCurrentWatermarkMs() * 1000L
          // Safe to emit once no in-watermark event can reach the
          // session: every future event time t satisfies t >= watermark,
          // and extension/bridging needs t <= lastUs + gap.
          val (emit, keep) = merged.partition(_.lastUs + GapUs < wUs)
          if (keep.isEmpty) state.remove()
          else {
            state.update(SessListState(keep))
            // earliest possible emission; guaranteed > current watermark
            // because keep.head was not emittable this invocation
            state.setTimeoutTimestamp((keep.head.lastUs + GapUs) / 1000L + 1L)
          }
          emit.iterator.map(s => SessOut(user, s.startUs, s.lastUs, s.n))
      }
  }
}
