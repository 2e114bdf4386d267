package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input event for streaming sessionization. */
case class SessEvent(user_id: Long, ts: Timestamp)

/** Open-session state: bounds in epoch micros + event count. */
case class SessState(startUs: Long, lastUs: Long, n: Long)

/** A closed session. Bounds in epoch micros (exact integer arithmetic on
  * both engines — no timestamp formatting in the comparison path). */
case class SessOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Streaming gap sessionization via `flatMapGroupsWithState` — the
  * custom-state tier of Structured Streaming (T-ops beyond windowed
  * aggregation, SURVEY §2.11): per-user sessions close either when a
  * later event arrives more than [[Sessionize.GapUs]] after the last one
  * (in-batch split, identical arithmetic to the batch
  * [[graft.queries.EventOps.sessionize]]), or when the event-time
  * watermark passes last-event + gap (`GroupStateTimeout
  * .EventTimeTimeout`) — so idle users' sessions still emit, and state
  * per key is ONE open session (bounded regardless of stream length;
  * eviction is the timeout itself).
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

  /** Sessions over a (possibly streaming) event Dataset. Within a batch,
    * a key's events are sorted by time and folded left; the surviving
    * open session is stored with an event-time timeout at last + gap. */
  def sessions(events: Dataset[SessEvent], watermarkDelay: String): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessOut(user, s.startUs, s.lastUs, s.n))
          } else {
            val ts = it.map(e => micros(e.ts)).toArray
            java.util.Arrays.sort(ts)
            var closed = List.empty[SessOut]
            var st = state.getOption.orNull
            var idx = 0
            // Cross-batch out-of-order handling: the sorted prefix lying
            // more than a gap BEFORE the open session can never join it —
            // sessionize that prefix standalone (batch-split semantics:
            // a chain of early events forms its own session(s), all
            // definitionally closed since the open session starts more
            // than a gap after the prefix ends).
            if (st != null) {
              var early: SessState = null
              while (idx < ts.length && st.startUs - ts(idx) > GapUs) {
                val t = ts(idx)
                early =
                  if (early == null) SessState(t, t, 1L)
                  else if (t - early.lastUs > GapUs) {
                    closed ::= SessOut(user, early.startUs, early.lastUs, early.n)
                    SessState(t, t, 1L)
                  } else SessState(early.startUs, t, early.n + 1)
                idx += 1
              }
              if (early != null)
                closed ::= SessOut(user, early.startUs, early.lastUs, early.n)
            }
            while (idx < ts.length) {
              val t = ts(idx)
              st =
                if (st == null) SessState(t, t, 1L)
                else if (t - st.lastUs > GapUs) {
                  closed ::= SessOut(user, st.startUs, st.lastUs, st.n)
                  SessState(t, t, 1L)
                } else
                  // min/max, not assignment: an event EARLIER than the
                  // stored session start but within the gap widens the
                  // bounds; lastUs never regresses (that would corrupt
                  // later gap and timeout arithmetic).
                  SessState(math.min(st.startUs, t), math.max(st.lastUs, t), st.n + 1)
              idx += 1
            }
            state.update(st)
            state.setTimeoutTimestamp((st.lastUs + GapUs) / 1000L)
            closed.reverse.iterator
          }
      }
  }
}
