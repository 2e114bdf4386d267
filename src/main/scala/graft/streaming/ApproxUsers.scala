package graft.streaming

import java.sql.Timestamp

import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input event for streaming approximate-distinct: the (event_type, week)
  * bucket is precomputed by the caller (week = Monday-aligned
  * `date_trunc('week', ts)` as yyyy-MM-dd, the evt_retention convention,
  * identical in DuckDB), `week_end_ms` its exclusive end for the
  * event-time timeout. */
case class TypedEvent(event_type: String, week: String, week_end_ms: Long,
    user_id: Long, ts: Timestamp)

/** Per-(type, week) state: one serialized updatable HLL sketch + the
  * bucket's end (carried in state so a timed-out invocation — which sees
  * no events — can still close the right bucket). */
case class HllState(bytes: Array[Byte], weekEndMs: Long)

/** One closed bucket: the sketch estimate + its compact serialized size
  * (the bounded-state claim as data — the catalog entry turns it into a
  * hash-checked verdict column). */
case class ApproxOut(event_type: String, week: String, approx_users: Double,
    sketch_bytes: Long)

/** Streaming approximate distinct-user counts per (event_type, week) via
  * DataSketches HLL state in `flatMapGroupsWithState` — the streaming
  * member of the sketch family (rel_approx_distinct / rel_sketch_rollup
  * made CONTINUOUS). Every other stream_* entry keeps exact state
  * (dedup keys, open sessions, join buffers — all bounded by a
  * watermark horizon); a continuous unique-users panel has no such
  * horizon inside a bucket, and exact per-bucket distinct state grows
  * with |users|. The sketch caps it: state per open (type, week) key is
  * ONE ~2 KiB HLL_4 sketch (lgK=12, rsd 1.04/√4096 ≈ 1.6%) whatever the
  * user cardinality, sketches merge associatively across micro-batches
  * by construction (the update stream IS the merge), and emission is
  * watermark-gated exactly like [[Sessionize]]: a bucket closes only
  * once the event-time watermark passes its end, so no in-watermark
  * event can still reach it.
  *
  * Determinism: an HLL sketch's state is a pure function of the SET of
  * hashed values (max-per-slot), so the estimate is arrival-order- and
  * batch-split-independent (property-tested in StreamingSpec) — the
  * catalog gate encodes it as exact+band verdicts, the
  * rel_approx_distinct convention.
  *
  * Scale: state is (type, week)-partitioned across executors in the
  * state store; each micro-batch touches only keys with new data plus
  * timed-out keys; a year-long stream holds |types|×(weeks inside the
  * watermark delay) sketches, each constant-size. */
object ApproxUsers {

  /** lgK = 12: 2^12 buckets, rsd ≈ 1.6%, dense HLL_4 ≈ 2 KiB. */
  val LgK = 12

  /** Relative error band for the gate verdicts: 3.5× the sketch rsd
    * (the rel_sketch_rollup convention — ~99.97% under the estimator's
    * near-Gaussian error; below ~512 users the sketch is in exact
    * set mode and the band is trivially met). */
  val Band: Double = 3.5 * 1.04 / math.sqrt((1L << LgK).toDouble)

  /** Every emitted sketch must serialize under this (dense HLL_4 at
    * lgK=12 is ~2 KiB; 4 KiB leaves header room) — the constant-state
    * claim as a checkable bound. */
  val MaxSketchBytes = 4096L

  def approxUsers(events: Dataset[TypedEvent], watermarkDelay: String): Dataset[ApproxOut] = {
    import events.sparkSession.implicits._
    events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.event_type, e.week))
      .flatMapGroupsWithState[HllState, ApproxOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((typ, week), it, state) =>
          if (state.hasTimedOut) {
            // Watermark passed the bucket end: no in-watermark event can
            // still arrive for it — close and emit.
            val sk = HllSketch.heapify(state.get.bytes)
            state.remove()
            Iterator.single(ApproxOut(typ, week, sk.getEstimate,
              sk.toCompactByteArray.length.toLong))
          } else {
            val existing = state.getOption
            val wmMs = state.getCurrentWatermarkMs()
            val sk = existing.map(s => HllSketch.heapify(s.bytes))
              .getOrElse(new HllSketch(LgK))
            var weekEnd = existing.map(_.weekEndMs).getOrElse(-1L)
            var n = 0L
            it.foreach { e =>
              if (weekEnd < 0) weekEnd = e.week_end_ms
              sk.update(e.user_id)
              n += 1
            }
            if (existing.isEmpty && weekEnd >= 0 && wmMs >= weekEnd) {
              // Beyond-watermark-late data for an already-closed bucket:
              // re-opening would emit a duplicate partial row. Drop it —
              // the same contract windowed aggregation applies to
              // too-late rows (flatMapGroupsWithState leaves that
              // filtering to the user function).
              Iterator.empty
            } else {
              state.update(HllState(sk.toUpdatableByteArray, weekEnd))
              // Fire once the watermark passes the bucket end (must be
              // strictly ahead of the current watermark to be legal).
              state.setTimeoutTimestamp(math.max(weekEnd, wmMs + 1L))
              Iterator.empty
            }
          }
      }
  }
}
