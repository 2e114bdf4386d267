package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Edge semantics of the event operators that the cross-engine oracle
  * can't distinguish (both engines would share a wrong boundary). */
class EventOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of: clicks with no prior view match null; later views don't leak back") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click"), // before any view -> null
      (2L, ts("2024-01-01 10:30:00"), 7L, "view"),
      (3L, ts("2024-01-01 11:00:00"), 7L, "click"), // matches view 2
      (4L, ts("2024-01-01 11:30:00"), 7L, "view"),
      (5L, ts("2024-01-01 12:00:00"), 7L, "click")) // matches view 4 (latest)
      .toDF("event_id", "ts", "user_id", "event_type")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ev.withColumn("mv",
        last(when($"event_type" === "view", $"event_id"), ignoreNulls = true).over(w))
      .filter($"event_type" === "click")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out === Map(1L -> -1L, 3L -> 2L, 5L -> 4L))
  }

  test("sessionize: exactly-30min gap stays in session; 30min+1us starts a new one") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00.000000"), 7L),
      (2L, ts("2024-01-01 10:30:00.000000"), 7L), // exactly 30min -> same
      (3L, ts("2024-01-01 11:00:00.000001"), 7L)) // 30min + 1us -> new
      .toDF("event_id", "ts", "user_id")
    val order = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros($"ts")
    val isNew = when(lag(us, 1).over(order).isNull ||
      us - lag(us, 1).over(order) > 1800L * 1000000L, 1L).otherwise(0L)
    val sessions = ev.withColumn("sid", sum(isNew).over(run))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sessions === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
