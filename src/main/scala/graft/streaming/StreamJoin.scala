package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream interval join — the attribution shape: each
  * click joins the impression (same id) it followed within one hour.
  *
  * Both inputs carry watermarks and the join condition bounds the time
  * range in BOTH directions, which is what lets Spark evict buffered
  * rows: an impression can be dropped from state once the click-side
  * watermark passes `imp_time + 1 hour`, and a click once the
  * impression-side watermark passes its own time. Without the range
  * condition the state grows forever — the difference between a demo
  * and something that survives a week of 100 TB/day streams. The output
  * is append-mode compatible (inner join), so it composes with any
  * downstream sink or aggregation in this catalog.
  *
  * (The reference has no streaming joins at all; this extends the EP2
  * streaming family the same way the LLM operators extend batch.)
  */
object StreamJoin {

  /** Join `impressions` (keyed by `impKey`, timed by `imp_time`) with
    * `clicks` (keyed by `clickKey`, timed by `click_time`): matched
    * pairs where the click lands within one hour after the impression.
    * Key column names are parameters so the same operator serves any
    * two streams whose key columns differ in name. */
  def attribute(impressions: DataFrame, clicks: DataFrame,
      impKey: String = "imp_id", clickKey: String = "click_imp_id"): DataFrame = {
    val i = impressions.withWatermark("imp_time", "1 hour")
    val c = clicks.withWatermark("click_time", "2 hours")
    i.join(c, expr(
      s"""$impKey = $clickKey AND
         |click_time >= imp_time AND
         |click_time <= imp_time + interval 1 hour""".stripMargin))
  }

  /** The LEFT OUTER form of [[attribute]] — the "unconverted
    * impressions" report: every impression emits exactly once, matched
    * rows as soon as the click arrives, unmatched rows with a null
    * click side once the click watermark passes `imp_time + 1 hour`
    * and Spark can PROVE no match is still possible. That proof is the
    * hard part of outer streaming joins: the null-side row is emitted
    * by state eviction, so a finite input whose watermark never passes
    * the final hour silently withholds its tail — callers feeding
    * bounded replays must append a watermark heartbeat (sentinel) row
    * past the horizon, which is exactly what a production cadence gets
    * for free from the next day's data. */
  def attributeOuter(impressions: DataFrame, clicks: DataFrame,
      impKey: String = "imp_id", clickKey: String = "click_imp_id"): DataFrame = {
    val i = impressions.withWatermark("imp_time", "1 hour")
    val c = clicks.withWatermark("click_time", "2 hours")
    i.join(c, expr(
      s"""$impKey = $clickKey AND
         |click_time >= imp_time AND
         |click_time <= imp_time + interval 1 hour""".stripMargin),
      "leftOuter")
  }
}
