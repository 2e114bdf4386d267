package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: the third streaming-join shape
  * ([[StreamJoin]] covers stream-stream inner and LEFT OUTER; this is
  * the per-tick dimension lookup every enrichment cadence runs). The
  * static side is re-planned on EVERY micro-batch — a dim refresh
  * between ticks is picked up without restarting the query — and the
  * join itself holds NO state: each batch broadcast-probes the dim and
  * moves on. The only stateful operator is the downstream windowed
  * aggregation, watermark-bounded as usual. At 100 TB stream volume
  * the per-tick cost is batch-size × a broadcast hash probe; the dim
  * side stays a dim. */
object Enrich {

  /** Daily event counts per (nation, event_type) over a user stream
    * enriched against a (c_custkey, n_name) dim. The watermark rides
    * the SOURCE (before the join), so an in-band sentinel row advances
    * it even when the inner join drops the sentinel itself — the
    * flush needs no sink-side filtering. */
  def dailyByNation(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .groupBy(window(col("ts"), "1 day"), col("n_name"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("n_name"), col("event_type"), col("n"))
}
