package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store selection.
  *
  * The default HDFS-backed provider keeps every key of every loaded
  * state partition as an on-heap map — at 100 TB event scale (hundreds
  * of millions of live session/dedup keys) that is an executor OOM, not
  * a tuning problem. The RocksDB provider is the production choice: keys
  * live in off-heap block cache + local SST files, memory stays bounded,
  * and checkpointing ships compacted snapshots. Spark ships it in-box
  * (rocksdbjni), so selection is one conf.
  *
  * The provider class is a session-level SQLConf read once per streaming
  * query at start — there is no per-query writer option — so the helpers
  * set it on the session right before `start()`.
  */
object StateStores {

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Route all subsequently-started streaming queries in this session to
    * RocksDB-backed state. Idempotent. */
  def useRocksDB(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDBProvider)
}
