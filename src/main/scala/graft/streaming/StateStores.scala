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

  /** Run `body` (a streaming query lifecycle) on a conf-isolated clone
    * of `spark` ([[graft.Sessions.confIsolated]]) configured for
    * production streaming state: RocksDB provider, and the
    * state-partition width set to `graft.stream.statePartitions`
    * (default 8) instead of the session's scan-oriented
    * `spark.sql.shuffle.partitions`. `body` must build the whole
    * readStream→writeStream lifecycle on the session it receives.
    *
    * A streaming query's stateful-operator partition count is locked in
    * from `spark.sql.shuffle.partitions` at the FIRST micro-batch and
    * carried in the checkpoint forever after — and every micro-batch
    * pays a fixed per-partition cost (state store open/commit/snapshot;
    * with RocksDB, an instance each), regardless of data. That width
    * should track the state keyspace and ingest throughput, NOT the
    * core count a batch scan wants: a deployment ingesting 100 TB/day
    * raises the conf; micro-batches over a few thousand keys do not
    * want 32+ mostly-empty RocksDB instances per operator.
    *
    * The clone (not a set/restore on the caller's session) is what makes
    * this safe under the concurrent [[graft.Serve]] layer: two
    * overlapping restores on one shared session race, and the narrowed
    * shuffle width would silently apply to unrelated concurrent batch
    * queries.
    *
    * The clone is MEMOIZED per (parent, state width) — the
    * [[graft.Sessions.confIsolatedCached]] lifecycle the CC loop uses —
    * so a multi-fire lifecycle (every stream_* entry fires twice; Bench
    * re-fires per pass) pays session construction + lazy SessionState
    * init once, not per fire. The width rides in the cache key, so a
    * runtime change of `graft.stream.statePartitions` still takes
    * effect on the next lifecycle (ServeSpec pins this).
    *
    * Changelog checkpointing (r18, per-entry conf since r19): each
    * RocksDB commit ships the batch's CHANGE set instead of a full
    * snapshot per partition per batch — snapshots still happen, but in
    * the background maintenance thread. With 8+ state partitions and
    * AvailableNow's short batches the per-commit snapshot was the
    * measured dominant fixed cost (state commitTimeMs ≈ 2/3 of
    * addBatch on the sessionize probe; ~28% off the whole lifecycle),
    * and at production cadence it is the same setting Spark documents
    * for frequent-commit workloads. `graft.stream.changelog`
    * (default on) rides in the memo key like the width, so a
    * deployment — or a per-entry probe — can flip it per lifecycle
    * without touching the shared clone's conf (bodies must NOT set
    * session confs on the memoized clone: it is shared across entries
    * and snapshots the parent conf only at first use). */
  def streamingSession[T](spark: SparkSession)(body: SparkSession => T): T = {
    val width = spark.conf.getOption("graft.stream.statePartitions").getOrElse("8")
    val changelog = spark.conf.getOption("graft.stream.changelog").getOrElse("true")
    graft.Sessions.confIsolatedCached(spark, s"streaming-state-$width-cl$changelog") { s =>
      useRocksDB(s)
      s.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog)
      s.conf.set("spark.sql.shuffle.partitions", width)
    }(body)
  }
}
