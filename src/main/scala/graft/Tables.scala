package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the TPC-H-ish star schema + `events`/`documents`/
  * `embeddings` at `/root/testdata/sf*` (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives the scale-factor dir and
  * loads through here, so the scan path is uniform: columnar Parquet with
  * Catalyst predicate pushdown and column pruning — the Spark-native
  * replacement for the reference's per-index Elasticsearch scans
  * (reference: flow/scripts/insert_owid.py:28-30 writes one ES index per
  * source; we read one Parquet table per name).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has shipped in two vintages: TIMESTAMP(NANOS), which
    // Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL) unless
    // nanos are read as raw longs, and plain timestamp[us], which reads as
    // TIMESTAMP_NTZ. Set the legacy conf lazily so any session
    // (driver-created or ours) tolerates the nanos vintage, then dispatch on
    // the dtype that actually loaded so either vintage yields the same
    // TimestampType column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        // Nanos-as-long vintage: rebuild micros with exact integer division
        // (`div`, not double `/`): epoch-nanos (~1.7e18) exceed double's
        // 2^53 precision, so `/ 1000` loses 1µs on ~12% of rows.
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // timestamp[us] vintage: identity-instant cast under the UTC
        // session TZ, giving the TimestampType the event ops expect.
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }

  /** Common SparkSession config for mains (local mode, UTC, AQE on,
    * graft's native functions injected via SparkSessionExtensions — the
    * production registration path; queries also self-register for
    * sessions built elsewhere). */
  def session(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
  }
}
