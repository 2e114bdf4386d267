package graft

import org.apache.spark.sql.SparkSession

/** Conf isolation for operators that must mutate session configuration.
  *
  * `SQLConf` is per-session while the `SparkContext`, cache manager and
  * catalog data are shared across sessions — so an operator that needs a
  * temporary conf (AQE off for an iterative loop, a narrower
  * `shuffle.partitions` for streaming state) must NOT toggle it on the
  * caller's session: with a concurrent serving layer ([[Serve]]) two
  * overlapping set/restore windows race (the second request captures the
  * first's override as its "restore" value and leaves it stuck), and the
  * toggle silently re-plans unrelated concurrent queries. Running the
  * section on a cloned session makes the conf change invisible outside.
  */
object Sessions {

  /** Run `body` against a clone of `spark`: same SparkContext, shared
    * cache (a `persist` in the clone is visible to the parent's planner
    * and vice versa), but an isolated SQLConf pre-seeded from the
    * parent's current runtime conf, so `body` may set confs freely
    * without any restore bookkeeping — the clone is garbage after. */
  def confIsolated[T](spark: SparkSession)(body: SparkSession => T): T =
    body(freshClone(spark))

  /** Memoized variant for operators that always want the SAME conf
    * delta (e.g. the AQE-off clustering loop): the clone (with `setup`
    * applied) is built once per (parent, key) and reused, so repeated
    * calls skip session construction and the lazy SessionState init.
    * The clone snapshots the parent's conf at FIRST use — later parent
    * conf changes don't propagate, which is exactly the isolation
    * contract. `setup` must be idempotent conf-setting only. */
  def confIsolatedCached[T](spark: SparkSession, key: String)(
      setup: SparkSession => Unit)(body: SparkSession => T): T = {
    val perParent = cached.synchronized {
      var m = cached.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, SparkSession]
        cached.put(spark, m)
      }
      m
    }
    val s = perParent.computeIfAbsent(key, _ => {
      val c = freshClone(spark)
      setup(c)
      c
    })
    body(s)
  }

  // Weak-keyed by the PARENT session so a stopped/unreferenced parent
  // releases its clones (a clone references the shared state, not the
  // parent object, so the weak key can actually clear) — an unbounded
  // strong map would pin one SessionState per (parent, key) forever in
  // any workload that builds sessions repeatedly.
  private val cached =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, SparkSession]]

  private def freshClone(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    // Copy-all with a throw guard, NOT an isModifiable filter:
    // isModifiable is false for unregistered custom keys (e.g.
    // graft.stream.statePartitions), which a filter would silently drop
    // — the clone must see every runtime knob the caller set. Only
    // static confs (which throw on set) are skipped.
    spark.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    s
  }
}
