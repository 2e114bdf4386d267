package graft

import org.apache.spark.sql.DataFrame

/** Staged full-refresh for path-based lakes.
  *
  * A plain `mode("overwrite")` DELETES the target before the
  * multi-second rewrite, so any concurrent reader (the serve-while-
  * refreshing mode, a dashboard mid-tick) sees a missing or partial
  * lake for the whole write duration. Staging narrows that exposure to
  * two directory renames: write everything to `<path>.staged`, move the
  * live lake aside, rename the staged one in, drop the old. A crash
  * leaves either the live lake or a recoverable `.old` — never a
  * half-written directory under the live name. A reader can still race
  * the rename instant itself; a transactional table format (or a
  * manifest/view indirection) is the production close for that last
  * gap (same caveat as [[graft.streaming.NewsStream.upsertToLake]],
  * which shares this swap).
  */
object LakeSwap {

  /** Overwrite `path` with `df` via the staged swap, optionally
    * partitioned. The staged write executes the plan BEFORE any rename,
    * so a plan that reads the live lake (e.g. an upsert's carry-forward
    * leg) reads consistent data. */
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val lake = new org.apache.hadoop.fs.Path(path)
    val staged = new org.apache.hadoop.fs.Path(path + ".staged")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staged.toString)
    fs.delete(old, true)
    if (fs.exists(lake)) fs.rename(lake, old)
    fs.rename(staged, lake): Unit
    fs.delete(old, true): Unit
  }
}
