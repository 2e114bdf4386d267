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

  // Two in-process refreshes of the SAME lake must serialize: both
  // would write `<path>.staged` (a mode-overwrite clobbering the
  // other's half-written staging) and race the rename pair. Striped
  // normalized-path locks — the CorpusOps.lockFor convention
  // (CorpusOps.scala:248) — so distinct lakes still refresh
  // concurrently. Cross-PROCESS writers remain the caller's contract
  // (one Schedule/Serve owner per lake root), same as the reference's
  // one-Prefect-deployment-per-flow.
  private val LockStripes = 64
  private val locks = Array.fill(LockStripes)(new Object)
  private val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*://".r
  private def lockFor(path: String): Object = {
    val norm =
      if (SchemePrefix.findPrefixOf(path).isDefined) path.stripSuffix("/")
      else
        try java.nio.file.Paths.get(path).toAbsolutePath.normalize.toString
        catch {
          case _: java.nio.file.InvalidPathException => path.stripSuffix("/")
        }
    locks(math.floorMod(norm.hashCode, LockStripes))
  }

  /** Overwrite `path` with `df` via the staged swap, optionally
    * partitioned. The staged write executes the plan BEFORE any rename,
    * so a plan that reads the live lake (e.g. an upsert's carry-forward
    * leg) reads consistent data.
    *
    * Every rename is CHECKED: Hadoop's `FileSystem.rename` reports
    * failure as `false`, not an exception, and an unchecked swap would
    * silently serve stale data forever (refresh "succeeds", lake never
    * changes). If the live→old move succeeded but staged→live then
    * fails, the live lake is gone — that branch rolls the old lake
    * back before throwing, so a reader never faces an empty path. */
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    lockFor(path).synchronized {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        df.sparkSession.sparkContext.hadoopConfiguration)
      val lake = new org.apache.hadoop.fs.Path(path)
      val staged = new org.apache.hadoop.fs.Path(path + ".staged")
      val old = new org.apache.hadoop.fs.Path(path + ".old")
      val w = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(staged.toString)
      fs.delete(old, true)
      val hadLive = fs.exists(lake)
      if (hadLive && !fs.rename(lake, old))
        throw new java.io.IOException(
          s"staged swap: could not move live lake aside ($lake -> $old); " +
            "live lake untouched, staged refresh left at " + staged)
      if (!fs.rename(staged, lake)) {
        val rolledBack = hadLive && fs.rename(old, lake)
        throw new java.io.IOException(
          s"staged swap: could not move staged lake in ($staged -> $lake); " +
            (if (rolledBack) "old lake rolled back"
             else if (hadLive) s"ROLLBACK FAILED - old lake stranded at $old"
             else "no prior lake existed"))
      }
      fs.delete(old, true): Unit
    }
}
