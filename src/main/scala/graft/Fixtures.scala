package graft

import java.nio.file.Files

/** Locations of the repo's test fixtures and per-invocation scratch
  * space for queries that stage streaming runs on local disk.
  */
object Fixtures {

  /** Fixture root, overridable via `GRAFT_FIXTURES_DIR` so the repo (or
    * the fixtures) can relocate without code edits; every fixture path —
    * ingestion CSVs and the news landing dir — resolves through here. */
  val dir: String =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/fixtures")

  /** Crawler landing directory (EP2 input contract). */
  val newsLanding: String = s"$dir/news_landing"

  /** A fresh scratch directory unique to this invocation, removed
    * recursively on JVM exit. Streaming queries must never share a
    * checkpoint/sink across concurrent runs (two sessions on one box —
    * e.g. Bench and Verify — would corrupt each other's state through a
    * fixed path), so uniqueness is the contract here. */
  def scratchDir(prefix: String): String = {
    val p = Files.createTempDirectory(s"graft_${prefix}_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }
    p.toString
  }

  private val reused = new java.util.concurrent.ConcurrentHashMap[String, String]

  /** A scratch root memoized per prefix for the JVM's lifetime (ONE
    * directory, ONE shutdown hook). For queries that stage a fresh
    * run's state per invocation: they clean their subdirectories at
    * call start instead of leaking a new temp root per call — a
    * long-lived Serve process would otherwise grow disk and the
    * shutdown-hook list linearly with request count. Callers that
    * clean-then-reuse must serialize their own invocations. */
  def reusedScratchDir(prefix: String): String =
    reused.computeIfAbsent(prefix, _ => scratchDir(prefix))
}
