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
}
