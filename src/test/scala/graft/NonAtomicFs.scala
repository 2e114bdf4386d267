package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local filesystem whose `rename` is deliberately NON-atomic:
  * copy-then-delete with a widened visibility window (destination
  * appears entry-by-entry while the source still exists), the way an
  * S3-class object store "renames". Registered under the `nonatomic://`
  * scheme (`fs.nonatomic.impl`), it lets a spec prove a commit
  * protocol's reader-consistency does NOT depend on rename atomicity —
  * anything that does (the old staged-swap design) visibly tears here.
  *
  * Every other operation (create, list, delete, open) is the stock
  * local implementation, so Spark's parquet writer/committer runs
  * unmodified over it.
  */
class NonAtomicFs extends RawLocalFileSystem {

  override def getScheme: String = "nonatomic"

  override def getUri: URI = URI.create("nonatomic:///")

  override def rename(src: Path, dst: Path): Boolean = {
    NonAtomicFs.renames.incrementAndGet()
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      listStatus(src).foreach { child =>
        rename(child.getPath, new Path(dst, child.getPath.getName)): Unit
        // widen the torn window: dst is partially populated, src still
        // (partially) present — a reader depending on rename atomicity
        // observes the mix
        Thread.sleep(2)
      }
      delete(src, true)
    } else {
      val in = open(src)
      val out = create(dst, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, true)
      finally { in.close(); out.close() }
      delete(src, false)
    }
  }
}

object NonAtomicFs {
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}
