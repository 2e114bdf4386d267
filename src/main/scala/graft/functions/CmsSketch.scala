package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch over a stream of terms as a typed [[Aggregator]] —
  * the custom AGGREGATE member of the extension tier (the brief's
  * custom-op preference list names "a custom Catalyst Expression /
  * TypedColumn (for scalar/agg functions)"; the scalar half is
  * GeohashEncode/TokenOverlap/VectorExprs, this is the aggregate half).
  *
  * Cormode & Muthukrishnan 2005: a Depth×Width counter matrix; each
  * term increments one bucket per row (row-salted hash); the count
  * estimate for a term is the MIN over its Depth cells — always an
  * OVERCOUNT (collisions only add), within εN (ε ≈ e/Width) with
  * probability 1−δ (δ ≈ e^−Depth).
  *
  * Why a sketch aggregate at 100 TB: the buffer is a CONSTANT 4×256
  * longs however large the corpus, partial aggregation merges map-side,
  * and `merge` is an elementwise integer sum — associative AND
  * commutative, so the fold is order-independent across any
  * partitioning (the determinism property this repo's re-aggregated
  * doubles need DECIMAL for comes free with integer counters). One
  * sketch build then amortizes over any number of point lookups —
  * the probe side never rescans the token stream.
  *
  * The bucket hash is md5-based (`md5("r:term")` first 8 hex chars mod
  * Width) rather than a faster murmur/xxhash because the DuckDB oracle
  * must rebuild the IDENTICAL sketch in SQL — md5 is the one hash both
  * engines (and the JVM) expose bit-identically. JVM-side hashing here
  * MUST agree with the SQL `md5(concat(...))` probe expression in
  * [[graft.queries.TextAnalysis.heavyHitters]].
  */
object CmsSketch extends Aggregator[String, Array[Long], Array[Long]] {

  val Depth = 4
  val Width = 256

  // One digest instance per task thread: reduce() runs Depth hashes per
  // token — per-call getInstance would dominate the fold's cost.
  // MessageDigest is stateful, never thread-safe; reset() via digest()
  // makes reuse sound.
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-salted bucket: first 8 md5 hex chars of "r:term", mod Width.
    * Mirrors `('0x' || substr(md5(r || ':' || term), 1, 8))::BIGINT %
    * Width` (DuckDB) and `conv(substring(md5(concat(...)), 1, 8), 16,
    * 10) % Width` (Spark SQL) exactly: the 32-bit prefix is positive,
    * so % needs no pmod mirroring. */
  def bucket(r: Int, term: String): Int = {
    val md = digests.get()
    val bytes = md.digest(s"$r:$term".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex chars = first 4 bytes, big-endian unsigned
    val prefix = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
    (prefix % Width).toInt
  }

  def zero: Array[Long] = new Array[Long](Depth * Width)

  def reduce(b: Array[Long], term: String): Array[Long] = {
    var r = 0
    while (r < Depth) { b(r * Width + bucket(r, term)) += 1; r += 1 }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
