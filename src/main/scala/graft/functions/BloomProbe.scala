package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Probe-side companion of [[BloomBits]]: rebuilds the aggregator's
  * Kirsch–Mitzenmacher bit positions with BUILTIN column arithmetic
  * (pmod + element_at + bitwiseAND against a power-of-two literal
  * array), so a Bloom probe over a broadcast/literal bitset stays
  * entirely inside whole-stage codegen — no UDF on the hot path.
  * Factored out of the inline form [[graft.queries.LlmDedup.bloomDedup]]
  * pioneered so join prefilters and specs share one definition. */
object BloomProbe {

  /** Unsigned 32-bit halves (a, b) of xxhash64 over the key column(s) —
    * the (Long, Long) input contract of [[BloomBits]]. */
  def halves(key: Column*): (Column, Column) =
    (shiftrightunsigned(xxhash64(key: _*), 32),
      xxhash64(key: _*).bitwiseAND(lit(0xffffffffL)))

  /** True iff all K probed bits are set in `bloom` (a literal/broadcast
    * Seq[Long] column of [[BloomBits.Bits]]/64 words): "maybe present".
    * False is DEFINITE absence — the no-false-negative direction a
    * prefilter relies on. */
  def might(bloom: Column, a: Column, b: Column): Column = {
    // 1L << (idx & 63) as a 64-entry literal array: shiftleft's bit
    // count is not a Column, so the shift becomes a lookup
    val powBit = array((0 until 64).map(j => lit(1L << j)): _*)
    (0 until BloomBits.K).map { i =>
      val idx = pmod(a + lit(i.toLong) * b, lit(BloomBits.Bits.toLong))
      val word = element_at(bloom, (idx / 64).cast("int") + 1)
      word.bitwiseAND(element_at(powBit, pmod(idx, lit(64L)).cast("int") + 1)) =!= 0L
    }.reduce(_ && _)
  }
}
