package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the big (skewed) side into `n`
  * sub-keys and explode the small side across all salts, so one hot key
  * spreads over `n` tasks instead of one straggler.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * helper is for the cases AQE can't re-plan (e.g. a skewed key feeding a
  * hash aggregation chain, or pre-AQE-split partitioning you want pinned
  * at plan time). The salt value never leaks into results — it only
  * spreads rows; correctness is row-equivalent to the unsalted join.
  */
object Salting {

  /** Join `big ⋈ small` on `key` with an `n`-way salt on the big side.
    * The big side's salt is an arbitrary per-row spread (its value is
    * irrelevant to the join result); the small side replicates `n`×.
    * Only inner and left_outer are row-equivalent under salting (the
    * replicated small side would duplicate ITS unmatched rows `n`× under
    * right/full outer), so other join types are rejected. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer" || joinType == "left",
      s"saltedJoin supports inner/left_outer only (got $joinType): outer " +
        "variants would emit unmatched small-side rows once per salt")
    val bigS = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(n)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    bigS.join(smallS,
        bigS(key) === smallS(key) && bigS("__salt") === smallS("__salt"),
        joinType)
      .drop(smallS(key)).drop(bigS("__salt")).drop(smallS("__salt"))
  }
}
