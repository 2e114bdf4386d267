package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Scalar kernel shared by the interpreted and codegen paths: the
  * Kirsch–Mitzenmacher K-probe over a [[BloomBits]] bitset — identical
  * index math to [[BloomBits.reduce]] (a, b < 2^32 and i < K keep
  * a + i·b < 2^35, so plain `%` is already non-negative). */
object BloomProbeUtil {
  def might(bits: Array[Long], a: Long, b: Long): Boolean = {
    var i = 0
    while (i < BloomBits.K) {
      val idx = ((a + i.toLong * b) % BloomBits.Bits).toInt
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Native Bloom membership probe: "all K bits set" over a bitset held as
  * a CONSTRUCTOR FIELD, not a child literal (r18 optimization).
  *
  * The previous composed form probed a 65,536-element `typedLit` array
  * through K × (pmod + element_at + bitwiseAND) builtins. Two costs that
  * form hides: (1) the 512 KiB array literal participates in every
  * Catalyst canonicalization/semantic-hash walk of the plan — each one
  * O(|array|), repeated across optimizer rules (the composed plan's
  * formatted explain was 10 MB of printed literal); (2) `element_at`
  * reads go through boxed `GenericArrayData` elements per probe. Holding
  * the bitset as an `Array[Long]` field makes tree comparisons reference
  * -equality-cheap and the probe a tight primitive loop; codegen embeds
  * the array once per stage via `addReferenceObj` (it rides the
  * already-broadcast task binary, same as the literal did).
  *
  * Semantics are bit-identical to the composed form: same K, same
  * (a + i·b) mod Bits indices, null in ⇒ null out (nullSafeEval /
  * defineCodeGen's null propagation, matching the builtins' chain).
  *
  * Equality note (ADVICE r18): case-class equality over the
  * `Array[Long]` field is REFERENCE equality, so two probes built from
  * separate array copies never canonicalize equal — a missed (never
  * wrong) exchange/cache reuse. Deliberate: every caller builds ONE
  * probe per query from one collected bitset, so content-equal distinct
  * arrays don't arise; content-based equals/hashCode would pay an
  * O(|bits|) walk in exactly the tree-compare hot path this expression
  * exists to remove.
  */
case class BloomMightContain(bits: Array[Long], left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BloomProbeUtil.might(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BloomProbeUtil$$.MODULE$$.might($ref, $a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
