package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Scalar kernels shared by the interpreted and generated paths.
  *
  * Both fold strictly left-to-right with one accumulator per dot
  * product, so results are BIT-IDENTICAL to the composed
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form they replace (same
  * operation sequence per accumulator) — the unchanged DuckDB oracles
  * prove the swap. Null element, length mismatch → null, exactly like
  * zip_with's null padding propagating through the sum. */
object VectorExprUtil {

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Fused cosine: ONE pass over both arrays accumulating a·b, a·a, b·b
    * — versus three zip_with array materializations per row in the
    * composed form. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}

private[functions] trait VectorBinaryExpr extends BinaryExpression with ImplicitCastInputTypes {
  // array<float> embeddings coerce to array<double> via a standard Cast
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Kernel name on [[VectorExprUtil]]'s Java facade. */
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.functions.VectorExprUtil$$.MODULE$$.$kernel($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })
}

/** Native `dot_product(a, b)` — the embedding-bucket primitive (LSH sign
  * bits), promoted from `aggregate(zip_with(...))` per the build plan's
  * preference order (SURVEY §2.12). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "dot_product"
  override protected def kernel: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native `cosine_sim(a, b)` — the similarity-search scoring kernel. */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "cosine_sim"
  override protected def kernel: String = "cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
