package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel shared by the interpreted and codegen paths. */
object TokenOverlapUtil {
  /** Number of query tokens (space-separated, duplicates counted) present
    * in the whitespace-tokenized, lower-trimmed text — identical
    * semantics to the composed
    * `size(filter(qtoks, q => array_contains(split(normalize(text)), q)))`
    * form, minus the per-row array allocation. */
  def score(text: UTF8String, query: UTF8String): Long = {
    // Locale.ROOT: default-locale toLowerCase diverges on tr/az hosts
    // (dotless ı), while Spark's lower() and DuckDB are locale-free.
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    val set = new java.util.HashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) { set.add(toks(i)); i += 1 }
    val qs = query.toString.split(" ")
    var n = 0L
    i = 0
    while (i < qs.length) { if (set.contains(qs(i))) n += 1; i += 1 }
    n
  }
}

/** U3: native `token_overlap(text, query)` scoring expression — the
  * per-field score of the reference's `multi_match best_fields` search
  * (news_app/app/app/src/SearchUI.js:15-33), promoted from composed
  * higher-order functions to a codegen expression per the build plan's
  * preference order (SURVEY §2.12). */
case class TokenOverlap(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // Coerce non-STRING args (e.g. a numeric column searched as text) like
  // builtin string functions, rather than failing analysis.
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def dataType: DataType = LongType
  override def prettyName: String = "token_overlap"

  override protected def nullSafeEval(text: Any, query: Any): Any =
    TokenOverlapUtil.score(text.asInstanceOf[UTF8String], query.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, q) =>
      s"graft.functions.TokenOverlapUtil$$.MODULE$$.score($t, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
