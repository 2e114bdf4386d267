package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration of graft's native expressions.
  *
  * Two paths:
  *  - [[GraftExtensions]] — the production path: set
  *    `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *    `builder.withExtensions`) and the functions exist in every session
  *    derived from that config.
  *  - [[GraftFunctions.register]] — imperative, idempotent registration
  *    into an already-running session (used by the query catalog so the
  *    harness works regardless of who built the session).
  */
object GraftFunctions {

  /** geohash_encode(lat, lon[, precision]) — precision must be a literal. */
  private def geohashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(lat, lon) => GeohashEncode(lat, lon, 6)
    case Seq(lat, lon, Literal(p: Int, _)) => GeohashEncode(lat, lon, p)
    case _ => throw new IllegalArgumentException(
      "geohash_encode(lat, lon[, precision-literal])")
  }

  private def tokenOverlapBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text, query) => TokenOverlap(text, query)
    case _ => throw new IllegalArgumentException("token_overlap(text, query)")
  }

  private def binary(mk: (Expression, Expression) => Expression, name: String)(
      args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => mk(a, b)
    case _ => throw new IllegalArgumentException(s"$name(a, b)")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("geohash_encode"),
      new ExpressionInfo(classOf[GeohashEncode].getName, "geohash_encode"),
      geohashBuilder _),
    (FunctionIdentifier("token_overlap"),
      new ExpressionInfo(classOf[TokenOverlap].getName, "token_overlap"),
      tokenOverlapBuilder _),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      binary(DotProduct.apply, "dot_product") _),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      binary(CosineSim.apply, "cosine_sim") _))

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (ident, _, builder) =>
      registry.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions` entry point: native functions plus the custom
  * plan layer (as-of join rule + strategy). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinPruning)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
