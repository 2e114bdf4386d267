package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geohash base32 encoding, standard interval-halving algorithm.
  *
  * Kept as a plain object so both the interpreted `eval` path and the
  * generated Java source (whole-stage codegen) call the same scalar
  * kernel. */
object GeohashUtil {
  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toCharArray

  def encode(lat: Double, lon: Double, precision: Int): UTF8String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val out = new Array[Char](precision)
    var even = true // geohash starts with a longitude bit
    var bit = 0; var ch = 0; var i = 0
    while (i < precision) {
      var b = 0
      while (b < 5) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
          else { ch = ch << 1; lonHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
          else { ch = ch << 1; latHi = mid }
        }
        even = !even
        b += 1
        bit += 1
      }
      out(i) = Alphabet(ch)
      ch = 0
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Native Catalyst expression `geohash_encode(lat, lon)` with fixed
  * precision — the U2/A2 geo-cell primitive (reference: `location` is an
  * ES geo_point rendered as Kibana map tiles, flow/scripts/mapping.py:12,
  * README.md:22-28).
  *
  * `doGenCode` emits a direct static call, so the expression stays inside
  * whole-stage codegen (no UDF serialization, no InternalRow boxing) —
  * the preference order the build plan mandates: native Expression over
  * Scala UDF. */
case class GeohashEncode(left: Expression, right: Expression, precision: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes (vs a bare checkInputDataTypes) lets Catalyst
  // coerce float/int/decimal lat-lon args like builtin functions do,
  // instead of failing analysis on a non-DOUBLE input.
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  override def dataType: DataType = StringType
  override def prettyName: String = "geohash_encode"

  override protected def nullSafeEval(lat: Any, lon: Any): Any =
    GeohashUtil.encode(lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon) =>
      s"graft.functions.GeohashUtil$$.MODULE$$.encode($lat, $lon, $precision)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
