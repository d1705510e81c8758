package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH sign bits over an ArrayType(FloatType) embedding:
  * bit b of the result is `sign(dot(v, r_b)) > 0` where hyperplane
  * `r_b[d] ∈ {-1,+1}` comes from the parity of a splitmix64 mix of (b, d)
  * — deterministic, no data-dependent fitting, identical on every
  * executor (Charikar SimHash-for-cosine, STOC'02).
  *
  * One fused pass of nBits×dim multiply-adds in compiled code; the
  * higher-order-function formulation (zip_with + aggregate per bit) walks
  * the array nBits times interpreted and re-derives the hyperplane per
  * element — the same pitfall as the MinHash/SimHash expressions.
  */
object HyperplaneUtil {
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(arr: ArrayData, nBits: Int): Long = {
    val n = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val v = arr.getFloat(d).toDouble
        val h = mix((b.toLong << 32) ^ d.toLong)
        dot += (if ((h & 1L) == 1L) v else -v)
        d += 1
      }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** graft_hyperplane(vec, nBits) → long whose low nBits are the LSH sign
  * bits. nBits must be a positive literal ≤ 64.
  */
case class HyperplaneBitsExpr(child: Expression, nBits: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    HyperplaneUtil.compute(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneUtil$$.MODULE$$.compute($c, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane"
}
