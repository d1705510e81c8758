package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused 64-bit SimHash over a token array: one pass, distinct-token
  * semantics, per-bit vote counters in a local array. The higher-order-
  * function formulation needed 64 interpreted aggregate passes, each
  * re-hashing every token — this is the same pitfall (and same fix) as
  * MinHashTextExpr.
  */
object SimHashUtil {
  /** Per-token 64-bit hash = the first 8 md5 bytes, big-endian — i.e.
    * the value of the first 16 hex chars of the standard md5 string.
    * Chosen over xxhash64/FNV for ENGINE PORTABILITY: any SQL engine
    * with an md5() function reproduces it (the DuckDB oracle parses
    * those 16 hex digits positionally), which is what lets the simhash
    * queries carry hash-checked oracles instead of rows-only entries.
    */
  def tokenHash(bytes: Array[Byte]): Long = {
    val d = DigestUtil.md5.get()
    d.reset()
    DigestUtil.beLong(d.digest(bytes), 0)
  }

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[String](math.max(16, n * 2))
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      if (s != null && seen.add(s.toString)) {
        val h = tokenHash(s.getBytes)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    MinHashUtil.requireStringArray(child, prettyName)
  override def dataType: DataType = LongType
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashUtil$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}
