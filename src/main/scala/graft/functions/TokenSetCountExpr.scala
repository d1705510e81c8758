package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements that belong to a fixed string set —
  * `graft_count_in_set(tokens, array('the','a',...))` — the kernel under
  * stopword ratios and marker-based language scoring.
  *
  * The higher-order-function formulation
  * `size(filter(toks, t => t.isin(markers)))` evaluates the lambda
  * INTERPRETED per element with a linear scan over the marker literals
  * (the same pitfall the MinHash/SimHash expressions fixed); this is one
  * compiled pass with a hash-set probe per token. Occurrence semantics
  * (duplicates counted), null elements ignored — identical to the HOF
  * formulation, asserted by FunctionsSpec.
  */
object TokenSetCountUtil {
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null && set.contains(s)) c += 1
      i += 1
    }
    c
  }

  def buildSet(tokens: Seq[String]): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String](tokens.size * 2)
    tokens.foreach(t => set.add(UTF8String.fromString(t)))
    set
  }
}

case class TokenSetCountExpr(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    MinHashUtil.requireStringArray(child, prettyName)

  override def dataType: DataType = IntegerType

  override def foldable: Boolean = child.foldable

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    TokenSetCountUtil.buildSet(tokens)

  override def nullSafeEval(input: Any): Any =
    TokenSetCountUtil.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftTokenSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetCountUtil$$.MODULE$$.count($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_count_in_set"
}
