package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization encode kernel (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  * literature; the reference repo has no ANN surface at all, this is
  * north-star scope like the rest of llm/Similarity).
  *
  * The codebook rides the plan as ONE broadcast `CentroidTable`
  * (ids unused; row layout `mIdx * kCodes + c`), the same plan-size /
  * task-serialization discipline as NearestCentroidsExpr: generated
  * code and plan strings are independent of M × kCodes, and the table
  * ships to each executor once via torrent blocks.
  */
object PqUtil {
  /** Per-subspace argmin code for one embedding: for subspace `mIdx`,
    * dist(c) = Σ_j (x[mIdx·subDim+j] − book[mIdx·kCodes+c][j])², summed
    * in ascending j (the same left-to-right double accumulation the
    * DuckDB oracle's list_sum replays), ties to the SMALLER code — the
    * oracle mirrors with ORDER BY dist ASC, c ASC. Input dims beyond
    * the embedding's length read as 0.0f (min-length tolerance in the
    * spirit of NearestCentroidsUtil.topIds; the oracled corpus is
    * always exactly M·subDim wide so this is belt-and-braces, not a
    * semantic the driver artifact depends on).
    */
  def encode(emb: ArrayData, table: CentroidTable, kCodes: Int): ArrayData = {
    val subDim = table.vecs(0).length
    val m = table.k / kCodes
    val embLen = emb.numElements()
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kCodes) {
        val bv = table.vecs(mi * kCodes + c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = if (base + j < embLen) emb.getFloat(base + j).toDouble else 0.0
          val y = bv(j).toDouble
          val diff = x - y
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(mi) = bestC
      mi += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_pq_encode(embedding, vecs, kCodes)` — PQ code assignment:
  * split the embedding into `vecs.length / kCodes` contiguous subspaces
  * of `vecs(0).length` dims each and emit, per subspace, the index of
  * the L2-nearest codebook row (ties to the smaller index). A pure
  * map-side projection — the 100 TB contract is that encoding is a
  * single scan with a broadcast codebook, no join, no shuffle, and the
  * encoded corpus is `M` small ints per vector (64-dim float → 8 bytes
  * at M=8, a 32× scan-size reduction for every downstream ADC query).
  */
case class PqEncodeExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[CentroidTable], kCodes: Int)
    extends UnaryExpression {
  require(kCodes >= 1, s"$prettyName: kCodes must be >= 1, got $kCodes")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> embedding, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def foldable: Boolean = child.foldable

  @transient private lazy val table: CentroidTable = bc.value

  override def nullSafeEval(input: Any): Any =
    PqUtil.encode(input.asInstanceOf[ArrayData], table, kCodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftPqBcast", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val tableCls = classOf[CentroidTable].getName
    val tableName = ctx.addMutableState(tableCls, "graftPqBook",
      v => s"$v = ($tableCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.PqUtil.encode($a, $tableName, $kCodes);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"

  override def toString: String =
    s"$prettyName($child, rows=${bc.value.k}, kCodes=$kCodes)"
}
