package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fixed centroid table (ids + vectors), shared by eval and codegen as a
  * single plan reference object. One instance per expression, however
  * many centroids it holds — the alternative (a `greatest` /
  * `sort_array` over per-centroid `struct(cosine(emb, lit_vec), id)`
  * candidates) grows the plan and the generated Java linearly with the
  * centroid count, which both caps the table at ~100 entries and charges
  * every cold run seconds of Janino compile time.
  */
final class CentroidTable(val ids: Array[Long], val vecs: Array[Array[Float]])
    extends Serializable {
  require(ids.length == vecs.length && ids.nonEmpty,
    s"centroid table needs matching non-empty ids/vecs, got ${ids.length}/${vecs.length}")
  require(vecs.forall(_ != null), "centroid table must not contain null vectors")
  def k: Int = ids.length
}

object NearestCentroidsUtil {
  /** Spark SQL's double ordering (nanSafeCompareDoubles): NaN compares
    * greater than anything and equal to itself; otherwise IEEE `>`. The
    * previous greatest-of-structs formulation compared sims exactly this
    * way, so ranking is bit-compatible with it.
    */
  private def cmpDouble(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1 else -1
  }

  /** True iff candidate (simA, idA) ranks strictly before (simB, idB):
    * higher sim first, ties to the LARGER centroid id — the ordering of
    * `greatest(struct(sim, c_id))` and, for non-NaN sims, of
    * `sort_array(struct(-sim, -c_id))`, which the DuckDB oracles mirror
    * with ORDER BY sim DESC, c_id DESC. (A NaN sim — zero-norm vector,
    * documented undefined behavior upstream — ranks FIRST here as in
    * `greatest`, whereas the negated-sort formulation ranked it last:
    * negation does not invert NaN's position.)
    */
  private def before(simA: Double, idA: Long, simB: Double, idB: Long): Boolean = {
    val c = cmpDouble(simA, simB)
    c > 0 || (c == 0 && idA > idB)
  }

  /** Top-`n` centroid ids for one embedding, best first. Cosine per
    * centroid is the same fused double-accumulation loop as
    * CosineSimilarityExpr (min-length prefix, prefix norms), so replacing
    * the per-centroid expression candidates with this kernel changes no
    * hash-verified result. O(k·n) insertion ranking — n is 1 (assignment)
    * or nProbe (probing), never large.
    */
  def topIds(emb: ArrayData, table: CentroidTable, n: Int): ArrayData = {
    val k = table.k
    val m = math.min(n, k)
    val topSim = new Array[Double](m)
    val topId = new Array[Long](m)
    var filled = 0
    val embLen = emb.numElements()
    var j = 0
    while (j < k) {
      val cv = table.vecs(j)
      val len = math.min(embLen, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < len) {
        val xi = emb.getFloat(i).toDouble
        val yi = cv(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      val id = table.ids(j)
      // insertion position among the kept candidates (best → worst)
      var pos = filled
      while (pos > 0 && before(sim, id, topSim(pos - 1), topId(pos - 1))) pos -= 1
      if (pos < m) {
        var q = math.min(filled, m - 1)
        while (q > pos) {
          topSim(q) = topSim(q - 1); topId(q) = topId(q - 1)
          q -= 1
        }
        topSim(pos) = sim; topId(pos) = id
        if (filled < m) filled += 1
      }
      j += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) { out(r) = topId(r); r += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_nearest_centroids(embedding, ids, vecs, n)` — the top-`n`
  * nearest centroid ids (cosine, descending; ties to larger id) of an
  * array<float> embedding against a broadcast centroid table.
  *
  * This is the zero-shuffle argmax under IVF assignment (`n = 1`) and
  * multi-probe selection (`n = nProbe`): a pure map-side projection, no
  * join, no shuffle. The registry builder evaluates the literal ids/vecs
  * arguments ONCE at analysis time, ships the table as a Spark broadcast
  * variable, and the expression carries only the broadcast handle — so
  * the table is serialized once per executor (torrent blocks), NOT once
  * per task. At the autoCentroids 2²⁰ cap (2²⁰ × 64 floats ≈ 256 MB) a
  * task-serialized reference object would re-ship that with every task
  * batch; the broadcast makes the cap actually usable. Plan strings and
  * generated code stay size-independent as before.
  */
case class NearestCentroidsExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[CentroidTable], n: Int)
    extends UnaryExpression {
  require(n >= 1, s"$prettyName: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> embedding, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def foldable: Boolean = child.foldable

  @transient private lazy val table: CentroidTable = bc.value

  override def nullSafeEval(input: Any): Any =
    NearestCentroidsUtil.topIds(input.asInstanceOf[ArrayData], table, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftCentroidBcast", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val tableCls = classOf[CentroidTable].getName
    // resolve the broadcast once per codegen instance, not per row
    val tableName = ctx.addMutableState(tableCls, "graftCentroidTable",
      v => s"$v = ($tableCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.NearestCentroidsUtil.topIds($a, $tableName, $n);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nearest_centroids"

  // the default Expression.toString flattens constructor args — elide
  // the table to its dimensions so plan STRINGS stay size-independent
  // too, not just the generated code (k read driver-side: bc.value on
  // the driver returns the local reference, no fetch)
  override def toString: String =
    s"$prettyName($child, k=${bc.value.k}, n=$n)"
}
