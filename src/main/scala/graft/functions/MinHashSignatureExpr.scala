package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over an array<string> of shingles.
  *
  * Instead of k independent hash passes (k full traversals, k×n hash
  * computations), each shingle is hashed twice and the k hash-family
  * values are derived as h_i = h1 + i·h2 — the Kirsch–Mitzenmacher
  * double-hashing construction, standard for Bloom/MinHash families.
  * Cost per shingle: 2 hashes + k adds, ~k/2× less hashing than the
  * naive family; one traversal instead of k.
  */
object MinHashUtil {
  /** Shared analysis-time input check: the token/shingle argument must be
    * array<string> (getUTF8String over anything else reads garbage).
    */
  def requireStringArray(child: Expression, fn: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires an array<string> argument, got ${other.sql}")
    }

  /** (h1, h2) hash pair of one shingle: the two 8-byte halves of its
    * md5, big-endian, h2 forced odd. Engine-portable by construction —
    * a SQL oracle reproduces both halves by parsing the md5 hex string
    * positionally (hex chars 1–16 and 17–32), which is what lets the
    * minhash family carry hash-checked oracles. The k-family values
    * h_i = h1 + i·h2 wrap mod 2^64 and compare as SIGNED longs (the
    * oracle mirrors with an unsigned-to-signed CASE before min()).
    */
  @inline private def pairFromDigest(d: Array[Byte]): (Long, Long) =
    (DigestUtil.beLong(d, 0), DigestUtil.beLong(d, 8) | 1L)

  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    val d = DigestUtil.md5.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        d.reset()
        val (h1, h2) = pairFromDigest(d.digest(s.getBytes))
        var j = 0
        var h = h1
        while (j < k) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    mins
  }

  /** Fused tokens→w-gram-shingles→MinHash: one pass over the token
    * array, no intermediate shingle strings or arrays. The shingle
    * digest for window [i, i+w) streams the tokens' utf8 bytes with a
    * space separator — identical to `md5(concat_ws(" ", ...))`, so it
    * IS a MinHash over the same shingle set the verifier materializes.
    * Duplicate windows re-hash but cannot change any minimum, so the
    * signature equals one over the DISTINCT shingle set (what the SQL
    * oracle computes). Returns null-marker (length 0) when fewer than
    * w tokens.
    */
  def computeText(toks: ArrayData, w: Int, k: Int): Array[Long] = {
    val n = toks.numElements()
    if (n < w) return Array.emptyLongArray
    // pre-fetch byte arrays once
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      tokBytes(i) = if (s == null) Array.emptyByteArray else s.getBytes
      i += 1
    }
    val space = Array(' '.toByte)
    val mins = Array.fill(k)(Long.MaxValue)
    val d = DigestUtil.md5.get()
    i = 0
    while (i <= n - w) {
      d.reset()
      var j = 0
      while (j < w) {
        if (j > 0) d.update(space)
        d.update(tokBytes(i + j))
        j += 1
      }
      val (h1, h2) = pairFromDigest(d.digest())
      var s = h1
      j = 0
      while (j < k) {
        if (s < mins(j)) mins(j) = s
        s += h2
        j += 1
      }
      i += 1
    }
    mins
  }
}

/** Fused minhash-over-text expression: graft_minhash_text(tokens, w, k)
  * → array<long> signature; null when the doc has fewer than w tokens.
  */
case class MinHashTextExpr(child: Expression, w: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    MinHashUtil.requireStringArray(child, prettyName)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any = {
    val r = MinHashUtil.computeText(input.asInstanceOf[ArrayData], w, k)
    if (r.isEmpty) null else new GenericArrayData(r)
  }

  // nullSafeCodeGen can't express "computed null" cleanly; the eval path
  // is a single static call per row either way, so interpreter overhead
  // is negligible — but we still emit codegen with an explicit null check.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""long[] graftMins = graft.functions.MinHashUtil$$.MODULE$$.computeText($c, $w, $k);
         |if (graftMins.length == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftMins);
         |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_text"
}

/** Catalyst expression wrapper: minhash_signature(shingles) → array<long>
  * of length k. Codegen emits a single static call — the loop stays in
  * compiled JVM code either way.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    MinHashUtil.requireStringArray(child, prettyName)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashUtil.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashUtil$$.MODULE$$.compute($c, $k));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_signature"
}
