package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shared Bloom-filter hashing: k bit positions per key via
  * Kirsch–Mitzenmacher double hashing (h1 + i·h2 over two xxhash64
  * seeds). The BUILD side (aggregator, JVM String bytes) and the PROBE
  * side (expression, UTF8String bytes) hash the identical UTF-8 byte
  * sequence, so membership is exact across the two representations.
  */
object BloomHash {
  private val Seed1 = 0x9747b28cL
  private val Seed2 = 0x5bd1e995L

  /** Set/test positions for a key; `mask` = numBits − 1 (power of two). */
  def h1(base: AnyRef, offset: Long, len: Int): Long =
    XXH64.hashUnsafeBytes(base, offset, len, Seed1)
  def h2(base: AnyRef, offset: Long, len: Int): Long =
    XXH64.hashUnsafeBytes(base, offset, len, Seed2)

  def setBits(words: Array[Long], base: AnyRef, offset: Long, len: Int,
      numHashes: Int): Unit = {
    val mask = words.length * 64L - 1
    val a = h1(base, offset, len); val b = h2(base, offset, len)
    var i = 0
    while (i < numHashes) {
      val idx = (a + i * b) & mask
      words((idx >>> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
  }

  def testBits(words: Array[Long], base: AnyRef, offset: Long, len: Int,
      numHashes: Int): Boolean = {
    val mask = words.length * 64L - 1
    val a = h1(base, offset, len); val b = h2(base, offset, len)
    var i = 0
    while (i < numHashes) {
      val idx = (a + i * b) & mask
      if ((words((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Immutable probe-side view of a built filter — ONE plan reference
  * object shared by all rows (the CentroidTable pattern), so a
  * multi-megabyte filter costs the plan nothing per row and nothing in
  * plan strings.
  */
final class BloomBits(val words: Array[Long], val numHashes: Int)
    extends Serializable {
  require(words.nonEmpty && java.lang.Long.bitCount(words.length.toLong * 64) == 1,
    s"bloom size must be a power-of-two bit count, got ${words.length} words")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  def contains(s: UTF8String): Boolean =
    BloomHash.testBits(words, s.getBaseObject, s.getBaseOffset,
      s.numBytes(), numHashes)
}

/** Typed aggregator building the filter over RAW key bytes (feed it
  * `col.cast("binary")`, which for strings is a raw copy of the UTF-8
  * bytes — NOT a decode): buffer = the bit words, reduce = set k bits,
  * merge = bitwise OR — fully map-side combinable, so the build is one
  * pass + one O(filter-size) merge tree, never a shuffle of the keys.
  *
  * Raw bytes matter for the exactness contract: the probe side hashes
  * UTF8String storage in place, and a build over decoded JVM Strings
  * would round-trip malformed UTF-8 through U+FFFD replacement and hash
  * DIFFERENT bytes — a false negative the verify join cannot repair.
  * (Also why this is not `df.stat.bloomFilter`: the built-in probe
  * allocates a byte[] copy per row and hashes through the String
  * detour; this probe is zero-copy on the column's storage.)
  */
class BloomBuild(numWords: Int, numHashes: Int)
    extends Aggregator[Array[Byte], Array[Long], Array[Long]] {
  require(numWords >= 1 && java.lang.Long.bitCount(numWords.toLong * 64) == 1,
    s"numWords must make a power-of-two bit count, got $numWords")

  override def zero: Array[Long] = new Array[Long](numWords)

  override def reduce(b: Array[Long], key: Array[Byte]): Array[Long] = {
    BloomHash.setBits(b, key, Platform.BYTE_ARRAY_OFFSET, key.length,
      numHashes)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** `graft_bloom_contains(str, words, k)` — probable-membership probe of a
  * string column against a built Bloom filter (no false negatives; false
  * positives at the filter's design rate). The pre-filter half of
  * bloom-accelerated joins: probe map-side, verify only the survivors.
  */
case class BloomContainsExpr(child: Expression, bloom: BloomBits)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = BooleanType

  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    bloom.contains(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomBits", bloom,
      classOf[BloomBits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.contains($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_contains"

  // elide the filter contents from plan strings (see NearestCentroidsExpr)
  override def toString: String =
    s"$prettyName($child, bits=${bloom.words.length * 64}, k=${bloom.numHashes})"
}
