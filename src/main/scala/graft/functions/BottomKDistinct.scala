package graft.functions

import scala.collection.immutable.TreeSet

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k distinct values (the KMV / k-minimum-values sketch state,
  * Bar-Yossef et al. 2002): keeps the k smallest DISTINCT strings seen.
  * Feeding it uniform hashes (md5 hex) makes the k-th smallest value a
  * distinct-count estimator: D ≈ (k-1)/U(k) with U(k) the k-th value
  * normalized to [0,1).
  *
  * This is the scale-correct shape for approximate distinct counts under
  * a PORTABLE hash: the buffer is O(k) per group, reduce rejects
  * anything ≥ the current k-th in O(1) after the buffer fills (the
  * common case on a big corpus), and merge is associative — so the
  * aggregation stays map-side combinable and nothing corpus-sized is
  * sorted or shuffled, unlike a rank-over-window formulation. Spark's
  * own approx_count_distinct (HLL) keeps the engine-native role; this
  * twin exists because its estimate is bit-reproducible in any engine
  * with md5 + sorting, which is what makes the DuckDB hash oracle
  * possible (same trick as the md5 MinHash family).
  */
class BottomKDistinct(k: Int)
    extends Aggregator[String, TreeSet[String], Seq[String]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: TreeSet[String] = TreeSet.empty[String]

  override def reduce(b: TreeSet[String], v: String): TreeSet[String] =
    if (v == null || (b.size >= k && v >= b.last)) b
    else {
      val nb = b + v
      if (nb.size > k) nb - nb.last else nb
    }

  override def merge(a: TreeSet[String], b: TreeSet[String]): TreeSet[String] = {
    val m = a ++ b
    if (m.size <= k) m else m.take(k)
  }

  override def finish(b: TreeSet[String]): Seq[String] = b.toSeq

  override def bufferEncoder: Encoder[TreeSet[String]] =
    Encoders.kryo[TreeSet[String]]

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
