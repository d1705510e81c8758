package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the Aggregator[IN,BUF,OUT] extension surface,
  * SURVEY §2.11): element-wise mean of float vectors — the centroid
  * update step of k-means. Buffer is a mutable double[] + count, merged
  * associatively, so the aggregation is partial/map-side combinable like
  * any built-in (no row shuffling beyond the final per-key merge).
  */
class CentroidMean(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float])
      : (Array[Double], Long) = {
    val acc = b._1
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long))
      : (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(b: (Array[Double], Long)): Seq[Float] = {
    val n = math.max(b._2, 1L).toDouble
    b._1.map(x => (x / n).toFloat).toSeq
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.kryo[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}
