package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector mean as a typed Aggregator — the user-facing
  * typed-UDAF surface (SURVEY §4.3: the custom typed-aggregate
  * candidate). Buffer = (running sum vector, count); merge is
  * element-wise — associative and partial-aggregation-friendly, so Spark
  * computes map-side partials and one shuffle of DIM-sized buffers per
  * group, never the raw vectors. The standard shape for per-cluster
  * centroids over a 100 TB embedding corpus. */
object VectorAvg extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  // Ragged dimensions are a data bug, not a truncation case: fail loudly
  // (same policy as DotProduct) rather than silently produce a centroid
  // computed over a prefix of each vector.
  private def requireSameDim(a: Int, b: Int): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"vector_avg: dimension mismatch ($a vs $b)")

  // The zero-state sentinel is the COUNT, not sum.isEmpty — an empty or
  // null input vector must neither reset the accumulator nor count.
  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    if (v == null || v.isEmpty) b
    else if (n == 0L) (v.toArray, 1L)
    else {
      requireSameDim(sum.length, v.length)
      var i = 0
      while (i < sum.length) { sum(i) += v(i); i += 1 }
      (sum, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      requireSameDim(a._1.length, b._1.length)
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.product[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
