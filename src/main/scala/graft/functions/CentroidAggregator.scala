package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.2's one custom UDAF: element-wise mean of Array[Float]
  * embeddings, as a typed Aggregator — the building block for k-means
  * style centroid refinement over an IVF codebook.
  *
  * The buffer is (sum vector, count): merges are associative and
  * commutative, so Spark runs it with map-side partial aggregation —
  * each partition reduces to ONE (dim-width sum, count) pair before the
  * shuffle, the same partial-agg discipline as the built-in aggregates.
  */
object CentroidAggregator
  extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) return b
    val sum = if (b._1.isEmpty) new Array[Double](a.length) else b._1
    val n = math.min(sum.length, a.length)
    var i = 0
    while (i < n) { sum(i) += a(i); i += 1 }
    (sum, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val n = math.min(x._1.length, y._1.length)
    var i = 0
    while (i < n) { x._1(i) += y._1(i); i += 1 }
    (x._1, x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Float] =
    if (r._2 == 0L) null
    else r._1.map(s => (s / r._2).toFloat)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Float]] =
    ExpressionEncoder[Array[Float]]()
}
