package graft.pipe

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: 10-bin histogram of confidences in [0,100] — the
  * per-partition OCR-confidence histogram the manifest table carries
  * (lineage/metrics per north_star). Values land in bin
  * min(floor(c/10), 9); out-of-range values are ignored.
  */
object ConfHistogram extends Aggregator[Double, Array[Long], Seq[Long]] {
  override def zero: Array[Long] = new Array[Long](10)

  override def reduce(b: Array[Long], c: Double): Array[Long] = {
    if (c >= 0.0 && c <= 100.0) {
      val bin = math.min((c / 10.0).toInt, 9)
      b(bin) += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 10) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
