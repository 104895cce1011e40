package graft.pipe

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One manifest row's metrics (per commit bucket). Top-level case class
  * so the Dataset encoder stays codegen-friendly.
  */
final case class BucketStat(bucket: Int, doc_count: Long, span_count: Long,
                            media_count: Long, conf_histogram: Seq[Long])

/** Per-bucket manifest metrics computed in ONE pass over the output —
  * attached to the write job via `Dataset.observe` (CollectMetrics), so
  * the committed-partition manifest (north_star: "per-partition lineage
  * ... span counts, OCR confidence histograms") costs zero extra scans
  * of either the input or the just-written output. The buffer is a flat
  * Array[Long] (STRIDE slots per bucket): one bounds-checked add per
  * row, trivially mergeable, and its encoder is a primitive array.
  *
  * Retry semantics: CollectMetrics aggregates through Spark's
  * AggregatingAccumulator, which only applies updates from successful
  * task attempts of the write job — counts cannot double under task
  * retry or speculation (unlike a hand-rolled AccumulatorV2 in a
  * transformation).
  */
final class BucketManifestAgg(nBuckets: Int)
    extends Aggregator[BucketObs, Array[Long], Seq[BucketStat]] {

  private val STRIDE = 13 // docs, spans, media, 10 confidence bins

  override def zero: Array[Long] = new Array[Long](nBuckets * STRIDE)

  override def reduce(b: Array[Long], in: BucketObs): Array[Long] = {
    val o = in.bucket * STRIDE
    b(o) += 1L
    b(o + 1) += in.span_count
    b(o + 2) += in.media_count
    val c = in.confidence
    if (c >= 0.0 && c <= 100.0) b(o + 3 + math.min((c / 10.0).toInt, 9)) += 1L
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[BucketStat] =
    (0 until nBuckets).filter(i => r(i * STRIDE) > 0).map { i =>
      val o = i * STRIDE
      BucketStat(i, r(o), r(o + 1), r(o + 2),
        (0 until 10).map(j => r(o + 3 + j)))
    }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[BucketStat]] = ExpressionEncoder[Seq[BucketStat]]()
}

/** Observed per-row shape feeding [[BucketManifestAgg]]. */
final case class BucketObs(bucket: Int, span_count: Int, media_count: Int, confidence: Double)
