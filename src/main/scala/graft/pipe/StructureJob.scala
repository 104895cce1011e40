package graft.pipe

import graft.layout.{DocStructure, StructureAnalyzer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout/structure analysis as a batch job: structure is a pure
  * function of the media bytes (`analyze_document_structure`,
  * `app.py:845-1007`), so it is computed once per distinct content —
  * same dedup shape as the OCR kernel: rows hash-partition by content
  * sha-256 so every copy of the same bytes lands in one task, and an
  * in-task memo runs the analyzer once per distinct content (the
  * partitioning makes the memo globally decode-once) — and keyed by
  * media_ref. Downstream consumers join it to extracted spans on
  * media_ref; the reference's lazy "analyze on first navigation"
  * (`app.py:1576-1624`) disappears in batch (everything is computed
  * once, up front).
  */
object StructureJob {

  final case class StructureRow(media_ref: String, structure: DocStructure)
  final case class VizRow(media_ref: String, viz_jpeg: Array[Byte])

  /** (ref, bytes, content-hash) hash-partitioned by content so the
    * per-task memo in the kernels below is globally decode-once.
    */
  private def byContent(spark: SparkSession, media: DataFrame) = {
    import spark.implicits._
    media
      .select($"media_ref", $"bytes", sha2($"bytes", 256).as("__h"))
      .repartition(spark.sparkContext.defaultParallelism, $"__h")
      .as[(String, Array[Byte], String)]
  }

  def run(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    byContent(spark, media)
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, DocStructure]
        it.map { case (ref, bytes, h) =>
          val s = memo.getOrElseUpdate(h, StructureAnalyzer.analyze(bytes,
            (roi, w, hh) => graft.ocr.OcrEngine.decodeRoi(roi, w, hh)))
          StructureRow(ref, s)
        }
      }
      .toDF()
  }

  /** L9 visualization as a batch operator: one JPEG per media page with
    * paragraph rectangles + column lines drawn (`app.py:871-960`).
    * Same kernel shape as [[run]]; emit alongside or join on media_ref.
    */
  def visualizations(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    byContent(spark, media)
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[Byte]]
        it.map { case (ref, bytes, h) =>
          val jpeg = memo.getOrElseUpdate(h, {
            val s = StructureAnalyzer.analyze(bytes,
              (roi, w, hh) => graft.ocr.OcrEngine.decodeRoi(roi, w, hh))
            StructureAnalyzer.visualize(bytes, s)
          })
          VizRow(ref, jpeg)
        }
      }
      .toDF()
  }
}
