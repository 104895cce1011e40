package graft.pipe

import graft.layout.{DocStructure, StructureAnalyzer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout/structure analysis as a batch job: structure is a pure
  * function of the media bytes (`analyze_document_structure`,
  * `app.py:845-1007`), so it is computed once per distinct content —
  * same dedup shape as the OCR kernel — and keyed by media_ref.
  * Downstream consumers join it to extracted spans on media_ref; the
  * reference's lazy "analyze on first navigation" (`app.py:1576-1624`)
  * disappears in batch (everything is computed once, up front).
  */
object StructureJob {

  final case class StructureRow(media_ref: String, structure: DocStructure)
  final case class VizRow(media_ref: String, viz_jpeg: Array[Byte])

  def run(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select($"media_ref", $"bytes")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (ref, bytes) =>
          val s = StructureAnalyzer.analyze(bytes,
            (roi, w, h) => graft.ocr.OcrEngine.decodeRoi(roi, w, h))
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
    media
      .select($"media_ref", $"bytes")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (ref, bytes) =>
          val s = StructureAnalyzer.analyze(bytes,
            (roi, w, h) => graft.ocr.OcrEngine.decodeRoi(roi, w, h))
          VizRow(ref, StructureAnalyzer.visualize(bytes, s))
        }
      }
      .toDF()
  }
}
