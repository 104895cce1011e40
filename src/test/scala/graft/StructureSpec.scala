package graft

import graft.codec.SynthRaster
import graft.gen.Corpus
import graft.layout.StructureAnalyzer
import graft.ocr.OcrEngine
import org.scalatest.funsuite.AnyFunSuite

class StructureSpec extends AnyFunSuite {

  private val roi = (g: Array[Int], w: Int, h: Int) => OcrEngine.decodeRoi(g, w, h)

  /** Hand-built gray page: dark rectangles on light paper. */
  private def page(w: Int, h: Int, rects: Seq[(Int, Int, Int, Int)]): Array[Int] = {
    val px = Array.fill(w * h)(230)
    rects.foreach { case (x, y, rw, rh) =>
      for (yy <- y until y + rh; xx <- x until x + rw) px(yy * w + xx) = 20
    }
    px
  }

  test("region filter drops tiny, huge, and extreme-aspect components (app.py:868-883)") {
    val w = 100; val h = 100
    // tiny: 3x3=9 < 0.1% of 10000 = 10; huge: 90x90 = 8100 > 80% = 8000;
    // extreme aspect: 60x2 -> w/h = 30 > 10
    val px = page(w, h, Seq((1, 1, 3, 3), (5, 8, 90, 90), (2, 5, 60, 2)))
    val s = StructureAnalyzer.analyzeGray(px, w, h, (_, _, _) => "text.")
    assert(s.total_paragraphs == 0)
  }

  test("passing region becomes a paragraph with bounds and sentences") {
    val w = 100; val h = 100
    val px = page(w, h, Seq((10, 20, 5, 7)))
    val s = StructureAnalyzer.analyzeGray(px, w, h, (_, _, _) => "One two. Three!")
    assert(s.total_paragraphs == 1)
    val p = s.paragraphs.head
    assert((p.bounds.x, p.bounds.y, p.bounds.width, p.bounds.height) == (10, 20, 5, 7))
    assert(p.sentences.map(_.text) == Seq("One two.", "Three!"))
    assert(p.sentences.map(_.id) == Seq(0, 1))
    assert(s.columns == Seq(graft.layout.ColumnGroup(0, Seq(0))))
  }

  test("empty ROI text drops the region (app.py:893)") {
    val w = 100; val h = 100
    val px = page(w, h, Seq((10, 20, 5, 7)))
    val s = StructureAnalyzer.analyzeGray(px, w, h, (_, _, _) => "  ")
    assert(s.total_paragraphs == 0)
  }

  test("column split at x-gap > 10% of width; nearest-boundary assignment (app.py:916-944)") {
    val w = 200; val h = 60
    // two clusters: x=10,14 and x=120,126 — gap 106 > 20 = 10% of 200
    val px = page(w, h, Seq((10, 10, 5, 6), (14, 30, 5, 6), (120, 10, 5, 6), (126, 30, 5, 6)))
    val s = StructureAnalyzer.analyzeGray(px, w, h, (_, _, _) => "p.")
    assert(s.total_paragraphs == 4)
    assert(s.total_columns == 2)
    val byCol = s.paragraphs.groupBy(_.column).view.mapValues(_.map(_.bounds.x).sorted).toMap
    assert(byCol(0) == Seq(10, 14))
    assert(byCol(1) == Seq(120, 126))
    assert(s.columns.map(_.paragraphs.size) == Seq(2, 2))
  }

  test("suggested actions follow the count rules (app.py:981-1007)") {
    val w = 200; val h = 60
    val px = page(w, h, Seq((10, 10, 5, 6), (14, 30, 5, 6), (120, 10, 5, 6), (126, 30, 5, 6)))
    val s = StructureAnalyzer.analyzeGray(px, w, h,
      (_, _, _) => "One. Two. Three. Four. Five. Six.")
    val types = s.suggested_actions.map(_.`type`)
    assert(types == Seq("read_by_paragraph", "read_by_column", "summarize", "read_full"))

    val single = StructureAnalyzer.analyzeGray(page(100, 100, Seq((10, 20, 5, 7))), 100, 100,
      (_, _, _) => "One.")
    assert(single.suggested_actions.map(_.`type`) == Seq("read_full"))
  }

  test("structure on a real rendered page is deterministic and glyph-consistent") {
    val text = Corpus.mediaTextFor(3)
    val bytes = SynthRaster.render(text, 99L)
    val a = StructureAnalyzer.analyze(bytes, roi)
    val b = StructureAnalyzer.analyze(bytes, roi)
    assert(a == b)
    // every paragraph text is a lowercase char from the alphabet
    a.paragraphs.foreach { p =>
      assert(p.text.length == 1 && graft.codec.Glyphs.indexOf(p.text.head) >= 0)
    }
  }

  test("blank page yields no structure (low-contrast guard)") {
    val bytes = SynthRaster.render("", 1L)
    val s = StructureAnalyzer.analyze(bytes, roi)
    assert(s.total_paragraphs == 0 && s.total_columns == 0)
  }

  test("L9 visualization: paragraph rectangles and column lines drawn, JPEG round-trips") {
    val w = 100; val h = 100
    val px = page(w, h, Seq((10, 20, 5, 7), (60, 20, 5, 7))) // two columns (gap 50 > 10%)
    val bytes = SynthRaster.toBytes(w, h, px)
    val struct = StructureAnalyzer.analyzeGray(px, w, h, (_, _, _) => "text.")
    assert(struct.total_paragraphs == 2 && struct.total_columns == 2)
    val viz = StructureAnalyzer.visualize(bytes, struct)
    assert(graft.img.ImageCodec.isCompressedImage(viz), "visualization must be a JPEG")
    val (vw, vh, vpx) = graft.img.ImageCodec.decode(viz)
    assert((vw, vh) == (w, h))
    def near(a: Int, b: Int, tol: Int) = math.abs(a - b) <= tol
    // top edge of paragraph 1's rectangle (JPEG is lossy: generous tol)
    assert(near(vpx(19 * w + 12), StructureAnalyzer.RectGray, 40),
      s"rect pixel ${vpx(19 * w + 12)} !~ ${StructureAnalyzer.RectGray}")
    // column line at boundary x=10, sampled well below the paragraphs
    assert(near(vpx(90 * w + 10), StructureAnalyzer.LineGray, 40),
      s"line pixel ${vpx(90 * w + 10)} !~ ${StructureAnalyzer.LineGray}")
    // untouched paper stays paper-ish
    assert(near(vpx(90 * w + 40), 230, 40), s"paper pixel ${vpx(90 * w + 40)} !~ 230")
    // and the ink interior stays ink-ish
    assert(near(vpx(23 * w + 12), 20, 45), s"ink pixel ${vpx(23 * w + 12)} !~ 20")
  }
}
