package graft.codec

import graft.util.Det

/** The synthetic raster format the corpus generator writes into the
  * `media.bytes` column and the OCR engine decodes.
  *
  * Layout (grayscale, 1 byte/pixel, 0 = black ink, 255 = white):
  *
  *   bytes = [ w:int32 BE | h:int32 BE | w*h pixels row-major ]
  *
  * Text is laid out on a fixed grid of 6x8-pixel cells (5x7 glyph +
  * 1px inter-cell gutter), `COLS` cells per line, `MARGIN`px page
  * border — the stand-in for a scanned page. A deterministic
  * per-pixel brightness jitter (keyed by the media seed) plays the
  * role of scanner noise; its amplitude (±~2 gray levels around
  * ink=18 / paper=230) is chosen so that every preprocessing chain of
  * the reference (`app.py:521-548`) still binarizes the page cleanly,
  * which is what a real 200-DPI scan of dark-on-light text does.
  *
  * `groundTruth` is the pure function from source text to the decoded
  * text the engine must produce — the north-rule fixtures compare
  * engine output against it, never against engine output itself.
  */
object SynthRaster {
  // 5x7 glyph in an 8x10 cell: 3px gutters keep the 5x7 observation
  // window of a cell out of blur range (radius <= 2) of its neighbors,
  // so a glyph's post-blur appearance is context-independent.
  final val CELL_W = 8
  final val CELL_H = 10
  final val COLS = 40
  final val MARGIN = 2

  final val INK = 18
  final val PAPER = 230

  /** Lowercase, map anything outside the renderable alphabet to a
    * space, collapse whitespace runs, trim.
    */
  def normalize(text: String): String = {
    val sb = new StringBuilder(text.length)
    var lastSpace = true
    var i = 0
    while (i < text.length) {
      val c0 = Character.toLowerCase(text.charAt(i))
      val c = if (Glyphs.indexOf(c0) >= 0) c0 else ' '
      if (c == ' ') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else { sb.append(c); lastSpace = false }
      i += 1
    }
    sb.toString.trim
  }

  /** Greedy word wrap at COLS cells; words longer than COLS are
    * hard-broken (they cannot occur with the generator's vocab).
    */
  def wrap(normalized: String): Vector[String] = {
    if (normalized.isEmpty) return Vector.empty
    val words = normalized.split(' ')
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    words.foreach { w0 =>
      var w = w0
      while (w.length > COLS) {
        if (cur.nonEmpty) { lines += cur.toString; cur.clear() }
        lines += w.substring(0, COLS)
        w = w.substring(COLS)
      }
      if (w.nonEmpty) {
        if (cur.isEmpty) cur.append(w)
        else if (cur.length + 1 + w.length <= COLS) { cur.append(' '); cur.append(w) }
        else { lines += cur.toString; cur.clear(); cur.append(w) }
      }
    }
    if (cur.nonEmpty) lines += cur.toString
    lines.result()
  }

  /** What a perfect decode of `render(text, _)` returns. */
  def groundTruth(text: String): String = wrap(normalize(text)).mkString("\n")

  /** Render text into raster bytes. `seed` keys the noise field;
    * `noise = false` renders the clean INK/PAPER constants (used for
    * engine calibration pages). `language` selects the glyph font —
    * the page is "printed in" that language's script.
    */
  def render(text: String, seed: Long, noise: Boolean = true,
             language: String = "eng"): Array[Byte] = {
    val font = Glyphs.fontFor(language)
    val lines = wrap(normalize(text))
    val rows = math.max(1, lines.length)
    val w = 2 * MARGIN + COLS * CELL_W
    val h = 2 * MARGIN + rows * CELL_H
    val px = new Array[Byte]((w * h).toInt)
    // paper with jitter
    var i = 0
    while (i < px.length) {
      px(i) = (if (noise) PAPER + Det.bounded(Det.at(seed, i.toLong), 5) - 2 else PAPER).toByte
      i += 1
    }
    // ink
    var r = 0
    while (r < lines.length) {
      val line = lines(r)
      var c = 0
      while (c < line.length) {
        val gi = Glyphs.indexOf(line.charAt(c))
        if (gi >= 0) {
          val pat = font(gi)
          val x0 = MARGIN + c * CELL_W
          val y0 = MARGIN + r * CELL_H
          var b = 0
          while (b < Glyphs.PIX) {
            if ((pat & (1L << b)) != 0L) {
              val x = x0 + b % Glyphs.W
              val y = y0 + b / Glyphs.W
              val idx = y * w + x
              px(idx) = (if (noise) INK + Det.bounded(Det.at(seed, 0x10000000L + idx), 5) - 2
                         else INK).toByte
            }
            b += 1
          }
        }
        c += 1
      }
      r += 1
    }
    val out = new Array[Byte](8 + px.length)
    out(0) = (w >>> 24).toByte; out(1) = (w >>> 16).toByte
    out(2) = (w >>> 8).toByte; out(3) = w.toByte
    out(4) = (h >>> 24).toByte; out(5) = (h >>> 16).toByte
    out(6) = (h >>> 8).toByte; out(7) = h.toByte
    System.arraycopy(px, 0, out, 8, px.length)
    out
  }

  /** Parse header + pixels (as unsigned ints 0..255). */
  def parse(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 8, s"raster too short: ${bytes.length}")
    val w = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val h = ((bytes(4) & 0xff) << 24) | ((bytes(5) & 0xff) << 16) |
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    // LONG arithmetic: a corrupt header whose w*h wraps Int (e.g.
    // 65536 x 65536 -> 0) must fail the size check, not pass it with
    // an empty pixel array and crash downstream
    require(w > 0 && h > 0 && bytes.length.toLong == 8L + w.toLong * h,
      s"raster size mismatch: ${bytes.length} vs $w x $h")
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) { px(i) = bytes(8 + i) & 0xff; i += 1 }
    (w, h, px)
  }

  def toBytes(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](8 + w * h)
    out(0) = (w >>> 24).toByte; out(1) = (w >>> 16).toByte
    out(2) = (w >>> 8).toByte; out(3) = w.toByte
    out(4) = (h >>> 24).toByte; out(5) = (h >>> 16).toByte
    out(6) = (h >>> 8).toByte; out(7) = h.toByte
    var i = 0
    while (i < px.length) { out(8 + i) = px(i).toByte; i += 1 }
    out
  }
}
