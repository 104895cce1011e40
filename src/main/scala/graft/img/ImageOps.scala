package graft.img

/** Pure image kernels over `(Array[Int] 0..255 grayscale, w, h)` —
  * re-implementations (from the operations' public definitions, not
  * from any library source) of the exact chain the reference drives
  * through OpenCV in `preprocess_image` (`app.py:487-558`,
  * `app2.py:250-312`):
  *
  *   grayscale -> [Gaussian blur 3x3|5x5] ->
  *     {global-128 | adaptive-Gaussian(11,2) | Otsu | Otsu+close(1x1)}
  *
  * Numeric conventions (our pinned spec, SURVEY.md §7.5): border
  * handling is reflect-101 (OpenCV's BORDER_DEFAULT), integer blur
  * kernels are the binomial [1,2,1]/4 and [1,4,6,4,1]/16 separable
  * filters (what OpenCV uses for sigma=0 at these sizes), rounding is
  * half-up. These run inside the OCR `mapPartitions` kernel — tight
  * loops over primitive arrays, no boxing, JIT-friendly.
  */
object ImageOps {

  /** reflect-101 border index: -1 -> 1, n -> n-2 — clamped into
    * [0, n-1] afterwards: when the dimension is smaller than the
    * kernel radius (1x1 tracking pixels, sliver crops) the pure
    * reflection maps outside the array (n=1 sends -1 to 1) and the
    * blur kernels would throw mid-task.
    */
  @inline private def ref101(i: Int, n: Int): Int = {
    val r = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
    if (r < 0) 0 else if (r >= n) n - 1 else r
  }

  /** BGR -> gray with OpenCV's coefficients (ITU-R BT.601):
    * gray = 0.299 R + 0.587 G + 0.114 B, rounded half-up.
    * (`cv2.cvtColor(BGR2GRAY)`, `app.py:521`.) Input is B,G,R triplets.
    */
  def grayFromBgr(bgr: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val b = bgr(3 * i); val g = bgr(3 * i + 1); val r = bgr(3 * i + 2)
      // fixed-point: (4899 r + 9617 g + 1868 b + 8192) >> 14
      out(i) = (4899 * r + 9617 * g + 1868 * b + 8192) >> 14
      i += 1
    }
    out
  }

  /** Separable binomial Gaussian blur; ksize in {3, 5} mirrors
    * `cv2.GaussianBlur(img,(k,k),0)` (`app.py:530,538,547`).
    */
  def gaussianBlur(px: Array[Int], w: Int, h: Int, ksize: Int): Array[Int] = {
    val (kern, norm) = ksize match {
      case 3 => (Array(1, 2, 1), 4)
      case 5 => (Array(1, 4, 6, 4, 1), 16)
      case k => throw new IllegalArgumentException(s"ksize $k")
    }
    val r = ksize / 2
    val tmp = new Array[Int](w * h)
    var y = 0
    while (y < h) { // horizontal pass
      var x = 0
      while (x < w) {
        var acc = 0
        var k = -r
        while (k <= r) { acc += kern(k + r) * px(y * w + ref101(x + k, w)); k += 1 }
        tmp(y * w + x) = (acc + norm / 2) / norm
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](w * h)
    y = 0
    while (y < h) { // vertical pass
      var x = 0
      while (x < w) {
        var acc = 0
        var k = -r
        while (k <= r) { acc += kern(k + r) * tmp(ref101(y + k, h) * w + x); k += 1 }
        out(y * w + x) = (acc + norm / 2) / norm
        x += 1
      }
      y += 1
    }
    out
  }

  /** Global binary threshold: px > thresh -> 255 else 0
    * (`cv2.threshold(gray,128,255,BINARY)`, `app.py:526`).
    */
  def thresholdGlobal(px: Array[Int], thresh: Int): Array[Int] =
    px.map(p => if (p > thresh) 255 else 0)

  /** Otsu's threshold over a 256-bin histogram: argmax of the
    * between-class variance (first maximum wins); returns the chosen
    * threshold t, binarization is px > t -> 255.
    * (`THRESH_BINARY+THRESH_OTSU`, `app.py:539,548`.)
    */
  def otsuThreshold(px: Array[Int]): Int = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < px.length) { hist(px(i)) += 1; i += 1 }
    val total = px.length.toDouble
    var sumAll = 0.0
    i = 0
    while (i < 256) { sumAll += i * hist(i).toDouble; i += 1 }
    var wB = 0.0; var sumB = 0.0
    var best = -1.0; var bestT = 0
    var t = 0
    while (t < 256) {
      wB += hist(t)
      if (wB > 0 && wB < total) {
        sumB += t * hist(t).toDouble
        val wF = total - wB
        val mB = sumB / wB
        val mF = (sumAll - sumB) / wF
        val between = wB * wF * (mB - mF) * (mB - mF)
        if (between > best) { best = between; bestT = t }
      }
      t += 1
    }
    bestT
  }

  /** Low-contrast guard: Otsu's criterion is meaningless on a page with
    * a single gray mode (a blank scan) — it would split the noise in
    * half. Pages whose dynamic range is under `minContrast` binarize to
    * all-background (our pinned spec; Tesseract likewise reads a blank
    * page as no text).
    */
  final val minContrast = 48

  def lowContrast(px: Array[Int]): Boolean = {
    var mn = 255; var mx = 0
    var i = 0
    while (i < px.length) {
      if (px(i) < mn) mn = px(i)
      if (px(i) > mx) mx = px(i)
      i += 1
    }
    mx - mn < minContrast
  }

  def thresholdOtsu(px: Array[Int], invert: Boolean = false): Array[Int] = {
    if (lowContrast(px)) {
      return if (invert) Array.fill(px.length)(0) else Array.fill(px.length)(255)
    }
    val t = otsuThreshold(px)
    if (invert) px.map(p => if (p > t) 0 else 255)
    else px.map(p => if (p > t) 255 else 0)
  }

  /** Adaptive Gaussian threshold, blockSize x blockSize window, bias C:
    * out = 255 if px > (gaussianWeightedMean(window) - C) else 0.
    * (`cv2.adaptiveThreshold(...,ADAPTIVE_THRESH_GAUSSIAN_C,BINARY,11,2)`,
    * `app.py:531-533`.) Separable double-precision Gaussian with
    * OpenCV's derived sigma = 0.3*((k-1)*0.5 - 1) + 0.8.
    */
  def adaptiveGaussian(px: Array[Int], w: Int, h: Int,
                       blockSize: Int = 11, c: Double = 2.0): Array[Int] = {
    val r = blockSize / 2
    val sigma = 0.3 * ((blockSize - 1) * 0.5 - 1) + 0.8
    val kern = new Array[Double](blockSize)
    var s = 0.0
    var i = 0
    while (i < blockSize) {
      val d = i - r
      kern(i) = math.exp(-(d * d) / (2 * sigma * sigma))
      s += kern(i)
      i += 1
    }
    i = 0
    while (i < blockSize) { kern(i) /= s; i += 1 }

    val tmp = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var k = -r
        while (k <= r) { acc += kern(k + r) * px(y * w + ref101(x + k, w)); k += 1 }
        tmp(y * w + x) = acc
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](w * h)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var k = -r
        while (k <= r) { acc += kern(k + r) * tmp(ref101(y + k, h) * w + x); k += 1 }
        out(y * w + x) = if (px(y * w + x) > acc - c) 255 else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Morphological close = dilate then erode with a rect kernel.
    * The reference uses a 1x1 kernel (`app.py:542-543`) — an identity,
    * retained for fidelity; the general form exists for ksize > 1.
    */
  def morphClose(px: Array[Int], w: Int, h: Int, kw: Int, kh: Int): Array[Int] = {
    if (kw <= 1 && kh <= 1) return px
    def dilate(in: Array[Int]): Array[Int] = minmax(in, math.max)
    def erode(in: Array[Int]): Array[Int] = minmax(in, math.min)
    def minmax(in: Array[Int], op: (Int, Int) => Int): Array[Int] = {
      val out = new Array[Int](w * h)
      val rx = kw / 2; val ry = kh / 2
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var v = in(y * w + x)
          var dy = -ry
          while (dy <= ry) {
            var dx = -rx
            while (dx <= rx) {
              val yy = y + dy; val xx = x + dx
              if (yy >= 0 && yy < h && xx >= 0 && xx < w) v = op(v, in(yy * w + xx))
              dx += 1
            }
            dy += 1
          }
          out(y * w + x) = v
          x += 1
        }
        y += 1
      }
      out
    }
    erode(dilate(px))
  }

  /** Bilinear resize — the LANCZOS-downscale stand-in for
    * `optimize_image_for_mobile` (`app.py:341-350`): if max(w,h) > cap,
    * scale preserving aspect so the long edge equals cap. Returns the
    * input untouched when under the cap (the common case for the
    * synthetic rasters, all of which fit the smallest v2 cap of 800px).
    */
  def resizeCap(px: Array[Int], w: Int, h: Int, cap: Int): (Array[Int], Int, Int) = {
    val m = math.max(w, h)
    if (m <= cap) return (px, w, h)
    val scale = cap.toDouble / m
    val nw = math.max(1, math.round(w * scale).toInt)
    val nh = math.max(1, math.round(h * scale).toInt)
    val out = new Array[Int](nw * nh)
    var y = 0
    while (y < nh) {
      val sy = (y + 0.5) * h / nh - 0.5
      val y0 = math.max(0, math.floor(sy).toInt)
      val y1 = math.min(h - 1, y0 + 1)
      val fy = sy - y0
      var x = 0
      while (x < nw) {
        val sx = (x + 0.5) * w / nw - 0.5
        val x0 = math.max(0, math.floor(sx).toInt)
        val x1 = math.min(w - 1, x0 + 1)
        val fx = sx - x0
        val v =
          px(y0 * w + x0) * (1 - fx) * (1 - fy) + px(y0 * w + x1) * fx * (1 - fy) +
            px(y1 * w + x0) * (1 - fx) * fy + px(y1 * w + x1) * fx * fy
        out(y * nw + x) = math.round(v).toInt.max(0).min(255)
        x += 1
      }
      y += 1
    }
    (out, nw, nh)
  }
}
