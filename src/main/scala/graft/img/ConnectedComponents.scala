package graft.img

/** Connected-component labeling with stats — the engine-side analog of
  * `cv2.connectedComponentsWithStats(binary, 4, CV_32S)`
  * (`app.py:863-864`): 4-connectivity, two-pass union-find, labels
  * numbered 1..n in first-raster-scan-encounter order (background = 0),
  * per-component bounding box + area. Pure function over a binary
  * image where foreground = nonzero.
  */
object ConnectedComponents {

  /** (x, y) top-left, (w, h) bbox size, area = foreground pixel count. */
  final case class Stat(label: Int, x: Int, y: Int, w: Int, h: Int, area: Int)

  def label(px: Array[Int], w: Int, h: Int): (Array[Int], Vector[Stat]) = {
    val labels = new Array[Int](w * h)
    val parent = new Array[Int](w * h / 2 + 2)
    var next = 1

    @inline def find(a0: Int): Int = {
      var a = a0
      while (parent(a) != a) { parent(a) = parent(parent(a)); a = parent(a) }
      a
    }
    @inline def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }

    // pass 1: provisional labels + equivalences (4-connectivity: W and N)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (px(i) != 0) {
          val left = if (x > 0 && px(i - 1) != 0) labels(i - 1) else 0
          val up = if (y > 0 && px(i - w) != 0) labels(i - w) else 0
          if (left == 0 && up == 0) {
            parent(next) = next
            labels(i) = next
            next += 1
          } else if (left != 0 && up != 0) {
            labels(i) = math.min(left, up)
            union(left, up)
          } else labels(i) = math.max(left, up)
        }
        x += 1
      }
      y += 1
    }

    // pass 2: resolve + renumber in first-encounter order, collect stats
    val remap = new Array[Int](next)
    var nOut = 0
    var minX: Array[Int] = new Array[Int](next)
    var minY: Array[Int] = new Array[Int](next)
    var maxX: Array[Int] = new Array[Int](next)
    var maxY: Array[Int] = new Array[Int](next)
    var area: Array[Int] = new Array[Int](next)
    java.util.Arrays.fill(minX, Int.MaxValue)
    java.util.Arrays.fill(minY, Int.MaxValue)
    java.util.Arrays.fill(maxX, -1)
    java.util.Arrays.fill(maxY, -1)

    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (labels(i) != 0) {
          val root = find(labels(i))
          var lbl = remap(root)
          if (lbl == 0) { nOut += 1; lbl = nOut; remap(root) = lbl }
          labels(i) = lbl
          if (x < minX(lbl)) minX(lbl) = x
          if (y < minY(lbl)) minY(lbl) = y
          if (x > maxX(lbl)) maxX(lbl) = x
          if (y > maxY(lbl)) maxY(lbl) = y
          area(lbl) += 1
        }
        x += 1
      }
      y += 1
    }

    val stats = (1 to nOut).map { l =>
      Stat(l, minX(l), minY(l), maxX(l) - minX(l) + 1, maxY(l) - minY(l) + 1, area(l))
    }.toVector
    (labels, stats)
  }
}
