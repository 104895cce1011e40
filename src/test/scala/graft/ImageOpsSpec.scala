package graft

import graft.img.{ConnectedComponents, ImageOps}
import graft.util.Det
import org.scalatest.funsuite.AnyFunSuite

class ImageOpsSpec extends AnyFunSuite {

  test("grayscale uses BT.601 coefficients (app.py:521 cvtColor semantics)") {
    // pure colors: B, G, R
    val bgr = Array(255, 0, 0, 0, 255, 0, 0, 0, 255)
    val g = ImageOps.grayFromBgr(bgr, 3, 1)
    assert(g(0) == 29) // 0.114 * 255 = 29.07 -> 29
    assert(g(1) == 150) // 0.587 * 255 = 149.7 -> 150 (fixed point)
    assert(g(2) == 76) // 0.299 * 255 = 76.2 -> 76
  }

  test("global threshold: strictly greater than 128 (app.py:526)") {
    val out = ImageOps.thresholdGlobal(Array(0, 128, 129, 255), 128)
    assert(out.toSeq == Seq(0, 0, 255, 255))
  }

  test("gaussian blur 3x3 is the binomial [1,2,1] filter with reflect-101 border") {
    // impulse response: center pixel 16/16ths distributes 1-2-1 x 1-2-1
    val px = Array.fill(25)(0)
    px(12) = 160 // center of 5x5
    val out = ImageOps.gaussianBlur(px, 5, 5, 3)
    assert(out(12) == 40) // 160 * 4/16
    assert(out(7) == 20) // 160 * 2/16
    assert(out(6) == 10) // 160 * 1/16
    assert(out(0) == 0)
  }

  test("blur preserves constant images (any ksize, property)") {
    for (i <- 0 until 50; k <- Seq(3, 5)) {
      val v = Det.bounded(Det.at(1L, i), 256)
      val px = Array.fill(7 * 4)(v)
      assert(ImageOps.gaussianBlur(px, 7, 4, k).forall(_ == v))
    }
  }

  test("otsu on a clean bimodal histogram separates the modes") {
    val px = Array.fill(100)(20) ++ Array.fill(100)(220)
    val t = ImageOps.otsuThreshold(px)
    assert(t >= 20 && t < 220)
    val bin = ImageOps.thresholdOtsu(px)
    assert(bin.take(100).forall(_ == 0) && bin.drop(100).forall(_ == 255))
  }

  test("otsu invariant under histogram scaling (property)") {
    for (i <- 0 until 50) {
      val rep = 2 + Det.bounded(Det.at(2L, i), 19)
      val lo = 30 + Det.bounded(Det.at(3L, i), 71)
      val hi = 150 + Det.bounded(Det.at(4L, i), 101)
      val base = Array.fill(10)(lo) ++ Array.fill(7)(hi)
      val scaled = Array.fill(10 * rep)(lo) ++ Array.fill(7 * rep)(hi)
      assert(ImageOps.otsuThreshold(base) == ImageOps.otsuThreshold(scaled))
    }
  }

  test("low-contrast pages binarize to all-background (blank-scan guard)") {
    val px = Array.fill(50)(200) ++ Array.fill(50)(210)
    assert(ImageOps.thresholdOtsu(px).forall(_ == 255))
    assert(ImageOps.thresholdOtsu(px, invert = true).forall(_ == 0))
  }

  test("adaptive gaussian: flat image stays background, step edge binarizes") {
    val flat = Array.fill(20 * 20)(200)
    assert(ImageOps.adaptiveGaussian(flat, 20, 20).forall(_ == 255))
    // dark square on light background
    val px = Array.fill(20 * 20)(230)
    for (y <- 8 until 12; x <- 8 until 12) px(y * 20 + x) = 20
    val bin = ImageOps.adaptiveGaussian(px, 20, 20)
    assert(bin(10 * 20 + 10) == 0) // inside the square: below local mean - 2
    assert(bin(2 * 20 + 2) == 255)
  }

  test("morphClose with 1x1 kernel is identity (app.py:542-543)") {
    val px = Array(0, 255, 0, 255, 255, 0)
    assert(ImageOps.morphClose(px, 3, 2, 1, 1) eq px)
  }

  test("morphClose 3x3 fills single-pixel gaps") {
    // 255 = foreground; a 1px hole inside a foreground block
    val px = Array.fill(5 * 5)(255)
    px(12) = 0
    val out = ImageOps.morphClose(px, 5, 5, 3, 3)
    assert(out(12) == 255)
  }

  test("resizeCap: under-cap images pass through untouched") {
    val px = Array.tabulate(12)(identity)
    val (out, w, h) = ImageOps.resizeCap(px, 4, 3, 10)
    assert((out eq px) && w == 4 && h == 3)
  }

  test("resizeCap: long edge lands on cap, aspect preserved") {
    val px = Array.fill(40 * 20)(100)
    val (out, w, h) = ImageOps.resizeCap(px, 40, 20, 10)
    assert(w == 10 && h == 5)
    assert(out.forall(_ == 100)) // constant image stays constant
  }

  test("connected components: two blocks, 4-connectivity, scan order") {
    //  A A . B
    //  A A . B
    val px = Array(1, 1, 0, 1, 1, 1, 0, 1)
    val (labels, stats) = ConnectedComponents.label(px, 4, 2)
    assert(stats.length == 2)
    assert(labels(0) == 1 && labels(3) == 2) // first-encounter order
    val a = stats(0); val b = stats(1)
    assert((a.x, a.y, a.w, a.h, a.area) == (0, 0, 2, 2, 4))
    assert((b.x, b.y, b.w, b.h, b.area) == (3, 0, 1, 2, 2))
  }

  test("connected components: diagonal pixels are separate under 4-conn") {
    val px = Array(1, 0, 0, 1)
    val (_, stats) = ConnectedComponents.label(px, 2, 2)
    assert(stats.length == 2)
  }

  test("connected components: U shape merges across equivalences") {
    // U-shape: left column, right column, bottom row — single component
    val px = Array(
      1, 0, 1,
      1, 0, 1,
      1, 1, 1)
    val (_, stats) = ConnectedComponents.label(px, 3, 3)
    assert(stats.length == 1)
    assert(stats.head.area == 7)
    assert((stats.head.w, stats.head.h) == (3, 3))
  }
}
