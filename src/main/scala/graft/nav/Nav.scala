package graft.nav

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Navigation — the reference's page/paragraph/sentence/column cursor
  * endpoints (`app.py:1487-1830`) reduced to their arithmetic core:
  * clamped cursor moves over `posexplode`d structure. Stateless given
  * the extracted output table (SURVEY.md §2.6): the session cursor is
  * request affinity, not data, so each move is a pure expression and
  * "get the current unit" is `element_at` on the spans array.
  *
  *   next     = min(cur+1, total-1)   (`app.py:1500-1505`)
  *   previous = max(cur-1, 0)
  *   goto     = max(0, min(pos, total-1))
  */
object Nav {

  def next(cur: Column, total: Column): Column =
    least(cur + 1, total - 1)

  def previous(cur: Column): Column =
    greatest(cur - 1, lit(0))

  def goto(pos: Column, total: Column): Column =
    greatest(lit(0), least(pos, total - 1))

  /** Scala mirrors for kernel-side use and property tests. */
  def nextI(cur: Int, total: Int): Int = math.min(cur + 1, total - 1)
  def previousI(cur: Int): Int = math.max(cur - 1, 0)
  def gotoI(pos: Int, total: Int): Int = math.max(0, math.min(pos, total - 1))

  /** The span at a clamped position (element_at is 1-based). An empty
    * array yields null: the clamp alone would still probe index 1,
    * which is a hard INVALID_ARRAY_INDEX error under ANSI mode
    * (Spark 4's default), not a null.
    */
  def spanAt(spans: Column, pos: Column): Column =
    when(size(spans) > 0, element_at(spans, goto(pos, size(spans)) + 1))

  /** Column navigation materializes the column's paragraphs by id —
    * the id semi-join of `app.py:1810-1812`, as an array filter.
    */
  def paragraphsOfColumn(paragraphs: Column, columnParagraphIds: Column): Column =
    filter(paragraphs, p => array_contains(columnParagraphIds, p("id")))
}
