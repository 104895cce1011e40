package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared Column idioms whose correctness is subtle enough to live in
  * exactly one place.
  */
object SqlCols {

  /** Exact LONG floor division `floor(c / b)` for any sign of `c`.
    *
    * Neither naive form is safe: SQL `DIV` truncates toward zero
    * (off-by-one bucket for negative epoch-micros), and Spark's `/`
    * casts to double (exact only below 2^53 — large epoch-micros
    * silently drift). `(c - pmod(c, b))` is exactly divisible and
    * non-negative-remainder-adjusted, so one integral `div` stays in
    * LONG and floors for any sign. Used for every time/byte bucketing
    * column (range join, skew-proof as-of/sessionize, packing).
    */
  def floorDiv(c: Column, b: Long): Column = {
    require(b > 0, "floorDiv divisor must be positive")
    call_function("div", c - pmod(c, lit(b)), lit(b))
  }

  /** First 32 bits of md5(`c`) as a LONG in [0, 2^32) — the
    * engine-portable deterministic uniform-hash head (DuckDB replays
    * it as `conv(substring(md5(x),1,8),16,10)` byte-for-byte). 8 hex
    * chars keep every downstream product/mod inside LONG under ANSI.
    * Single definition for the q64/q69/q76 convention: DSIR feature
    * bucketing, A-ES priority sampling, and the deterministic hash
    * split must never drift apart or their oracles desynchronize.
    */
  def md5Head32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
}
