package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks natively — as-of join and range join — in
  * their corpus-scale forms. Both avoid the inequality-join explosion
  * (Catalyst plans a raw `l.t >= r.t` theta join as a per-key nested
  * loop): as-of is ONE key-partitioned window pass over the tagged
  * union of both sides; range join replicates each interval only to
  * the time buckets it covers so the sole shuffle is an equi-join on
  * (key, bucket).
  */
object Joins {

  /** As-of join: for each left row, the single most recent right row
    * with right time <= left time on the same key (DuckDB/kdb ASOF
    * semantics — a right row at exactly the left time matches).
    *
    * Union-window form: tag sides (right sorts before left at equal
    * time), one running `last(payload, ignoreNulls)` window carries
    * the latest right payload forward, keep the left rows. One
    * shuffle on the key, one sort — no inequality join. Determinism
    * requires (key, time) unique per side (ties would make "the"
    * most-recent row ambiguous — same caveat as any ASOF engine).
    *
    * SKEW caveat (inherent to ASOF on any engine): the running window
    * is per-key sequential, so one pathological key holding a large
    * share of the rows serializes into a single task. When the key
    * distribution is unknown, run
    * [[graft.ops.Sketches.keySkewAudit]] first (O(k) state, two
    * scans) and split/quarantine the reported keys — time-range
    * pre-bucketing with boundary stitching is the standard split.
    *
    * Output: all left columns + `asof_time_us` + each requested right
    * payload column prefixed `asof_` (all null when no prior right
    * row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val reserved = left.columns.filter(c => c.startsWith("__") || c.startsWith("asof_"))
    require(reserved.isEmpty,
      s"asofJoin reserves '__*' and 'asof_*' column names; left side has: ${reserved.mkString(", ")}")
    val rUs = unix_micros(col(rightTime).cast("timestamp"))
    val payloadCols = rUs.as("asof_time_us") +:
      rightPayload.map(c => col(c).as(s"asof_$c"))
    // ASOF semantics: a right row with NULL key or NULL time never
    // matches anything (DuckDB/kdb: `l.t >= NULL` is false). Unfiltered
    // it would sort nulls-first and its non-null payload struct would
    // carry into every left row with no real prior match.
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(Seq(col(key), rUs.as("__t"),
        struct(payloadCols: _*).as("__rp"), lit(0).as("__side")): _*)
    val l = left
      .withColumn("__t", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outPayload = col("__last.asof_time_us") +:
      rightPayload.map(c => col(s"__last.asof_$c").as(s"asof_$c"))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__last", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++ outPayload: _*)
  }

  /** Range (interval-containment) join: points to the intervals
    * [startUs, endUs) that contain them, per key. `pointUs`,
    * `startUs`, `endUs` are epoch-micros LONG columns.
    *
    * Bucketed form: each interval replicates to the `bucketUs`-wide
    * buckets it covers (bounded by interval length / bucket width —
    * pick bucketUs near the typical interval length), each point
    * lives in exactly one bucket, so the shuffle is an equi-join on
    * (key, bucket) and every matched pair appears exactly once — no
    * post-join dedup. Integer bucket arithmetic (DIV), no float
    * boundaries.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                pointUs: String, startUs: String, endUs: String,
                bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    // floor division (DIV truncates toward zero — off-by-one bucket
    // for pre-1970 negative micros): (a - pmod(a, b)) is exactly
    // divisible, and the division stays in LONG (IntegralDivide) —
    // Spark's `/` casts to double, which is exact only below 2^53
    // and would silently drift buckets for large epoch-micros
    def fdiv(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(bucketUs)), lit(bucketUs))
    val p = points.withColumn("__bucket", fdiv(col(pointUs)))
    // empty/inverted intervals ([s, e) with e <= s) match nothing by
    // definition — and MUST be dropped before the explode: Spark's
    // sequence(from, to) steps -1 when from > to, so a corrupt
    // inverted interval would otherwise replicate into (s-e)/bucketUs
    // spurious bucket rows
    val i = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn("__bucket",
        explode(sequence(fdiv(col(startUs)), fdiv(col(endUs) - 1))))
    p.join(i, Seq(key, "__bucket"))
      .filter(col(pointUs) >= col(startUs) && col(pointUs) < col(endUs))
      .drop("__bucket")
  }
}
