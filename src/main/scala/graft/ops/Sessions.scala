package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch sessionization — the relational twin of the streaming
  * session operator ([[graft.streaming.StreamingJobs.sessionize]]):
  * the reference evicts a session after 30 minutes of inactivity
  * (`SESSION_TIMEOUT`, `app.py:238`); over an events table the same
  * rule is a gap-and-island assignment. `lag` marks gap boundaries,
  * a running sum numbers the islands, one aggregation closes them —
  * a single shuffle keyed by user, no state store, scales as
  * independent per-user partitions (the 100 TB form of the operator;
  * the streaming form is for unbounded arrival). SKEW caveat: the
  * island window is per-user sequential, so one pathological user
  * holding a large row share serializes into one task — audit with
  * [[graft.ops.Sketches.keySkewAudit]] when the user distribution is
  * unknown, and split such users by time range (stitch sessions at
  * the boundaries) or quarantine them.
  *
  * Same strict-gap rule as the streaming twin: a gap of EXACTLY the
  * timeout keeps the session open; strictly greater splits.
  */
object Sessions {

  /** 30 min in microseconds (`SESSION_TIMEOUT`, app.py:238). */
  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** One row per (user, session): event count, start/end (epoch
    * micros — exact integer time, no float seconds), value total.
    * `tieBreak` stabilizes ordering for equal timestamps.
    */
  def sessionize(events: DataFrame, gapUs: Long = GapUs,
                 tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = col("__us") +: tieBreak
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // parquet timestamps may infer as TIMESTAMP_NTZ (Spark 4 default
      // when isAdjustedToUTC=false); cast first — identity under the
      // UTC session every runner here uses
      .withColumn("__us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__us")).as("session_start_us"),
        max(col("__us")).as("session_end_us"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Skew-proof [[sessionize]] — identical output, bounded tasks.
    *
    * The plain form's per-user window serializes a whale user into
    * one task. Two phases fix that without changing the result:
    *
    *  1. local sessionize per (user, `bucketUs` time bucket) — the
    *     window key includes the bucket, so no task ever holds more
    *     than one bucket of one user. Bucket edges force extra
    *     splits; aggregates stay raw (value sums unrounded).
    *  2. island-merge over the LOCAL SESSIONS per user: a session
    *     merges into its predecessor when `start - prev_end <= gapUs`.
    *     Sessions tile each user's events in time order, so
    *     `start - prev_end` IS the true event gap at every seam:
    *     same-bucket seams were split because gap > gapUs (never
    *     merge), cross-bucket seams merge exactly when the event gap
    *     says so — the split points equal the plain form's. Phase 2
    *     is again per-user sequential, but over sessions-plus-bucket-
    *     crossings rows (<= real sessions + buckets touched), not
    *     events: a 10^9-event whale in one bucket becomes ONE row.
    *
    * Pick `bucketUs` >> `gapUs` (default 1 day vs 30 min) so phase-2
    * row counts stay tiny; [[graft.ops.Sketches.keySkewAudit]] tells
    * you whether you need this form at all.
    */
  def sessionizeSkewAware(events: DataFrame, gapUs: Long = GapUs,
                          bucketUs: Long = 24L * 3600 * 1000 * 1000): DataFrame = {
    require(bucketUs > gapUs, "bucketUs must exceed gapUs (bucket edges force splits)")
    import org.apache.spark.sql.expressions.Window
    val us = col("__us")
    val bucket = graft.util.SqlCols.floorDiv(us, bucketUs)
    val w = Window.partitionBy(col("user_id"), col("__b")).orderBy(us)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = events
      .withColumn("__us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("__b", bucket)
      .withColumn("__prev", lag(us, 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || us - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("__ls", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("__b"), col("__ls"))
      .agg(count(lit(1)).as("__n"), min(us).as("__start"),
        max(us).as("__end"), sum(col("value")).as("__val"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("__start"), col("__end"))
    val run2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local
      .withColumn("__pe", lag(col("__end"), 1).over(w2))
      .withColumn("__new2",
        when(col("__pe").isNull || col("__start") - col("__pe") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new2")).over(run2))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        sum(col("__n")).as("n_events"),
        min(col("__start")).as("session_start_us"),
        max(col("__end")).as("session_end_us"),
        round(sum(col("__val")), 2).as("total_value"))
  }
}
