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
}
