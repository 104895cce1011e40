package graft

import graft.ops.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sessions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("sessionizeSkewAware == sessionize on an adversarial corpus (whale, exact-gap seams, edge crossings)") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val gapUs = 100L * 1000000L    // 100 s inactivity gap
    val bucketUs = 300L * 1000000L // 5-minute buckets: many sessions cross edges
    val rows = Seq.newBuilder[(Long, Long, java.sql.Timestamp, Double)]
    var id = 0L
    // whale user 1: one long never-gapping session spanning ~30 buckets
    // (every inter-event gap 50 s < 100 s) — the case that serializes
    // the plain form and must come back as ONE merged session
    for (i <- 0 until 180)
      rows += ((1L, { id += 1; id }, ts(i * 50L), 1.0))
    // user 2: seams at EXACTLY the gap (stays open) and gap+1 (splits),
    // placed to straddle bucket edges
    Seq(0L, 100L, 201L, 301L, 599L, 700L).foreach(t =>
      rows += ((2L, { id += 1; id }, ts(t), 2.5)))
    // user 3: a session whose only events sit just before and just
    // after a bucket edge (the pure stitch case)
    Seq(299L, 301L).foreach(t => rows += ((3L, { id += 1; id }, ts(t), 0.75)))
    // user 4: single event
    rows += ((4L, { id += 1; id }, ts(42), 9.99))
    val events = rows.result().toDF("user_id", "event_id", "ts", "value")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("user_id"), col("session_idx")).collect().map(_.toSeq).toSeq
    val plain = canon(Sessions.sessionize(events, gapUs = gapUs))
    val skew = canon(Sessions.sessionizeSkewAware(events, gapUs = gapUs, bucketUs = bucketUs))
    assert(skew == plain)
    // sanity on the intended shapes: whale = one session of 180 events
    val whale = plain.filter(_.head == 1L)
    assert(whale.size == 1 && whale.head(2) == 180L, s"whale sessions: $whale")
    // user 2: stays open at the two exact-gap seams (0->100, 201->301),
    // splits at 100->201, 301->599, 599->700 -> 4 sessions
    assert(plain.count(_.head == 2L) == 4)
    // user 3: stitched across the bucket edge -> 1 session of 2 events
    val u3 = plain.filter(_.head == 3L)
    assert(u3.size == 1 && u3.head(2) == 2L)
  }

  test("sessionizeSkewAware rejects bucketUs <= gapUs") {
    import spark.implicits._
    val e = Seq((1L, 1L, ts(0), 1.0)).toDF("user_id", "event_id", "ts", "value")
    intercept[IllegalArgumentException] {
      Sessions.sessionizeSkewAware(e, gapUs = 100L, bucketUs = 100L)
    }
  }
}
