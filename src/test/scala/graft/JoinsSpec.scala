package graft

import graft.ops.Joins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-joins")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("asofJoin picks the LATEST prior right row; equal time matches; no prior -> null") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val left = Seq(
      (1L, 10L, ts(100)),  // after r@40 and r@90 -> 90
      (1L, 11L, ts(40)),   // exactly at r@40 -> 40 (>= semantics)
      (1L, 12L, ts(5)),    // before any right row -> null
      (2L, 20L, ts(500))   // key with no right rows -> null
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 90L, ts(40)),
      (1L, 91L, ts(90)),
      (3L, 92L, ts(1))     // other key, never matches
    ).toDF("user_id", "rid", "ts")
    val out = Joins.asofJoin(left, right, "user_id", "ts", "ts", Seq("rid"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("asof_time_us")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong))).toMap
    assert(out(10L) == (Some(90000000L), Some(91L)))
    assert(out(11L) == (Some(40000000L), Some(90L)))
    assert(out(12L) == (None, None))
    assert(out(20L) == (None, None))
    // a right row with NULL time never matches (ASOF: l.t >= NULL is
    // false) — without the filter it would masquerade as a match with
    // a null timestamp for left rows that have no real prior
    val rightNull = Seq((2L, 93L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("user_id", "rid", "ts")
    val out2 = Joins.asofJoin(left.filter(col("event_id") === 20L), rightNull,
      "user_id", "ts", "ts", Seq("rid")).collect()(0)
    assert(out2.isNullAt(out2.fieldIndex("asof_time_us")) &&
      out2.isNullAt(out2.fieldIndex("asof_rid")))
  }

  test("rangeJoin: [start, end) boundaries, bucket-crossing intervals, each pair once") {
    import spark.implicits._
    // bucket = 100 us; interval [150, 350) spans buckets 1..3
    val intervals = Seq((1L, 7L, 150L, 350L)).toDF("k", "iid", "s", "e")
    val points = Seq(
      (1L, 100L, 149L),  // just before start -> no match
      (1L, 101L, 150L),  // at start (inclusive) -> match
      (1L, 102L, 250L),  // middle bucket -> match
      (1L, 103L, 349L),  // just before end -> match
      (1L, 104L, 350L),  // at end (exclusive) -> no match
      (2L, 105L, 250L)   // wrong key -> no match
    ).toDF("k", "pid", "pus")
    val out = Joins.rangeJoin(points, intervals, "k", "pus", "s", "e", bucketUs = 100L)
      .select(col("pid")).collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(101L, 102L, 103L))
    // a tighter bucket (interval covers many buckets) changes nothing
    val out2 = Joins.rangeJoin(points, intervals, "k", "pus", "s", "e", bucketUs = 7L)
      .select(col("pid")).collect().map(_.getLong(0)).sorted
    assert(out2.toSeq == Seq(101L, 102L, 103L))
    // empty and inverted intervals match nothing (and must not
    // replicate into descending-sequence buckets)
    import spark.implicits._
    val badI = Seq((1L, 9L, 350L, 150L), (1L, 10L, 200L, 200L)).toDF("k", "iid", "s", "e")
    assert(Joins.rangeJoin(points, badI, "k", "pus", "s", "e", bucketUs = 100L).count() == 0L)
    // negative (pre-epoch) times bucket by FLOOR division, not
    // truncate-toward-zero — the interval [-150, 50) must catch -1
    import spark.implicits._
    val negI = Seq((1L, 8L, -150L, 50L)).toDF("k", "iid", "s", "e")
    val negP = Seq((1L, 200L, -1L), (1L, 201L, -151L), (1L, 202L, 49L))
      .toDF("k", "pid", "pus")
    val neg = Joins.rangeJoin(negP, negI, "k", "pus", "s", "e", bucketUs = 100L)
      .select(col("pid")).collect().map(_.getLong(0)).sorted
    assert(neg.toSeq == Seq(200L, 202L))
  }

  test("asofJoinSkewAware == asofJoin on an adversarial corpus (whale key, edge hits, carry chains)") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val bucketUs = 60L * 1000000L // 1-minute buckets force carries
    val rnd = new scala.util.Random(42)
    // whale key 1: dense lefts+rights across many buckets; key 2:
    // rights only in early buckets (long carry chains); key 3: lefts
    // exactly at bucket starts (the carry-vs-real-right tie rule);
    // key 4: no rights at all
    val lefts = Seq.newBuilder[(Long, Long, java.sql.Timestamp)]
    val rights = Seq.newBuilder[(Long, Long, java.sql.Timestamp)]
    var id = 0L
    // distinct times per side — the (key, time)-unique determinism
    // contract both forms share
    val whaleLeftTs = rnd.shuffle((0 until 6000).toVector).take(400)
    val whaleRightTs = rnd.shuffle((0 until 6000).toVector).take(134)
    whaleLeftTs.foreach(t => lefts += ((1L, { id += 1; id }, ts(t.toLong))))
    whaleRightTs.zipWithIndex.foreach { case (t, i) =>
      rights += ((1L, 1000L + i, ts(t.toLong)))
    }
    for (i <- 0 until 40) {
      lefts += ((2L, { id += 1; id }, ts(1000L + i * 37)))
      if (i < 5) rights += ((2L, 2000L + i, ts(i.toLong * 7)))
    }
    for (i <- 0 until 10) {
      lefts += ((3L, { id += 1; id }, ts(i * 60L)))       // exactly at bucket starts
      rights += ((3L, 3000L + i, ts(i * 60L)))           // real right at the same instant
      rights += ((3L, 3100L + i, ts(i * 60L - 1)))       // and one just before the edge
    }
    lefts += ((4L, { id += 1; id }, ts(777)))
    val l = lefts.result().toDF("user_id", "event_id", "ts")
    val r = rights.result().toDF("user_id", "rid", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("event_id")).collect().map(_.toSeq).toSeq
    val plain = canon(Joins.asofJoin(l, r, "user_id", "ts", "ts", Seq("rid")))
    val skew = canon(Joins.asofJoinSkewAware(l, r, "user_id", "ts", "ts",
      Seq("rid"), bucketUs = bucketUs))
    assert(skew == plain)
    // and per-partition boundedness: the main window keys by (key, bucket)
    val plan = Joins.asofJoinSkewAware(l, r, "user_id", "ts", "ts",
      Seq("rid"), bucketUs = bucketUs).queryExecution.analyzed.toString
    assert(plan.contains("__b"), "skew form must window per (key, bucket)")
  }
  test("bloomSemiJoin == plain left_semi; exact under undersized bloom; null keys dropped") {
    import spark.implicits._
    // fact keys 0..1999 (incl. nulls), dim keys the multiples of 7 under 1000
    val fact = ((0L until 2000L).map(i => (if (i % 97 == 0) None else Some(i), s"v$i")))
      .toDF("k", "payload")
    val dim = (0L until 1000L by 7L).toDF("dk")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("k")).collect().map(_.toSeq).toSeq
    val plain = canon(fact.join(dim, col("k") === col("dk"), "left_semi"))
    // generously and pathologically sized blooms must both be EXACT:
    // the trailing semi-join removes every false positive
    for (expected <- Seq(100000L, 8L)) {
      val got = canon(Joins.bloomSemiJoin(fact, dim, "k", "dk", expectedKeys = expected))
      assert(got == plain, s"expectedKeys=$expected diverged from plain semi-join")
    }
    // every integral width accepted — IntegerType's typeName is
    // "integer" (regression: a name list keyed on "int" rejected it)
    val factInt = fact.filter(col("k") < 1000).withColumn("k", col("k").cast("int"))
    val plainInt = canon(factInt.join(dim, col("k") === col("dk"), "left_semi"))
    assert(canon(Joins.bloomSemiJoin(factInt, dim, "k", "dk")) == plainInt)
    assert(canon(Joins.bloomSemiJoin(
      factInt.withColumn("k", col("k").cast("short")), dim, "k", "dk")) == plainInt)
    // non-integral key rejected loudly
    val bad = intercept[IllegalArgumentException] {
      Joins.bloomSemiJoin(fact.withColumn("k", col("k").cast("string")), dim, "k", "dk")
    }
    assert(bad.getMessage.contains("integral"))
  }
}
