package graft

import graft.ops.Colloc
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CollocSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-colloc")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("PMI collocations: planted sticky pair ranks above a chance pair, minCount floors, hand-checked value") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 'hong kong' always adjacent (4x); filler words are frequent but
    // pair randomly; 'rare gem' appears once -> floored out at min 2
    val docs = Seq(
      (1L, "visit hong kong the city the port"),
      (2L, "hong kong the harbour of the east"),
      (3L, "the lights of hong kong the night"),
      (4L, "hong kong rare gem of the coast")
    ).toDF("doc_id", "text")
    val out = Colloc.pmiCollocations(docs, minCount = 2, k = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    val byPair = out.toMap
    assert(byPair.contains(("hong", "kong")))
    assert(!byPair.contains(("rare", "gem")), "minCount floors singleton pairs")
    // hand value: c2=4 over Nb = 4 docs x 6 bigram positions = 24;
    // c1(hong)=c1(kong)=4 over Nu=28 tokens
    val exp = math.log((4.0 / 24.0) / ((4.0 / 28.0) * (4.0 / 28.0)))
    assert(byPair(("hong", "kong"))._2 == math.round(exp * 10000) / 10000.0)
    // the perfectly-sticky pair outranks any 'the'-based pair
    val ranked = out.map(_._1)
    val theIdx = ranked.indexWhere(p => p._1 == "the" || p._2 == "the")
    val hkIdx = ranked.indexOf(("hong", "kong"))
    assert(hkIdx >= 0 && (theIdx == -1 || hkIdx < theIdx))
    // k truncation
    assert(Colloc.pmiCollocations(docs, minCount = 2, k = 1).collect().length == 1)
  }
}
