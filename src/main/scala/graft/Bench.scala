package graft

import graft.gen.Corpus
import graft.pipe.ExtractJob
import org.apache.spark.sql.SparkSession

/** Benchmark entry. Measures the headline metric — end-to-end
  * extraction throughput (docs/sec) — at two parallelism levels on the
  * same input (local[N] and local[4N]; the sandbox stand-in for N vs 4N
  * executors per the driver's instructions) and reports the scaling
  * efficiency, plus per-query wall times for the SparkEntry queries at
  * the 4N level. Prints ONE JSON line.
  */
object Bench {

  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .appName(s"graft-bench-$cores")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One full extraction run; returns (docs, seconds). */
  private def runExtract(spark: SparkSession, sfDir: String): (Long, Double) = {
    val docs = Corpus.documents(spark, sfDir).toDF()
    val media = Corpus.media(spark, sfDir).toDF()
    val t0 = System.nanoTime()
    val n = ExtractJob.run(spark, docs, media)
      .select("doc_id").count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val bigCores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val smallCores = math.max(1, bigCores / 4)

    // N-core run (fresh session; master is fixed per-JVM SparkContext,
    // so stop between levels)
    val sN = session(smallCores)
    sN.sparkContext.setLogLevel("WARN")
    runExtract(sN, sfDir) // warmup at small scale: JIT + engine init
    val (docsN, secN) = runExtract(sN, sfDir)
    sN.stop()

    // 4N-core run
    val s4 = session(bigCores)
    s4.sparkContext.setLogLevel("WARN")
    val (docs4, sec4) = runExtract(s4, sfDir)
    val tpN = docsN / secN
    val tp4 = docs4 / sec4
    val eff = tp4 / (4.0 * tpN)

    // per-query timings at the 4N level
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(s4, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -1.0)
    }
    s4.stop()

    val qs = queryTimes.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"extract_docs_per_sec","value":${f"$tp4%.2f"},"unit":"docs/sec",""" +
        s""""docs":$docs4,"seconds_4n":${f"$sec4%.2f"},""" +
        s""""cores_n":$smallCores,"cores_4n":$bigCores,""" +
        s""""docs_per_sec_n":${f"$tpN%.2f"},"docs_per_sec_4n":${f"$tp4%.2f"},""" +
        s""""scaling_efficiency":${f"$eff%.3f"},""" +
        s""""queries":$qs,"sf":"$sfDir"}""")
  }
}
