package graft

import graft.pipe.ExtractJob
import org.apache.spark.sql.SparkSession

/** One bench level in one JVM: cores docsPath mediaPath [rounds].
  * Prints `[benchone] docs=N sec=S` for the best round after warmup.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val docsPath = args(1)
    val mediaPath = args(2)
    val rounds = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", (cores * 2).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PART_BYTES", (1024 * 1024).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_STAGE_LOG")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val dur = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"dur=${dur.getOrElse(-1L)}%6d ms  ${i.name.takeWhile(_ != '\n').take(80)}")
        }
      })
    }

    def once(): (Long, Double) = {
      val docs = spark.read.parquet(docsPath)
      val media = spark.read.parquet(mediaPath)
      val t0 = System.nanoTime()
      val n = ExtractJob.run(spark, docs, media).select("doc_id").count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    once() // warmup
    val best = (1 to rounds).map(_ => once()).minBy(_._2)
    println(f"[benchone] cores=$cores docs=${best._1} sec=${best._2}%.3f")
    spark.stop()
  }
}
