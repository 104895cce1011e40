package graft.tools

import graft.pipe.ExtractJob
import org.apache.spark.sql.SparkSession

/** Dev tool: run the resumable pipeline once on a prepared bench corpus
  * and dump the final (post-AQE) executed plan of every query, so
  * serial stages / surprise coalescing are visible. Not part of the
  * driver contract.
  *
  * usage: PlanDump <cores> <docsPath> <mediaPath>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit =
        plans.add(f -> qe.executedPlan.toString)
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    })
    val out = java.nio.file.Files.createTempDirectory("graft_plandump").toString
    val docs = spark.read.parquet(args(1))
    val media = spark.read.parquet(args(2))
    ExtractJob.runResumable(spark, docs, media, out)
    Thread.sleep(2000)
    plans.forEach { case (f, p) =>
      println(s"========== $f ==========")
      println(p)
    }
    spark.stop()
  }
}
