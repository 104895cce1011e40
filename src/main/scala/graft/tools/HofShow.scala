package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the lambdafunction-bearing lines of named queries'
  * optimized plans. usage: HofShow q45_paragraph_dedup[,more] [sfDir]
  */
object HofShow {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-hofshow")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      println(s"===== $name")
      plan.linesIterator.filter(_.contains("lambdafunction"))
        .foreach(l => println(l.trim.take(400)))
    }
    spark.stop()
  }
}
