package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: build every SparkEntry query against an sf dir and report
  * which OPTIMIZED plans still contain an interpreted higher-order
  * function (`lambdafunction`). Queries whose remaining lambdas are
  * law-twin or genuinely-array-typed forms are listed so the
  * PlanSpec no-interpreted-HOF assert set can be kept explicit.
  *
  * usage: HofScan [sfDir]
  */
object HofScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-hofscan")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan.toString
        val hits = plan.linesIterator.filter(_.contains("lambdafunction")).size
        if (hits > 0) println(s"HOF $name lines=$hits")
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
    println("done")
  }
}
