package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of [[graft.SparkEntry.queries]] exactly the
  * way the bench sweep does — `df.count()` at full parallelism, no
  * coalesce, warm session — so per-query numbers are comparable to
  * the sweep's (QueryDump's `coalesce(1)` write serializes map-side
  * queries and wildly overstates them). Not part of the driver
  * contract.
  *
  * usage: QueryTime <sfDir> <name1,name2,...> [repeats]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { name =>
      (1 to repeats).foreach { r =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[querytime] $name run$r ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
