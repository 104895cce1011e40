package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark entry (optimization-round tooling, guide §1.4):
  * times individual [[SparkEntry.queries]] with the NOOP sink —
  * `df.write.format("noop")` computes every column of every row and
  * discards it, so the number is the computation, not the sink or an
  * optimizer-pruned count. NOT part of the driver contract —
  * [[Bench]] stays the artifact of record; this exists so per-query
  * optimization claims can be isolated from sweep residue and host
  * noise (median of `repeats` runs, warm session).
  *
  * usage: BenchExtra <sfDir> <name1,name2,...|all> [repeats]
  * env: SPARK_GRAFT_CPUS (default 8, the sweep's query core count)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val namesArg = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 3
    val cpus = math.min(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, 8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (namesArg == "all") SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val results = names.map { name =>
      val times = (1 to repeats).map { r =>
        spark.sparkContext.setJobDescription(s"benchextra $name run$r")
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchextra] $name run$r $dt%.3f s")
        dt
      }.sorted
      val med = times(times.size / 2)
      println(f"[benchextra] $name median $med%.3f s over $repeats")
      name -> med
    }
    println(results.map { case (n, t) => s""""$n":${f"$t%.3f"}""" }
      .mkString("""{"metric":"noop_solo_sec","queries":{""", ",", "}}"))
    spark.stop()
  }
}
