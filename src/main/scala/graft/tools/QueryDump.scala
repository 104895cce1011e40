package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run a subset of [[graft.SparkEntry.queries]] by name and
  * dump each result to `outDir/<name>` parquet — the fast inner loop
  * for verifying ONE new query against its DuckDB oracle without
  * paying for the full Verify sweep. Not part of the driver contract.
  *
  * usage: QueryDump <sfDir> <outDir> <name1,name2,...>
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.split(",").foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[querydump] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
