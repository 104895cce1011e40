package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): write `.explain("formatted")` output
  * of named [[graft.SparkEntry.queries]] to `<outDir>/<name>_<tag>.txt`
  * — the plans/r06 evidence files. Not part of the driver contract.
  *
  * usage: ExplainDump <sfDir> <outDir> <tag> <name1,name2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args
    val cpus = math.min(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, 8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explaindump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
