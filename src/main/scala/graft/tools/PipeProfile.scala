package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): run `ExtractJob.runResumable` on a
  * prepared bench corpus at local[cores] with an in-JVM stack sampler
  * (20 ms tick over executor task threads) and print the hottest
  * frames — the guide-§1 "where is the time actually going" probe for
  * the flagship. Not part of the driver contract.
  *
  * usage: PipeProfile <cores> <docsPath> <mediaPath> [runs]
  */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val docsPath = args(1)
    val mediaPath = args(2)
    val runs = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-pipeprofile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", (cores * 2).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsPath)
    val media = spark.read.parquet(mediaPath)

    def onePass(out: String): Unit =
      graft.pipe.ExtractJob.runResumable(spark, docs, media, out): Unit

    // warmup (JIT + glyph calibration), unprofiled
    onePass(java.nio.file.Files.createTempDirectory("pp_warm").toString)

    val tally = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val selfTally = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val stacks = Thread.getAllStackTraces
        stacks.forEach { (t, frames) =>
          if (t.getName.startsWith("Executor task launch") && frames.nonEmpty) {
            // leaf-ward graft/spark frame: first frame in our packages
            val hot = frames.find { f =>
              val c = f.getClassName
              c.startsWith("graft.") || c.contains("GeneratedClass") ||
                c.startsWith("org.apache.spark.sql.catalyst") ||
                c.startsWith("org.apache.parquet") ||
                c.startsWith("java.util.regex")
            }
            val key = hot.map(f => s"${f.getClassName}.${f.getMethodName}")
              .getOrElse {
                val f = frames(0)
                s"[leaf] ${f.getClassName}.${f.getMethodName}"
              }
            tally.merge(key, 1, (a, b) => a + b)
            val leaf = frames(0)
            selfTally.merge(s"${leaf.getClassName}.${leaf.getMethodName}",
              1, (a, b) => a + b)
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to runs).foreach { _ =>
      onePass(java.nio.file.Files.createTempDirectory("pp_run").toString)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    sampler.join(500)
    println(f"[pipeprofile] $runs run(s) in $wall%.1f s at local[$cores]")
    import scala.jdk.CollectionConverters._
    def top(m: java.util.concurrent.ConcurrentHashMap[String, Integer], label: String): Unit = {
      val total = m.values.asScala.map(_.toInt).sum.max(1)
      println(s"== $label (total $total samples) ==")
      m.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, v) =>
        println(f"${v.toInt * 100.0 / total}%6.2f%% $v%6d  $k")
      }
    }
    top(tally, "attributed frames (first graft/codegen/regex frame)")
    top(selfTally, "leaf frames")
    spark.stop()
  }
}
