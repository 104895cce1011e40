package graft.tools

import graft.gen.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (optimization round, the sf1-class scale probe): prepare a
  * `repl`-replicated corpus (the same distinct-docs / distinct-media
  * replication Bench.prepare uses — at repl 360 on sf0.1 that is 1.8 M
  * docs, 10× the bench corpus) and time `ExtractJob.runResumable` once
  * after a warmup, printing docs/s plus total shuffle read/write bytes
  * — written evidence that the pipeline's throughput and shuffle
  * volume extrapolate linearly, not a driver artifact (the frozen
  * Bench protocol stays the artifact of record). Not part of the
  * driver contract.
  *
  * usage: ScaleProbe <sfDir> <repl> <cores> [warmupRepl]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repl = args(1).toInt
    val cores = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaleprobe-$cores")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // same replication shape as Bench.prepare (distinct doc ids and
    // media namespaces per replica — realistic dedup pressure)
    val tag = sfDir.replaceAll("[^a-z0-9.]", "_")
    val base = s"/tmp/graft_scaleprobe_${tag}_x$repl"
    val docsPath = s"$base/documents"
    val mediaPath = s"$base/media"
    if (!new java.io.File(s"$base/_READY").exists()) {
      val d = Corpus.documents(spark, sfDir).toDF()
      d.select(col("doc_id"), col("spans"),
          explode(sequence(lit(0), lit(repl - 1))).as("r"))
        .select(
          concat(lit("r"), col("r"), lit("-"), col("doc_id")).as("doc_id"),
          transform(col("spans"), s => struct(
            s("kind").as("kind"), s("text").as("text"),
            when(s("media_ref") =!= "",
              concat(lit("r"), col("r"), lit("-"), s("media_ref")))
              .otherwise("").as("media_ref"),
            s("offset").as("offset"))).as("spans"))
        .repartition(math.max(32, repl))
        .write.mode("overwrite").parquet(docsPath)
      val m = Corpus.mediaCountHint(spark, sfDir)
      spark.range(repl.toLong * m).map { j =>
        val r = (j / m).toInt
        val i = (j % m).toInt
        val ref = s"r$r-${Corpus.mediaRefFor(i)}"
        graft.gen.MediaRow(ref, graft.codec.SynthRaster.render(
          Corpus.mediaTextFor(i), graft.util.Det.hashString(ref)))
      }.toDF()
        .repartition(math.max(64, repl))
        .write.mode("overwrite").parquet(mediaPath)
      new java.io.File(s"$base/_READY").createNewFile(): Unit
    }
    System.err.println(s"[scaleprobe] corpus ready: $base")

    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead): Unit
      }
    })

    val docs = spark.read.parquet(docsPath)
    val media = spark.read.parquet(mediaPath)
    def once(label: String): Unit = {
      val out = java.nio.file.Files.createTempDirectory("scaleprobe_run").toFile
      shufWrite.set(0L); shufRead.set(0L)
      val t0 = System.nanoTime()
      val s = graft.pipe.ExtractJob.runResumable(
        spark, docs, media, out.getAbsolutePath)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] $label repl=$repl cores=$cores docs=${s.docCount} " +
        f"sec=$dt%.1f docs_per_sec=${s.docCount / dt}%.1f " +
        f"shuffle_write_mb=${shufWrite.get / 1048576.0}%.1f " +
        f"shuffle_read_mb=${shufRead.get / 1048576.0}%.1f")
      def rm(f: java.io.File): Unit = {
        val fs = f.listFiles(); if (fs != null) fs.foreach(rm); f.delete(): Unit
      }
      rm(out)
    }
    once("warmup")
    once("measured")
    spark.stop()
  }
}
