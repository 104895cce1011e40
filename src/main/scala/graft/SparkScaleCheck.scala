package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: pure-Spark CPU scaling probe (no custom kernels). */
object SparkScaleCheck {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 400000000L, 1, cores * 4)
        .select(sum(pmod(xxhash64(col("id")), lit(1000L)))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    println(f"[scale] cores=$cores hash-sum best=${Seq(once(), once()).min}%.2f s")
    // allocation-heavy variant: strings + split
    def alloc(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 20000000L, 1, cores * 4)
        .select(sum(length(split(concat(lit("a b c d e f g h "), col("id")), " ")(3))))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    alloc()
    println(f"[scale] cores=$cores alloc best=${Seq(alloc(), alloc()).min}%.2f s")
    spark.stop()
  }
}
