package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Table IO indirection. Production target is Iceberg v2 (`writeTo`
  * with snapshot isolation — the manifest/resume design in ExtractJob
  * assumes snapshot-id lineage); this sandbox ships no Iceberg runtime
  * jar (verified against /opt/spark/jars), so the layer falls back to
  * plain parquet paths with the same call shape. Swapping `FORMAT` to
  * "iceberg" and paths to catalog identifiers is the only deployment
  * change — no pipeline code touches a format string directly.
  */
object Tables {

  /** True when an Iceberg catalog/runtime is on the classpath. */
  lazy val icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: Throwable => false }

  /** Dispatch rule, factored out so the branch is unit-testable even
    * where only one side can execute: catalog identifiers (no "/") go
    * to Iceberg when the runtime is present; filesystem paths always
    * go to parquet.
    */
  def useIceberg(table: String): Boolean = useIceberg(table, icebergAvailable)
  def useIceberg(table: String, icebergOnClasspath: Boolean): Boolean =
    icebergOnClasspath && !table.contains("/")

  def read(spark: SparkSession, table: String): DataFrame =
    if (useIceberg(table)) spark.read.format("iceberg").load(table)
    else spark.read.parquet(table)

  def write(df: DataFrame, table: String, mode: String = "overwrite"): Unit =
    if (useIceberg(table)) mode match {
      // the Iceberg path must honor `mode` like the parquet path does —
      // unconditional createOrReplace() would wipe a table a caller
      // asked to append to
      case "append" => df.writeTo(table).append()
      case "overwrite" => df.writeTo(table).createOrReplace()
      case m => throw new IllegalArgumentException(
        s"unsupported Iceberg write mode '$m' (append | overwrite)")
    }
    else df.write.mode(mode).parquet(table)

  def append(df: DataFrame, table: String): Unit =
    if (useIceberg(table)) df.writeTo(table).append()
    else df.write.mode("append").parquet(table)
}
