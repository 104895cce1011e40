package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** One-pass, schema-dynamic corpus profiling — the data-quality step
  * a curation pipeline runs before it filters anything: per column,
  * row/null counts, a KMV approximate-distinct estimate, and min/max
  * rendered as strings. ONE aggregation job regardless of column
  * count (every statistic is an agg expression over the same scan;
  * the wide single-row result melts to one row per column driver-side
  * — C x 5 scalars, never data).
  *
  * Works on any DataFrame — columns of array/struct/map type get
  * null/row counts only (no ordering, no hashable scalar identity).
  */
object Profile {

  def columns(df: DataFrame, kmvK: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val kmv = udaf(new Sketches.KmvDistinct(kmvK), Encoders.scalaLong)
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    def isScalar(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType | BinaryType => false
      case _ => true
    }
    val fields = df.schema.fields
    require(fields.map(_.name).distinct.length == fields.length,
      "profile requires distinct column names")
    val aggs = fields.flatMap { f =>
      // backtick-quote the name: a bare col("a.b") parses the dot as
      // nested-field access and fails to resolve
      val c = col("`" + f.name.replace("`", "``") + "`")
      val scalar = isScalar(f.dataType)
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__null_${f.name}")) ++
        (if (scalar) Seq(
          // null maps to a fixed sentinel hash: approx_distinct counts
          // null as one value (total function, no per-column filter)
          kmv(coalesce(xxhash64(c), lit(Long.MinValue + 11)))
            .as(s"__dist_${f.name}"),
          min(c).cast("string").as(s"__min_${f.name}"),
          max(c).cast("string").as(s"__max_${f.name}"))
        else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = fields.map { f =>
      val scalar = isScalar(f.dataType)
      (f.name, f.dataType.simpleString,
        row.getAs[Long](s"__cnt_${f.name}"),
        row.getAs[Long](s"__null_${f.name}"),
        if (scalar) row.getAs[Long](s"__dist_${f.name}") else -1L,
        if (scalar) Option(row.getAs[String](s"__min_${f.name}")).getOrElse("") else "",
        if (scalar) Option(row.getAs[String](s"__max_${f.name}")).getOrElse("") else "")
    }
    out.toSeq.toDF("column", "dtype", "n_values", "n_nulls",
      "approx_distinct", "min_value", "max_value")
  }
}
