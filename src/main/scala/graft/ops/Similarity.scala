package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale playbook:
  *  - brute-force cosine top-k — exact, one pass, fine when the query
  *    set is small (broadcast) even at huge corpus size;
  *  - random-hyperplane LSH buckets — the scale path: candidates only
  *    meet within a bucket, turning the quadratic all-pairs into a
  *    per-bucket join (IVF-style routing without a trained codebook,
  *    so it stays deterministic).
  *
  * Dot products are `aggregate(zip_with(...))` column expressions:
  * whole-stage codegen, no UDF.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k most-similar vectors to one query vector (brute
    * force). The query is a literal array -> broadcast by construction;
    * the scan is embarrassingly parallel, the only shuffle is the
    * final top-k (a single reduction).
    */
  def bruteForceTopK(embeddings: DataFrame, query: Seq[Float], k: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    embeddings
      .select(col(idCol), round(cosine(col(vecCol), q), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane p (components in
    * [-0.5, 0.5), Det-keyed).
    */
  private def planeCol(p: Int, dim: Int): Column =
    array((0 until dim).map { d =>
      lit(graft.util.Det.double01(graft.util.Det.at(0xb00cL + p, d.toLong)) - 0.5)
    }: _*)

  /** Sign-random-projection bucket id: `planes` deterministic
    * hyperplanes; bit i = sign of dot(v, plane_i).
    */
  def lshBucket(vec: Column, dim: Int, planes: Int = 12): Column =
    (0 until planes).map { p =>
      when(dot(vec, planeCol(p, dim)) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k via LSH buckets: queries join only their own bucket(s).
    * Returns per-query candidates ranked by cosine. Exactness is
    * traded for the bucket restriction (the standard ANN contract).
    *
    * Multi-probe: each query additionally probes the `probes` buckets
    * reached by flipping the planes whose margin |dot(q, plane)| is
    * smallest — the standard multi-probe LSH order (the boundary a
    * vector sits closest to is the one its true neighbors most likely
    * fell across). probes=0 is single-bucket. Probe buckets are
    * disjoint slices of the corpus, so candidates never duplicate;
    * recall grows with probes at probes× the candidate cost, without
    * re-hashing or extra tables.
    */
  def annTopK(embeddings: DataFrame, queries: DataFrame, dim: Int, k: Int = 10,
              planes: Int = 12, probes: Int = 0,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val emb = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, planes))
    val masks = array((0 until planes).map(p => lit(1L << p)): _*)
    val qs0 = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("__dots",
        array((0 until planes).map(p => dot(col("qv"), planeCol(p, dim))): _*))
      .withColumn("__bucket",
        (0 until planes).map { p =>
          when(element_at(col("__dots"), p + 1) >= 0, lit(1L << p)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)))
    // planes ordered by |margin| ascending; flip the closest `probes`
    val flips = transform(
      slice(sort_array(array((0 until planes).map { p =>
        struct(abs(element_at(col("__dots"), p + 1)).as("m"), lit(p).as("p"))
      }: _*)), 1, math.min(math.max(probes, 0), planes)),
      x => col("__bucket").bitwiseXOR(element_at(masks, x("p") + 1)))
    val qs = qs0
      .withColumn("bucket", explode(concat(array(col("__bucket")), flips)))
      .drop("__dots", "__bucket")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    qs.join(emb, Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim", round(cosine(col("qv"), col("v")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("sim"), col("rn"))
  }
}
