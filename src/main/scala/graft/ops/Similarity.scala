package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three paths, per the scale playbook:
  *  - brute-force cosine top-k — exact, one pass, fine when the query
  *    set is small (broadcast) even at huge corpus size;
  *  - random-hyperplane LSH buckets with multi-probe — the untrained
  *    scale path: candidates only meet within a bucket, turning the
  *    quadratic all-pairs into a per-bucket join;
  *  - IVF with a deterministically trained k-means codebook — the
  *    trained scale path: vectors route to their nearest centroid,
  *    queries probe nProbe centroid buckets.
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

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the trained-codebook scale path beside
  // the LSH one: a small k-means codebook routes vectors to centroid
  // buckets; queries probe their nProbe nearest centroids. The
  // codebook is tiny by design (it IS the broadcast side); training
  // is Lloyd iterations as DataFrame aggregations, deterministic
  // (seeded init, no RNG), so the index is reproducible.
  // ------------------------------------------------------------------

  /** Squared-distance rank term to a centroid literal: |v-c|^2 =
    * |v|^2 - 2 v.c + |c|^2; |v|^2 is constant per row, dropped.
    */
  private def distRank(vec: Column, c: Array[Double]): Column = {
    val cLit = array(c.map(lit(_)): _*)
    val c2 = c.map(x => x * x).sum
    lit(c2) - lit(2.0) * dot(vec, cLit)
  }

  /** Nearest-centroid id for a vector column: position of the minimum
    * in the per-centroid distance array (first minimum wins — ties
    * break to the lower centroid id, deterministic).
    */
  def nearestCentroid(vec: Column, codebook: Array[Array[Double]]): Column = {
    val dists = array(codebook.map(c => distRank(vec, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train a deterministic IVF codebook: init = the `nCentroids`
    * vectors FIRST IN HASH ORDER of their id — a deterministic
    * pseudo-random sample spread across the corpus (taking the
    * smallest ids would stack centroids inside whatever happens to
    * come first), then `iters` Lloyd rounds, each one distributed
    * aggregation (posexplode to (cluster, dim) cells, mean per cell).
    * Empty clusters keep their previous centroid.
    */
  def trainIvf(embeddings: DataFrame, dim: Int, nCentroids: Int, iters: Int = 2,
               idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    var codebook: Array[Array[Double]] = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(nCentroids)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var it = 0
    while (it < iters) {
      val assigned = embeddings
        .select(nearestCentroid(col(vecCol), codebook).as("cl"),
          posexplode(col(vecCol)))
      val means = assigned
        .groupBy(col("cl"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val next = codebook.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      codebook = next
      it += 1
    }
    codebook
  }

  /** IVF ANN top-k: vectors bucketed by nearest centroid; each query
    * probes its `nProbe` nearest centroids (standard IVF search). The
    * codebook is a plan literal — broadcast by construction; the only
    * shuffle is the bucket join.
    */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, dim: Int,
              codebook: Array[Array[Double]], k: Int = 10, nProbe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val emb = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cl", nearestCentroid(col("v"), codebook))
    val probes = math.max(1, math.min(nProbe, codebook.length))
    // nProbe nearest centroids per query: sort the (dist, id) structs,
    // slice, explode
    val ranked = sort_array(array(codebook.zipWithIndex.map { case (c, i) =>
      struct(distRank(col("qv"), c).as("d"), lit(i).as("i"))
    }: _*))
    val qs = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("cl", explode(transform(slice(ranked, 1, probes), x => x("i"))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    qs.join(emb, Seq("cl"))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim", round(cosine(col("qv"), col("v")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("sim"), col("rn"))
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
