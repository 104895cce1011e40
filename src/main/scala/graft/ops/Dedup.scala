package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines —
  * the generalization of the reference's content-memoization (its OCR
  * cache keys repeat work away, `app2.py:329-379`; these do the same
  * for whole corpora). All are declarative DataFrame programs: Catalyst
  * handles pushdown, AQE handles the skewed group sizes.
  *
  * Scale notes (100 TB): exact dedup is one hash-shuffle on a 32-byte
  * key; MinHash-LSH shuffles (band, bucket-hash) pairs — bucket sizes
  * are bounded by banding so the pair join never quadratic-explodes on
  * the full corpus, only within buckets; SimHash groups by a 16-bit
  * prefix first so candidate verification stays local per group.
  */
object Dedup {

  /** Normalized-text key used by exact dedup / fingerprinting:
    * lowercase + whitespace collapse + trim, md5.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Exact dedup: one row per distinct normalized content with the
    * group size and the keeper (minimum doc_id).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), fingerprint(col(textCol)).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** Word n-gram shingles of a document, lowercase, distinct. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = filter(split(lower(text), "\\W+"), t => t =!= "")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** MinHash signature of a shingle set: k independent permutations
    * approximated by k affine transforms of a 64-bit shingle hash.
    * Pure column expressions — stays in codegen.
    */
  private val MINHASH_PRIME = 2147483647L // 2^31 - 1 (Mersenne)

  /** Shingle strings -> 31-bit hash array (hash each shingle ONCE;
    * the k permutations below reuse it — k times cheaper than hashing
    * per permutation, and 31-bit keeps a*h+b < 2^62 under ANSI mode).
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(xxhash64(s), lit(MINHASH_PRIME)))

  /** MinHash signature over a pre-hashed shingle array. Pass this a
    * materialized column (not an inline expression) so the hashing work
    * is shared across the k mins.
    */
  def minhashSignature(hashedCol: Column, k: Int = 32): Column = {
    val sig = (0 until k).map { i =>
      val a = (graft.util.Det.at(0x5eedL, i.toLong * 2) & 0x7fffffffL) | 1L
      val b = graft.util.Det.at(0x5eedL, i.toLong * 2 + 1) & 0x7fffffffL
      array_min(transform(hashedCol, h => pmod(h * lit(a) + lit(b), lit(MINHASH_PRIME))))
    }
    array(sig: _*)
  }

  /** MinHash + LSH banding near-duplicate pairs.
    *
    * k hashes split into `bands` bands of `rowsPerBand`; docs sharing
    * any band bucket are candidates; candidates are verified by
    * estimated Jaccard (signature agreement) >= threshold. The
    * band/bucket self-join is the only shuffle that matters at scale;
    * the bucket key includes the band id so buckets stay small.
    */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5,
                 k: Int = 32, bands: Int = 8,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rowsPerBand = k / bands
    // collapse exact duplicates FIRST: clusters of identical text would
    // otherwise meet in every band bucket and blow the self-join up
    // quadratically. LSH runs over one representative per distinct
    // normalized content (standard practice at corpus scale); exact()
    // reports the identical groups separately.
    val reps = docs
      .withColumn("__fp", fingerprint(col(textCol)))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("id"), first(col(textCol)).as("__text"))
    val sigs = reps
      .withColumn("hashed", shingleHashes(shingles(col("__text"))))
      .select(col("id"), minhashSignature(col("hashed"), k).as("sig"))

    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(array_join(
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash over tokens. Single pass: one aggregate over the
    * token-hash array with a 64-vote array accumulator (each token
    * hashed once; per-bit vote +-1; bit set where the vote is
    * positive). All higher-order column functions — stays in codegen.
    */
  def simhash(text: Column): Column = {
    val toksH = transform(filter(split(lower(text), "\\W+"), t => t =!= ""),
      t => xxhash64(t))
    simhashFromHashes(toksH)
  }

  private val BIT_MASKS: Column =
    array((0 until 64).map(i => lit(1L << i)): _*)

  def simhashFromHashes(hashedCol: Column): Column = {
    val votes = aggregate(hashedCol, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, BIT_MASKS,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(zip_with(votes, BIT_MASKS, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: group by 16-bit prefix (cheap blocking),
    * verify Hamming distance <= maxDist within groups.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 8,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // same exact-duplicate collapse as minhashLsh: identical docs all
    // share a simhash and would pair quadratically within their block
    val reps = docs
      .withColumn("__fp", fingerprint(col(textCol)))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("id"), first(col(textCol)).as("__text"))
    val hashed = reps.select(col("id"), simhash(col("__text")).as("sh"))
      .withColumn("block", shiftrightunsigned(col("sh"), 48))
    val a = hashed.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = hashed.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard for candidate pairs (the precise verifier
    * behind MinHash's estimate). pairs must carry id_a/id_b.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, n: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }
}
