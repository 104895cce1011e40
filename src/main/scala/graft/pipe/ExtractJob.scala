package graft.pipe

import graft.ocr.EnginePool
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kernel output row. Top-level (not nested in the object): a nested
  * case class carries an outer pointer that knocks the Dataset encoder
  * out of whole-stage codegen.
  */
final case class OcrRow(content_hash: String, ocr_text: String, ocr_conf: Double)

/** The extraction pipeline — the reference's per-request dataflow
  * (EP1/EP2, SURVEY.md §3) re-expressed as one declarative Spark job:
  *
  *   documents ──explode──> spans ──┬─ kind=text ──cleanup──────────┐
  *                                  └─ kind=media ─join media bytes │
  *                                       │ sha2(bytes) dedup        │
  *                                       │ mapPartitions OCR kernel │
  *                                       │ join results back        │
  *                                  <──────── unionByName ──────────┘
  *   groupBy(doc_id) -> sort_array by offset -> splice -> doc text /
  *   confidence / summary -> write (bucketed, manifest-committed)
  *
  * Scale design (north_rule): the expensive operator (OCR) runs once
  * per DISTINCT media content — `sha2(bytes,256)` dedup replaces the
  * reference's path-keyed OCR cache (`app2.py:329-379`) with strictly
  * better hit semantics. The join back to span rows is where the Zipf
  * media skew lives; it is salted (`saltBuckets`) by exploding the
  * small deduped side S ways so no single (hash) key lands on one
  * task — with AQE skew-join as the runtime backstop. All relational
  * stages stay in whole-stage codegen; the only row-at-a-time code is
  * the kernel itself and the one summarizer call per output document.
  */
object ExtractJob {

  /** quality knob (v2, `app2.py:854-863`): low | medium | high.
    * inputPartitions: explicit `repartitionByRange(doc_id)` width at
    * ingest (0 = 2x default parallelism). The kernel cost per row
    * dwarfs one shuffle of the input rows, and file-split granularity
    * must never cap kernel parallelism — the north_rule's explicit
    * partitioning requirement.
    */
  final case class Config(
      quality: String = "medium",
      saltBuckets: Int = 8,
      outputBuckets: Int = 64,
      inputPartitions: Int = 0,
      maxMediaBytes: Long = 16L * 1024 * 1024)

  def preprocessModeFor(quality: String): String = quality match {
    // v2 quality -> preprocess chain (`app2.py:556-558`, `app2.py:1016-1017`):
    // low->fast, high->quality, medium (the default) -> balanced
    // (blur3 + adaptive(11,2)). "v1" selects the v1 default chain
    // (blur3 + Otsu, `app.py:545-548`) for reference-v1 behavior.
    case "low" => "fast"
    case "high" => "quality"
    case "medium" => "balanced"
    case "v1" => "default"
    case _ => "balanced"
  }

  /** Per-span extraction: returns
    * spans(doc_id, kind, text, media_ref, offset, confidence).
    */
  def extractSpans(spark: SparkSession, docs: DataFrame, media: DataFrame,
                   cfg: Config = Config()): DataFrame = {
    import spark.implicits._

    val nParts =
      if (cfg.inputPartitions > 0) cfg.inputPartitions
      else spark.sparkContext.defaultParallelism * 2
    // hash repartition here (one pass — repartitionByRange would run
    // the upstream twice for range sampling); the write side range-
    // partitions by doc_id for output clustering (runResumable).
    // explode_outer: a doc with an empty/null spans array still emits a
    // (null-kind) row — "one output row per input document" must hold
    // on adversarial input, not just the fixture corpus.
    val exploded = docs
      .repartition(nParts, $"doc_id")
      .select($"doc_id", explode_outer($"spans").as("s"))
      .select($"doc_id", $"s.kind", $"s.text", $"s.media_ref", $"s.offset")
    // S2 ingest guard: kind allowlist (the extension allowlist analog,
    // app.py:317-320); unknown kinds are dropped, not failed
    val spans = exploded.filter($"kind".isin("text", "media"))
    // doc-preservation sentinels: every span that the allowlist drops
    // (unknown kind) or that never existed (empty spans array) becomes a
    // null-kind sentinel row. assembleDocs filters sentinels out of the
    // span sequence but keeps the doc_id in the groupBy, so a document
    // whose spans all vanish still yields an (empty-text, confidence-0)
    // output row. No extra scan or join — the rows ride the same shuffle.
    val sentinels = exploded
      .filter($"kind".isNull || !$"kind".isin("text", "media"))
      .select($"doc_id", lit(null).cast("string").as("kind"),
        lit("").as("text"), lit("").as("media_ref"),
        lit(null).cast("int").as("offset"), lit(0.0).as("confidence"))

    // --- text branch: never touches the kernel (S7 direct-text bypass,
    // app.py:636-649) — cleanup + 90/70 confidence rule, all codegen.
    val textOut = spans
      .filter($"kind" === "text")
      .select(
        $"doc_id", $"kind",
        trim(regexp_replace($"text", "\\s+", " ")).as("text"),
        $"media_ref", $"offset",
        when(length(trim($"text")) > 50, lit(90.0)).otherwise(lit(70.0))
          .as("confidence"))

    // --- media branch
    val mediaSpans = spans
      .filter($"kind" === "media")
      .select($"doc_id", $"kind", $"media_ref", $"offset")

    // only media actually referenced is read/decoded (semi-join prune);
    // S3 size cap mirrors MAX_CONTENT_LENGTH = 16 MB (app.py:230)
    val neededRefs = mediaSpans.select($"media_ref").distinct()
    val neededMedia = media
      .filter(length($"bytes") <= cfg.maxMediaBytes)
      .join(neededRefs, Seq("media_ref"), "left_semi")
      .withColumn("content_hash", sha2($"bytes", 256))

    // ref -> content hash (distinct refs; tiny relative to span rows)
    val refToHash = neededMedia.select($"media_ref", $"content_hash")

    // OCR once per distinct content (the cache-hit semantics, C5/P1)
    val mode = preprocessModeFor(cfg.quality)
    val quality = cfg.quality
    val ocrResults = neededMedia
      .select($"content_hash", $"bytes")
      .dropDuplicates("content_hash")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val engine = EnginePool.get(mode) // lazy per-executor engine pool
        it.map { case (h, bytes) =>
          val r = engine.decode(bytes, quality)
          OcrRow(h, r.text, r.avgConfidence)
        }
      }
      .toDF()

    // salted join back: explode the small (deduped) side saltBuckets
    // ways, key the big side by a uniform salt — Zipf-hot hashes spread
    // across saltBuckets tasks. AQE skew-join remains enabled on top.
    val s = math.max(1, cfg.saltBuckets)
    val saltedOcr = ocrResults
      .withColumn("salt", explode(lit((0 until s).toArray)))
    // LEFT joins: a dangling or size-capped media_ref must surface as
    // an empty span with confidence 0 (the reference's OCR-failure
    // shape, app.py:602), never silently drop the span from the
    // sequence — the north rule checks order completeness.
    val mediaWithHash = mediaSpans
      .join(refToHash, Seq("media_ref"), "left")
      .withColumn("salt", pmod(xxhash64($"doc_id", $"offset"), lit(s)).cast("int"))
    val mediaOut = mediaWithHash
      .join(saltedOcr, Seq("content_hash", "salt"), "left")
      .select($"doc_id", $"kind",
        coalesce($"ocr_text", lit("")).as("text"),
        $"media_ref", $"offset",
        coalesce($"ocr_conf", lit(0.0)).as("confidence"))

    textOut.unionByName(mediaOut).unionByName(sentinels)
  }

  /** Assemble per-document output: spans spliced back in offset order
    * (the north-rule sequence), full text = "\n\n"-joined span texts
    * (multi-page concat, `app.py:791`), document confidence = mean of
    * positive span confidences (`app.py:757-792`), plus summary +
    * compression ratio (`app.py:2026-2034`).
    */
  def assembleDocs(spark: SparkSession, extractedSpans: DataFrame): DataFrame = {
    import spark.implicits._

    val summarizeUdf = udf { (text: String) => graft.text.Summarizer.summarize(text, 0.3) }

    extractedSpans
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct(
        $"offset", $"kind", $"text", $"media_ref", $"confidence"))).as("sp0"))
      // drop doc-preservation sentinels (null kind) from the sequence;
      // the doc_id itself survives the groupBy regardless
      .withColumn("sp", filter($"sp0", x => x("kind").isNotNull))
      .select(
        $"doc_id",
        // back to input_hint field order, offset kept per span
        transform($"sp", x => struct(
          x("kind").as("kind"), x("text").as("text"),
          x("media_ref").as("media_ref"), x("offset").as("offset"),
          x("confidence").as("confidence"))).as("spans"),
        array_join(transform($"sp", x => x("text")), "\n\n").as("text"),
        coalesce(
          aggregate(
            filter($"sp", x => x("confidence") > 0),
            struct(lit(0.0).as("s"), lit(0L).as("n")),
            (acc, x) => struct((acc("s") + x("confidence")).as("s"), (acc("n") + 1L).as("n")),
            acc => when(acc("n") > 0, acc("s") / acc("n"))),
          lit(0.0)).as("confidence"),
        size(filter($"sp", x => x("kind") === "media")).as("media_count"))
      .withColumn("summary", summarizeUdf($"text"))
      .withColumn("compression_ratio",
        when(length($"text") > 0, length($"summary").cast("double") / length($"text"))
          .otherwise(lit(0.0)))
  }

  /** Full run: extract + assemble. */
  def run(spark: SparkSession, docs: DataFrame, media: DataFrame,
          cfg: Config = Config()): DataFrame =
    assembleDocs(spark, extractSpans(spark, docs, media, cfg))

  // ---------------------------------------------------------------
  // Resumable, manifest-committed variant (north_rule: "resumable from
  // checkpoint with per-partition lineage + metrics").
  // ---------------------------------------------------------------

  /** Deterministic bucket of a document — the commit unit. */
  def bucketCol(n: Int) = pmod(xxhash64(col("doc_id")), lit(n.toLong)).cast("int")

  /** What a resumable run did — doc/span/media totals over the buckets
    * committed BY THIS RUN (zero when everything was already committed).
    */
  final case class RunSummary(docCount: Long, spanCount: Long, mediaCount: Long,
                              newBuckets: Int, inputSnapshotId: String)

  /** Lineage id of the input table: the Iceberg snapshot-id when the
    * plan exposes one; otherwise (parquet fallback / generated input)
    * the sha-256 of the sorted input file listing, which changes iff
    * the input files change. "inline" marks a purely in-memory input.
    */
  def inputSnapshotId(docs: DataFrame): String = {
    val files = try docs.inputFiles.sorted catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) "inline"
    else {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      files.foreach(f => d.update(f.getBytes("UTF-8")))
      "files:" + d.digest().map(b => f"$b%02x").mkString
    }
  }

  /** Run the job writing per-bucket, committing a manifest row per
    * bucket. On restart only buckets absent from the manifest are
    * recomputed; dynamic partition overwrite makes a retried bucket
    * idempotent (half-written data from a killed attempt is replaced,
    * never duplicated).
    *
    * Manifest metrics (doc/span/media counts + confidence histogram per
    * bucket) are collected by [[BucketManifestAgg]] via `observe` ON the
    * write itself — one pass total; the output path is never re-read
    * (at 10^12 docs a post-write scan of the output would double the
    * job's I/O). Each manifest row carries the input snapshot id, so a
    * resumed run can detect that it is resuming against different input.
    */
  def runResumable(spark: SparkSession, docs: DataFrame, media: DataFrame,
                   outDir: String, cfg: Config = Config()): RunSummary = {
    import spark.implicits._
    val manifestPath = s"$outDir/manifest"
    val dataPath = s"$outDir/extracted"
    val snapshotId = inputSnapshotId(docs)

    val committed: Set[Int] =
      try spark.read.parquet(manifestPath).select($"bucket").as[Int].collect().toSet
      catch { case _: Throwable => Set.empty }

    val withBucket = docs.withColumn("bucket", bucketCol(cfg.outputBuckets))
    val pending = if (committed.isEmpty) withBucket
      else withBucket.filter(!$"bucket".isin(committed.toSeq: _*))
    if (pending.isEmpty) return RunSummary(0L, 0L, 0L, 0, snapshotId)

    val obs = new org.apache.spark.sql.Observation()
    val stats = udaf(new BucketManifestAgg(cfg.outputBuckets))
    val out = run(spark, pending.drop("bucket"), media, cfg)
      .withColumn("bucket", bucketCol(cfg.outputBuckets))
      .withColumn("span_count", size($"spans"))
      // north_rule: explicit repartitionByRange on doc_id — clusters
      // each bucket's files by doc range (ordered output, prunable)
      .repartitionByRange(cfg.outputBuckets, col("bucket"), col("doc_id"))
      .observe(obs, stats($"bucket", $"span_count", $"media_count", $"confidence")
        .as("bucket_stats"))

    out.write
      .partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dataPath)

    // manifest commit AFTER the data write: a kill between the two just
    // re-runs those buckets (idempotent via dynamic overwrite).
    val rows = obs.get("bucket_stats").asInstanceOf[Seq[org.apache.spark.sql.Row]]
      .map(r => BucketStat(r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4)))
    spark.createDataset(rows).toDF()
      .withColumn("input_snapshot_id", lit(snapshotId))
      .withColumn("committed_at", current_timestamp())
      .coalesce(1)
      .write.mode("append").parquet(manifestPath)

    RunSummary(rows.map(_.doc_count).sum, rows.map(_.span_count).sum,
      rows.map(_.media_count).sum, rows.size, snapshotId)
  }
}
