package graft.pipe

import graft.ocr.EnginePool
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kernel output row. Top-level (not nested in the object): a nested
  * case class carries an outer pointer that knocks the Dataset encoder
  * out of whole-stage codegen.
  */
final case class OcrRow(content_hash: String, ocr_text: String, ocr_conf: Double)

/** Per-ref kernel output (one row per needed media_ref). */
final case class RefOcr(media_ref: String, ocr_text: String, ocr_conf: Double)

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
  * per DISTINCT media content — rows are hash-partitioned by
  * `sha2(bytes,256)` and the kernel memoizes per hash, replacing the
  * reference's path-keyed OCR cache (`app2.py:329-379`) with strictly
  * better hit semantics at ONE media scan + ONE bytes shuffle. The
  * join back to span rows is where the Zipf media skew lives; it is
  * salted (`saltBuckets`) by exploding the small per-ref side S ways
  * so no single ref lands on one task — with AQE skew-join as the
  * runtime backstop. All relational stages stay in whole-stage
  * codegen; the only row-at-a-time code is the kernel itself and the
  * one summarizer call per output document.
  */
object ExtractJob {

  /** quality knob (v2, `app2.py:854-863`): low | medium | high.
    * inputPartitions: optional explicit repartition width at ingest
    * (0 = none — the default: an input-wide shuffle buys nothing the
    * downstream needs, since the media branch re-shuffles by
    * content_hash at pinned width and the assembly groupBy shuffles by
    * doc_id anyway; scan-split granularity governs map-side
    * parallelism). Set > 0 only for pathological inputs (e.g. one
    * giant unsplittable file).
    */
  final case class Config(
      quality: String = "medium",
      saltBuckets: Int = 8,
      outputBuckets: Int = 64,
      inputPartitions: Int = 0,
      maxMediaBytes: Long = 16L * 1024 * 1024,
      language: String = "eng",
      // OPT-IN raster pre-stages, applied in order before the quality
      // chain: "deskew" (Hough-vote angle estimate + rotate-out) and
      // "denoise" (3x3 median). The north_star prose names both; the
      // reference CODE has neither (SURVEY discrepancy note), so the
      // default is OFF — span-equality fixtures are unchanged unless a
      // deployment opts in for crooked/speckled scans.
      preStages: Seq[String] = Nil)

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

  /** quality -> OCR engine mode (the v2 tesseract-config table,
    * `app2.py:345-353`): low -> fast, high -> accurate, else standard.
    */
  def ocrModeFor(quality: String): String = quality match {
    case "low" => "fast"
    case "high" => "accurate"
    case _ => "standard"
  }

  /** One media item -> (text, confidence). Single images go straight
    * to the engine; multi-page 'GPDF' containers (the PDF flow,
    * `app.py:744-792`) OCR page by page, join page texts with "\n\n"
    * (`app.py:791`) and average the POSITIVE page confidences
    * (`app.py:757-792`) — S4/S5/S6: page count, per-page rasterized
    * decode, and the whole-document fallback shape.
    */
  def decodeMedia(engine: graft.ocr.OcrEngine, bytes: Array[Byte],
                  quality: String, ocrMode: String,
                  preStages: Seq[String] = Nil): (String, Double) =
    if (graft.ops.Multimodal.kindOf(bytes) == "pdf") {
      val results = graft.ops.Multimodal.pdfPages(bytes)
        .map(engine.decode(_, quality, ocrMode, preStages))
      val pos = results.map(_.avgConfidence).filter(_ > 0)
      (results.map(_.text).mkString("\n\n"),
        if (pos.nonEmpty) pos.sum / pos.size else 0.0)
    } else {
      val d = engine.decode(bytes, quality, ocrMode, preStages)
      (d.text, d.avgConfidence)
    }

  /** (doc_id, kind, text, media_ref, offset) span rows — explode_outer
    * so a doc with an empty/null spans array still emits a (null-kind)
    * row. Stateless; shared by the batch and streaming forms.
    */
  private[graft] def explodedSpans(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode_outer(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind"), col("s.text"), col("s.media_ref"), col("s.offset"))

  /** The text + sentinel branch (ONE pass over the non-media rows).
    * S2 ingest guard: the kind allowlist (the extension-allowlist
    * analog, app.py:317-320) drops unknown kinds from the span
    * sequence — but every dropped span (and every doc whose spans
    * array was empty: explode_outer's null row) becomes a null-kind
    * doc-preservation SENTINEL instead of vanishing. assembleDocs
    * filters sentinels out of the sequence but keeps the doc_id in
    * the groupBy, so a document whose spans all vanish still yields
    * an (empty-text, confidence-0) output row. Text spans take the
    * direct-text bypass (S7, app.py:636-649) — cleanup + 90/70
    * confidence rule, all codegen; never the kernel. Stateless;
    * shared by the batch and streaming forms.
    */
  private[graft] def textBranch(exploded: DataFrame): DataFrame = {
    val isText = col("kind") === "text"
    exploded
      .filter(!(col("kind") <=> "media"))
      .select(
        col("doc_id"),
        when(isText, col("kind")).otherwise(lit(null).cast("string")).as("kind"),
        // native collapse+trim kernel (round-6): byte-identical to
        // trim(regexp_replace(text, "\s+", " ")), one pass, no regex
        when(isText, graft.functions.GraftFunctions.collapseWs(col("text")))
          .otherwise(lit("")).as("text"),
        when(isText, col("media_ref")).otherwise(lit("")).as("media_ref"),
        when(isText, col("offset")).otherwise(lit(null).cast("int")).as("offset"),
        when(isText,
          when(length(trim(col("text"))) > 50, lit(90.0)).otherwise(lit(70.0)))
          .otherwise(lit(0.0)).as("confidence"))
  }

  /** Per-span extraction: returns
    * spans(doc_id, kind, text, media_ref, offset, confidence).
    */
  def extractSpans(spark: SparkSession, docs: DataFrame, media: DataFrame,
                   cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    // fail fast on an unknown language AT PLAN TIME: at 10^12 docs a bad
    // config must not surface as per-task failures (x retries x tasks)
    // deep into the job — fontFor throws the tesseract-style
    // missing-traineddata error on the driver instead. Same invariant
    // for preStages: a typo'd stage name must fail here, not in every
    // task's first decode.
    graft.codec.Glyphs.fontFor(cfg.language): Unit
    cfg.preStages.foreach { s =>
      require(Set("deskew", "denoise", "median").contains(s),
        s"unknown preStage '$s' (supported: deskew, denoise, median)")
    }

    val nParts = spark.sparkContext.defaultParallelism * 2
    // explode_outer: a doc with an empty/null spans array still emits a
    // (null-kind) row — "one output row per input document" must hold
    // on adversarial input, not just the fixture corpus.
    val maybeRepartitioned =
      if (cfg.inputPartitions > 0) docs.repartition(cfg.inputPartitions, $"doc_id")
      else docs
    val exploded = explodedSpans(maybeRepartitioned)
    val textOut = textBranch(exploded)

    // --- media branch
    val mediaSpans = exploded
      .filter($"kind" === "media")
      .select($"doc_id", $"kind", $"media_ref", $"offset")

    // only media actually referenced is read/decoded (semi-join prune);
    // S3 size cap mirrors MAX_CONTENT_LENGTH = 16 MB (app.py:230).
    //
    // ONE media scan, ONE shuffle of the bytes: rows are hash-
    // partitioned by content_hash at an explicitly pinned width —
    // REPARTITION_BY_NUM is exempt from AQE partition coalescing, which
    // otherwise merges the tiny-by-bytes but decode-heavy kernel input
    // into a single task (measured: the whole OCR stage as one 1s task
    // at 8 cores). The kernel memoizes per content_hash inside the
    // task; the hash partitioning makes that memo GLOBAL decode-once
    // (every row of a hash lands in exactly one task) — the cache-hit
    // semantics of the reference's OCR cache (C5/P1, app2.py:329-379)
    // without a dropDuplicates aggregate (which compiled to a
    // SortAggregate over the binary column and a second media scan for
    // the ref->hash side).
    val neededRefs = mediaSpans.select($"media_ref").distinct()
    val mode = preprocessModeFor(cfg.quality)
    val ocrMode = ocrModeFor(cfg.quality)
    val quality = cfg.quality
    // the reference threads `language` into every OCR call
    // (`-l {language}`, app.py:579); here it selects the per-executor
    // engine's decode tables (mode x language grid in EnginePool)
    val language = cfg.language
    val preStages = cfg.preStages
    val refOcr = media
      .filter(length($"bytes") <= cfg.maxMediaBytes)
      .join(neededRefs, Seq("media_ref"), "left_semi")
      .select($"media_ref", $"bytes", sha2($"bytes", 256).as("content_hash"))
      .repartition(nParts, $"content_hash")
      .as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        val engine = EnginePool.get(mode, language) // lazy per-executor engine pool
        val memo = scala.collection.mutable.HashMap.empty[String, OcrRow]
        it.map { case (ref, bytes, h) =>
          val r = memo.getOrElseUpdate(h, {
            val (text, conf) = decodeMedia(engine, bytes, quality, ocrMode, preStages)
            OcrRow(h, text, conf)
          })
          RefOcr(ref, r.ocr_text, r.ocr_conf)
        }
      }
      .toDF()

    // salted join back: explode the small (one row per distinct ref)
    // side saltBuckets ways, key the span side by a uniform salt —
    // Zipf-hot refs spread across saltBuckets tasks. AQE skew-join
    // remains enabled on top.
    val s = math.max(1, cfg.saltBuckets)
    val saltedOcr = refOcr
      .withColumn("salt", explode(lit((0 until s).toArray)))
    // LEFT join: a dangling or size-capped media_ref must surface as
    // an empty span with confidence 0 (the reference's OCR-failure
    // shape, app.py:602), never silently drop the span from the
    // sequence — the north rule checks order completeness.
    val mediaOut = mediaSpans
      .withColumn("salt", pmod(xxhash64($"doc_id", $"offset"), lit(s)).cast("int"))
      .join(saltedOcr, Seq("media_ref", "salt"), "left")
      .select($"doc_id", $"kind",
        coalesce($"ocr_text", lit("")).as("text"),
        $"media_ref", $"offset",
        coalesce($"ocr_conf", lit(0.0)).as("confidence"))

    textOut.unionByName(mediaOut)
  }

  /** Aggregate step of document assembly: one row per doc_id with `sp`,
    * the offset-sorted span structs (doc-preservation sentinels — null
    * kind — removed from the sequence; the doc_id itself survives the
    * groupBy regardless). Kept separate from [[finishDocs]] so a
    * repartition can sit between them: range partitioning SAMPLES its
    * child plan, and sampling must never re-run the summarizer.
    */
  def assembleSpans(spark: SparkSession, extractedSpans: DataFrame): DataFrame = {
    import spark.implicits._
    // Lambda-free (round-4 verdict: finishDocs' per-doc HOFs were the
    // pipeline's last interpreted expressions): sentinels are dropped
    // BY collect_list itself (it skips null inputs; filtering commutes
    // with the sort), and the doc-level confidence mean / media count
    // ride the same aggregate as plain conditional aggregates instead
    // of per-doc array folds — map-side combinable, codegen'd.
    extractedSpans
      .groupBy($"doc_id")
      .agg(
        sort_array(collect_list(when($"kind".isNotNull, struct(
          $"offset", $"kind", $"text", $"media_ref", $"confidence")))).as("sp"),
        // DECIMAL-summed mean: decimal addition is exact and
        // commutative, so the result is independent of partition/merge
        // order (a raw double avg can drift one ULP with scheduling —
        // the old offset-ordered fold was bit-deterministic and the
        // pipeline's determinism contract must survive the rewrite);
        // the <= 1e-12 quantization sits far inside the 4-dp rounding
        // and the specs' 1e-9 tolerance
        avg(when($"confidence" > 0, $"confidence").cast("decimal(24,12)"))
          .cast("double").as("__conf"),
        sum(when($"kind" === "media", 1L).otherwise(0L)).cast("int").as("__media_count"))
  }

  /** Projection step of document assembly: spans spliced back in offset
    * order (the north-rule sequence), full text = "\n\n"-joined span
    * texts (multi-page concat, `app.py:791`), document confidence =
    * mean of positive span confidences (`app.py:757-792`), plus summary
    * + compression ratio (`app.py:2026-2034`). Extra columns on the
    * input (e.g. bucket) pass through.
    */
  def finishDocs(spark: SparkSession, assembled: DataFrame): DataFrame = {
    import spark.implicits._
    val summarizeUdf = udf { (text: String) => graft.text.Summarizer.summarize(text, 0.3) }
    assembled
      // back to input_hint field order, offset kept per span:
      // arrays_zip over GetArrayStructFields extracts — a positional
      // re-zip in whole-stage codegen (field names verified to carry
      // through the extract), not a per-element lambda
      .withColumn("spans", arrays_zip(
        $"sp.kind", $"sp.text", $"sp.media_ref", $"sp.offset", $"sp.confidence"))
      .withColumn("text", array_join($"sp.text", "\n\n"))
      .withColumn("confidence", coalesce($"__conf", lit(0.0)))
      .withColumn("media_count", $"__media_count")
      .drop("sp", "__conf", "__media_count")
      .withColumn("summary", summarizeUdf($"text"))
      .withColumn("compression_ratio",
        when(length($"text") > 0, length($"summary").cast("double") / length($"text"))
          .otherwise(lit(0.0)))
  }

  /** Assemble per-document output (aggregate + projection). */
  def assembleDocs(spark: SparkSession, extractedSpans: DataFrame): DataFrame =
    finishDocs(spark, assembleSpans(spark, extractedSpans))

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

  /** Lineage id of the input table: the sha-256 of the sorted input
    * file listing, which changes iff the set of input files changes
    * (an Iceberg deployment would swap in the table's snapshot-id
    * here; the sandbox ships no Iceberg jar, so the file-listing hash
    * is the implemented lineage key). "inline" marks a purely
    * in-memory input. [[runResumable]] REFUSES to resume when the
    * manifest was committed under a different id — resuming against
    * changed input would silently mix buckets from two inputs.
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

    // existence probe instead of read-and-catch: a fresh outDir is the
    // normal case, not an exception (and the failed read spams the logs
    // with a FileNotFoundException stack on every first run)
    val mHPath = new org.apache.hadoop.fs.Path(manifestPath)
    val mFs = mHPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an EXISTING but unreadable/mis-schemaed manifest must fail, not
    // fall back to empty: an empty priorSnapshots bypasses the lineage
    // guard below, and dynamic partition overwrite then leaves any
    // bucket absent from the new input holding its stale old-input
    // files — exactly the mixed-lineage output the guard exists to stop
    val (committed: Set[Int], priorSnapshots: Set[String]) =
      if (!mFs.exists(mHPath)) (Set.empty[Int], Set.empty[String])
      else try {
        val m = spark.read.parquet(manifestPath)
          .select($"bucket", $"input_snapshot_id").as[(Int, String)].collect()
        (m.map(_._1).toSet, m.map(_._2).toSet)
      } catch {
        case e: Throwable => throw new IllegalStateException(
          s"manifest at $manifestPath exists but cannot be read — refusing to " +
            s"resume blind (a bypassed lineage guard can mix inputs in the " +
            s"output); repair or remove the manifest to proceed", e)
      }
    // lineage guard: a resumed run against changed input would mix
    // buckets computed from two different inputs — fail loudly instead
    if (priorSnapshots.nonEmpty && priorSnapshots != Set(snapshotId))
      throw new IllegalStateException(
        s"refusing to resume: manifest at $manifestPath was committed from input " +
          s"snapshot(s) ${priorSnapshots.mkString(",")} but the current input is " +
          s"$snapshotId — start a fresh outDir or re-point at the original input")

    val withBucket = docs.withColumn("bucket", bucketCol(cfg.outputBuckets))
    val pending = if (committed.isEmpty) withBucket
      else withBucket.filter(!$"bucket".isin(committed.toSeq: _*))
    // the emptiness probe is itself a scan of the input — only worth it
    // when a previous run committed something (fresh runs never skip)
    if (committed.nonEmpty && pending.isEmpty)
      return RunSummary(0L, 0L, 0L, 0, snapshotId)

    val obs = new org.apache.spark.sql.Observation()
    val stats = udaf(new BucketManifestAgg(cfg.outputBuckets))
    // north_rule: explicit repartitionByRange on doc_id — clusters each
    // bucket's files by doc range (ordered output, prunable). The range
    // exchange sits BETWEEN the assembly aggregate and the finishing
    // projection: range partitioning samples its child, and the child
    // here is the cheap (doc_id, sp, bucket) aggregate — the summarizer
    // UDF runs strictly after the exchange, exactly once per document.
    val assembled = assembleSpans(spark,
        extractSpans(spark, pending.drop("bucket"), media, cfg))
      .withColumn("bucket", bucketCol(cfg.outputBuckets))
      .repartitionByRange(cfg.outputBuckets, col("bucket"), col("doc_id"))
    // span_count is fed to the aggregate as an expression, NOT
    // materialized as a column: the written parquet schema must stay
    // identical to run()'s output (round-2 ADVICE — a derived metric
    // column silently leaked into the committed output format).
    val out = finishDocs(spark, assembled)
      .observe(obs, stats($"bucket", size($"spans"), $"media_count", $"confidence")
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
