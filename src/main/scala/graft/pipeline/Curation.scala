package graft.pipeline

import graft.operators.{Dedup, ExactSubstring, Packing, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data curation run: every dedup/filter operator in
  * this library chained into the ONE job a 100-TB corpus build actually
  * launches —
  *
  *   corpus → exact dedup → line dedup → near-dup components → exact-
  *   substring gate → quality gates → [SemDeDup] → [PII scrub] → packing
  *
  * Stage order: cheap high-yield hash dedup first (exact kills byte
  * duplicates before anything tokenizes), line dedup strips cross-corpus
  * boilerplate BEFORE MinHash so shared footers don't glue unrelated pages
  * into near-dup candidates, MinHash-LSH components shrink the corpus
  * before the heavier per-occurrence substring pass, and model/heuristic
  * quality gates run last over the smallest surviving set. Reference
  * analogue: the orchestration layer of the reference's
  * run_all_benchmarks.sh (its per-suite chain of eval stages).
  *
  * Two surfaces:
  *  - [[stages]]: the pure lazy (doc_id, text) → (doc_id, text) stage
  *    chain — SQL-oracle-able end to end (q64 pins every stage's survivor
  *    count against DuckDB);
  *  - [[runCheckpointed]]: the production runner — each stage's output is
  *    a content-addressed parquet checkpoint
  *    ([[QualityPipeline.checkpointStage]]), fingerprint-chained so a
  *    rerun resumes EXACTLY after the last completed stage and any
  *    upstream change invalidates everything downstream; optional SemDeDup
  *    (embeddings) and PII-scrub stages join the chain here.
  */
object Curation {

  final case class Config(
      substringK: Int = 8,
      substringMaxDf: Long = 64,
      maxCutRatio: Double = 0.5,
      neardupThreshold: Double = 0.5,
      semThreshold: Double = 0.99,
      packBudget: Int = 256,
      packShards: Int = 8,
      quality: QualityPipeline.Config = QualityPipeline.Config())

  /** Lake-scan front end: a (doc_id, text) corpus off a [[graft.sources.PageLake]]
    * page table. doc_id = 60-bit url hash — stable across runs and layouts,
    * so every min-id canonicalization downstream (exact, line, near-dup,
    * SemDeDup) is deterministic; at 10¹² pages a 60-bit space holds the
    * collision rate ≈ n²/2⁶¹ well below one duplicate-id pair per corpus. */
  def fromLake(pages: DataFrame): DataFrame =
    pages.select(
      graft.functions.TextFunctions.hash60(col("url")).as("doc_id"),
      col("text"))

  /** Exact dedup: keep the minimum doc_id per content digest. ONE shuffle
    * (hash agg on the digest) with MAP-SIDE COMBINING — `min_by` partial-
    * aggregates, so a recrawl-heavy corpus (hundreds of captures of the
    * same page per map partition) reduces to one row per digest per map
    * task BEFORE it moves. The window formulation this replaces shuffled
    * every input row: at 200× duplication that is 200× the shuffle bytes
    * for the identical survivor set. */
  def exactStage(df: DataFrame): DataFrame =
    df.withColumn("digest", md5(col("text")))
      .groupBy("digest")
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("best"))
      .select(col("best.doc_id").as("doc_id"), col("best.text").as("text"))

  /** C4-style line dedup: documents rebuilt from surviving lines; pages
    * reduced to pure boilerplate drop out entirely. */
  def lineStage(df: DataFrame): DataFrame =
    ExactSubstring.dedupLines(df, "doc_id", "text")
      .select(col("id").as("doc_id"), col("text_dedup").as("text"))

  /** MinHash-LSH near-dup resolution: verified pairs → connected
    * components → only each component's representative (min id) survives.
    * Eager in part (the component loop iterates to a fixpoint).
    *
    * Internal band digests are the 8-byte hashed form
    * ([[Dedup.lshBandsHashed]]): the candidate window + self-join move a
    * long per band row instead of a 32-char md5 hex string, and the md5 +
    * string materialization per band disappears (same recall-safe
    * equivalence as the incremental band table — equal sig slices hash
    * equal; a cross-slice collision only merges buckets into extra
    * verify work). q15's declared md5-string band surface is untouched. */
  def neardupStage(df: DataFrame, threshold: Double): DataFrame =
    neardupStageFromSigs(df,
      Dedup.minhashSignaturesFast(df, "doc_id", "text"), threshold)

  /** [[neardupStage]] with the signature table supplied — the incremental
    * step computes signatures ONCE and shares them between the
    * within-batch stage and the cross-history band probe
    * ([[IncrementalCuration]]): the MinHash expression (one md5 per
    * shingle) is the CPU-dominant pass over the batch, and the separate
    * formulation re-ran it per stage. `sigs` must be exactly
    * `Dedup.minhashSignaturesFast(df, "doc_id", "text")` rows. */
  private[graft] def neardupStageFromSigs(df: DataFrame, sigs: DataFrame,
                                          threshold: Double): DataFrame = {
    val pairs = Dedup.jaccardVerify(df, "doc_id", "text",
        Dedup.candidatePairs(Dedup.lshBandsHashed(sigs)))
      .filter(col("jaccard") >= threshold)
    val dropIds = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    df.join(dropIds, Seq("doc_id"), "left_anti")
  }

  /** Exact-substring gate (Lee et al. 2022 stats form): drop documents
    * whose duplicated-span coverage exceeds `maxCutRatio` — pages that are
    * mostly cross-corpus duplicated token spans (mirrors, quote farms). */
  def substringStage(df: DataFrame, cfg: Config): DataFrame = {
    val keep = ExactSubstring.stats(df, "doc_id", "text",
        k = cfg.substringK, maxDf = cfg.substringMaxDf)
      .filter(col("cut_ratio") <= cfg.maxCutRatio)
      .select(col("id").as("doc_id"))
    df.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Heuristic quality gates (langid + Gopher/C4 signals): the
    * QualityPipeline stage chain's keep decision, applied to the corpus.
    * All-narrow per-row work. */
  def qualityStage(df: DataFrame, cfg: Config): DataFrame =
    QualityPipeline.qualityStage(QualityPipeline.langIdStage(df), cfg.quality)
      .filter(col("keep"))
      .select("doc_id", "text")

  /** Sequence packing over the survivors: the curated corpus laid out as
    * budget-sized training sequences. Emits the packing table (one row per
    * doc with its shard/offset/sequence assignment). */
  def packStage(df: DataFrame, cfg: Config): DataFrame =
    Packing.packSequences(
      df.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
      col("doc_id"), col("n_tokens"), budget = cfg.packBudget,
      nShards = cfg.packShards)

  /** The ordered survivor-bearing stage chain on (doc_id, text). */
  def stages(cfg: Config = Config()): Seq[(String, DataFrame => DataFrame)] = Seq(
    "exact" -> exactStage,
    "lines" -> lineStage,
    "neardup" -> (df => neardupStage(df, cfg.neardupThreshold)),
    "substring" -> (df => substringStage(df, cfg)),
    "quality" -> (df => qualityStage(df, cfg)))

  /** Per-stage survivor counts of the lazy chain plus the packed-sequence
    * count — the q64 surface. Output: (stage_no, stage, n). */
  def stageCounts(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs.select(col("doc_id").cast("long"), col("text"))
    val counts = Seq.newBuilder[(Int, String, Long)]
    counts += ((0, "input", cur.count()))
    var i = 1
    for ((name, fn) <- stages(cfg)) {
      // localCheckpoint per stage: the count action materializes the stage
      // ONCE and later stages build on the materialized result instead of
      // re-deriving the whole upstream chain per action (the checkpointed
      // runner writes parquet for the same reason — plus durability)
      cur = fn(cur).localCheckpoint()
      counts += ((i, name, cur.count()))
      i += 1
    }
    val nSeqs = packStage(cur, cfg)
      .select("shard", "seq_id").distinct().count()
    counts += ((i, "pack", nSeqs))
    counts.result().toDF("stage_no", "stage", "n")
  }

  /** Checkpointed production runner: each stage writes
    * `outDir/stage=<name>` with a fingerprint of the PREVIOUS stage's
    * output directory, so
    *  - a rerun after a crash skips every completed stage (exact resume
    *    across any stage boundary),
    *  - any change to a stage's input recomputes it AND everything
    *    downstream (content-addressed, never stale).
    * Optional stages join the chain here: SemDeDup when `embeddings`
    * (vec_id == doc_id) is given, then the PII scrub that rewrites `text`
    * before packing. Returns the per-stage output paths in order. */
  def runCheckpointed(spark: SparkSession, docs: DataFrame,
                      embeddings: Option[DataFrame], outDir: String,
                      cfg: Config = Config(),
                      // REQUIRED (no default): an empty fingerprint would
                      // mark the first stage always-fresh, so a rerun over
                      // the same outDir with DIFFERENT input would serve
                      // the previous run's outputs for the entire chain —
                      // the exact staleness this runner exists to prevent.
                      // Callers fingerprint their input directory
                      // (QualityPipeline.inputFingerprint) or pass any
                      // string that changes when the input does.
                      inputFp: String,
                      // per-stage wall-time hook (stage name, seconds spent
                      // computing+writing it — 0-cost resumes included):
                      // the bench's stage profile and a production run's
                      // dashboard feed. No-op by default.
                      onStage: (String, Double) => Unit = (_, _) => ()): Seq[(String, String)] = {
    require(inputFp.nonEmpty,
      "inputFp must identify the input content — an empty fingerprint would serve stale checkpoints on input change")
    val out = Seq.newBuilder[(String, String)]
    var fp = inputFp
    var cur = docs.select(col("doc_id").cast("long"), col("text"))

    def step(name: String)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      cur = QualityPipeline.checkpointStage(spark, body, outDir, name, fp)
      onStage(name, (System.nanoTime() - t0) / 1e9)
      val path = s"$outDir/stage=$name"
      fp = QualityPipeline.inputFingerprint(path)
      out += ((name, path))
    }

    for ((name, fn) <- stages(cfg)) step(name)(fn(cur))
    for (embs <- embeddings) {
      // release hook escapes the by-name body so the assignment cache and
      // centroid broadcast stay alive until checkpointStage's parquet
      // WRITE has completed — releasing inside the body would let a block
      // eviction between release and write force a recompute through a
      // destroyed broadcast (job failure on a real cluster)
      var release: () => Unit = () => ()
      step("semdedup") {
        // embeddings for surviving docs only; docs without a vector are kept
        val sem = Similarity.semDedupManaged(
          embs.join(cur.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
          cfg.semThreshold)
        release = sem.release
        cur.join(
          sem.df.filter(!col("keep")).select(col("vec_id").as("doc_id")),
          Seq("doc_id"), "left_anti")
      }
      release()
    }
    step("scrub") {
      cur.withColumn("pp", graft.functions.PiiFunctions.process_pii(col("text")))
        .select(col("doc_id"), col("pp.text_scrubbed").as("text"),
          col("pp.n_pii").as("n_pii"))
    }
    step("pack")(packStage(cur.select("doc_id", "text"), cfg))
    out.result()
  }
}
