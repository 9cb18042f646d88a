package graft.pipeline

import graft.operators.{IncrementalDedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DAILY curation step — what a crawl pipeline runs per batch once the
  * initial corpus has been curated ([[Curation]] is the full-corpus run;
  * this is its incremental counterpart): the incoming batch is deduped
  * against persisted history state across all three duplicate classes
  * without ever re-shuffling the history —
  *
  *   1. exact     — Bloom-prefiltered digest anti-join
  *                  ([[IncrementalDedup.newOnly]]);
  *   1b. paragraph (optional, `init(withLineDedup = true)`) — within-batch
  *                  line collapse + rebuild against the seen-line digest
  *                  history ([[IncrementalDedup.newLinesOnly]]);
  *   2. near-dup  — MinHash bands vs the persisted band table
  *                  ([[IncrementalDedup.nearNewOnly]]);
  *   2b. substring spans (optional, `init(withSpanDedup = true)`) — batch
  *                  docs mostly covered by spans the persisted gram table
  *                  already holds are dropped
  *                  ([[IncrementalDedup.incrSpanStatsManaged]]);
  *   3. quality   — the langid + Gopher/C4 gate chain
  *                  ([[Curation.qualityStage]]);
  *   4. semantic  — frozen-centroid cells vs the persisted assignment
  *                  table ([[Similarity.semDedupIncremental]]) — after
  *                  quality, matching the full-corpus runner's order;
  *
  * then the survivors are APPENDED to every state table. Within-batch
  * duplicates are handled too: exact by [[Curation.exactStage]] and
  * near-dup by [[Curation.neardupStage]] over the batch alone (both run
  * BEFORE the history joins, shrinking the probe side), semantic by
  * [[Similarity.semDedupIncremental]] itself (a batch row is judged
  * against the batch's earlier-id rows as well as history).
  *
  * State tables are plain DataFrames here; a deployment persists them to
  * the lake with the layouts each join wants — digests bucketed by digest,
  * bands by band_digest, cells by cell — so every per-batch join satisfies
  * its clustering from the table layout and ONLY the batch side moves.
  */
object IncrementalCuration {

  /** The persisted history: curated docs (id, text, digest), their MinHash
    * band table, the frozen semantic quantizer and its assignment table
    * (None when the corpus has no embeddings), and — when paragraph dedup
    * is on — the seen-line digest table (the persisted form of Dolma's
    * seen-paragraphs Bloom filter; stored digest-bucketed at scale). */
  final case class State(
      docs: DataFrame,
      bands: DataFrame,
      semantic: Option[SemState],
      lines: Option[DataFrame] = None,
      grams: Option[DataFrame] = None,
      // per-host arrival counts for the admission cap (None = cap off);
      // host-dimension scale, broadcast at step time
      hosts: Option[DataFrame] = None,
      // the k the gram table was built with: probing or appending with a
      // different k would silently never match (membership always false,
      // the gate neutered) — so the step reads k from here, never from an
      // independent knob
      spanK: Int = 8)

  final case class SemState(centroids: Array[Array[Double]],
                            cells: DataFrame)

  /** Bootstrap state from an ALREADY-CURATED corpus (the output of the
    * full [[Curation]] run). */
  def init(corpus: DataFrame,
           embeddings: Option[DataFrame],
           nCells: Int = 16,
           withLineDedup: Boolean = false,
           withSpanDedup: Boolean = false,
           spanK: Int = 8): State = {
    val docs = corpus.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .withColumn("digest", md5(col("text")))
    // state tables are materialized once at birth (at scale: written to the
    // lake); later steps read them repeatedly and must not re-derive them
    val bands = IncrementalDedup.bandTable(docs, "doc_id", "text").localCheckpoint()
    val sem = embeddings.map { e =>
      val centroids = Similarity.fitSemCentroids(e, nCells)
      SemState(centroids, Similarity.assignCells(e, centroids).localCheckpoint())
    }
    val lines =
      if (!withLineDedup) None
      else Some(IncrementalDedup.lineDigests(docs, "doc_id", "text")
        .select("line_digest").distinct().localCheckpoint())
    val grams =
      if (!withSpanDedup) None
      else Some(IncrementalDedup.spanGramTable(docs, "doc_id", "text", spanK)
        .localCheckpoint())
    State(docs, bands, sem, lines, grams, spanK = spanK)
  }

  /** One daily step: returns (survivors of the batch, next state).
    * Batch ids must exceed every history id (crawl ids grow
    * monotonically — the min-id canonicalization contract of every
    * incremental operator here). The returned survivors are materialized
    * (`localCheckpoint`); at scale each append is a lake-table append. */
  def step(state: State, batch: DataFrame,
           batchEmbeddings: Option[DataFrame] = None,
           cfg: Curation.Config = Curation.Config(),
           expectedHistoryDigests: Long = 1 << 20,
           bloomShards: Int = 1,
           // line-grain history is ~30x the doc count — sizing its filter
           // with the doc-grain hint would saturate it (fpp → 1, every
           // line a suspect); default 32x the doc hint, override when the
           // real line count is known
           expectedHistoryLines: Long = -1L,
           // gram-grain history is larger still (one k-gram per token
           // before distinct); default 512x the doc hint — at real scale
           // pass the persisted gram table's row count
           expectedHistoryGrams: Long = -1L,
           // per-host admission cap over the CURATED stream (None = off).
           // Requires state.hosts (bootstrap with IncrementalSelect
           // .hostCapInit over prior curated arrivals) and a `host` column
           // on the batch. Rank space = docs that survive dedup + quality,
           // admission-ordered by doc_id (the monotonic-crawl contract), so
           // N steps equal the full first-cap window over the concatenated
           // curated stream.
           hostCapN: Option[Int] = None,
           // per-stage wall-time hook at the step's EXISTING materialization
           // boundaries (exact, lines, neardup_batch [the within-batch CC
           // fixpoint], spans, semantic, survivors [= the lazy history
           // verify join + quality chain], state appends) — the bench's
           // stage profile; no extra materialization is introduced for it.
           onStage: (String, Double) => Unit = (_, _) => ()): (DataFrame, State) = {
    var tMark = System.nanoTime()
    def mark(name: String): Unit = {
      val now = System.nanoTime()
      onStage(name, (now - tMark) / 1e9)
      tMark = now
    }
    val lineItems =
      if (expectedHistoryLines > 0) expectedHistoryLines
      else 32L * expectedHistoryDigests
    val gramItems =
      if (expectedHistoryGrams > 0) expectedHistoryGrams
      else 512L * expectedHistoryDigests
    // 0. collapse within-batch exact dups, digest the rest
    val b0 = Curation.exactStage(
        batch.select(col("doc_id").cast("long").as("doc_id"), col("text")))
      .withColumn("digest", md5(col("text")))

    // 1. exact vs history (Bloom prefilter; broadcast released after the
    //    step materializes)
    val pf = IncrementalDedup.newOnlyManaged(b0, state.docs.select("digest"),
      "digest", expectedHistoryDigests, shards = bloomShards)
    val b1 = pf.df.localCheckpoint()
    pf.release()
    mark("exact")

    // 1b. paragraph dedup (optional): within-batch line collapse
    //     (ccnetDedupLines) then rebuild against the seen-line history —
    //     BEFORE near-dup, so shared boilerplate lines can't manufacture
    //     MinHash similarity between otherwise-unrelated pages. A doc whose
    //     every line is known boilerplate drops out here.
    val b1b = state.lines match {
      case Some(ld) =>
        val within = graft.operators.ExactSubstring
          .ccnetDedupLines(b1, "doc_id", "text")
          .select(col("id").as("doc_id"), col("text_dedup").as("text"))
        val pfL = IncrementalDedup.newLinesOnlyManaged(within, ld,
          "doc_id", "text", lineItems, shards = bloomShards)
        val out = pfL.df.select(col("id").as("doc_id"),
          col("text_dedup").as("text")).localCheckpoint()
        pfL.release()
        out
      case None => b1
    }
    mark("lines")

    // 2. near-dup: within the batch first (full-corpus operator over the
    //    day — smaller probe side for the history join), then vs history
    //    (persisted band table; nearNewOnly needs history text for the
    //    Jaccard verify join)
    // both near-dup results are materialized: the within-batch survivor set
    // feeds nearNewOnly as bands + verify-side + anti-join probe (≈5 plan
    // consumers — left lazy, each re-runs the whole within-batch chain),
    // and the history-filtered set is read by the span gate's two consumers
    // and the quality chain
    val bWithin = Curation.neardupStage(b1b, cfg.neardupThreshold)
      .localCheckpoint()
    mark("neardup_batch")
    val b2 = IncrementalDedup.nearNewOnly(
      bWithin, state.docs, "doc_id", "text",
      threshold = cfg.neardupThreshold, historyBands = Some(state.bands))
      .localCheckpoint()
    mark("neardup_history")

    // 2b. substring-span gate (optional, `init(withSpanDedup = true)`):
    //     drop batch docs whose coverage by duplicated spans — within-batch
    //     OR already held by the persisted gram history — exceeds the q53
    //     ratio, the cross-batch form of Curation.substringStage. Catches
    //     the mirror that arrives a day late with light edits: near-dup
    //     misses it once enough fresh text is appended, but its token
    //     spans still match last month's corpus gram for gram. Same slot
    //     as the full run (after near-dup, before quality).
    val b2s = state.grams match {
      case Some(g) =>
        // k comes from the STATE (what the gram table was built with) —
        // probing with an independent cfg knob would silently never match
        val pfS = IncrementalDedup.incrSpanStatsManaged(b2, g,
          "doc_id", "text", k = state.spanK, maxDf = cfg.substringMaxDf,
          expectedItems = gramItems, shards = bloomShards)
        val keep = pfS.df.filter(col("cut_ratio") <= cfg.maxCutRatio)
          .select(col("id").as("doc_id"))
        val out = b2.join(keep, Seq("doc_id"), "left_semi").localCheckpoint()
        pfS.release()
        out
      case None => b2
    }
    mark("spans")

    // 3. quality gates BEFORE the semantic stage — the same order the
    //    full-corpus runner uses (Curation.runCheckpointed): a low-quality
    //    batch doc must not kill its high-quality semantic neighbor and
    //    then die itself at quality (verdicts would become
    //    batch-composition dependent)
    val b3 = Curation.qualityStage(b2s.select("doc_id", "text"), cfg)

    // 4. semantic vs history (frozen cells), when both sides have vectors
    val b4 = (state.semantic, batchEmbeddings) match {
      case (Some(sem), Some(be)) =>
        val inc = Similarity.semDedupIncremental(
          be.join(b3.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
          sem.cells, sem.centroids, cfg.semThreshold)
        val out = b3.join(
          inc.df.filter(!col("keep")).select(col("vec_id").as("doc_id")),
          Seq("doc_id"), "left_anti").localCheckpoint()
        inc.release()
        out
      case _ => b3
    }
    mark("semantic") // neardup+quality fuse into this or the survivors boundary

    // 4b. per-host admission cap (optional): LAST, so only documents that
    //     earned their place in the corpus count against their host's
    //     budget. Dropped-by-cap docs do NOT enter dedup state — state is
    //     the curated corpus, and a capped host's recrawls die here anyway.
    // the host mapping is deduped by doc_id: a duplicated input record
    // (same doc_id twice in a day's batch — a routine WARC artifact) was
    // collapsed by the exact stage, and the join back must not re-expand it
    def batchHosts = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("host"))
      .dropDuplicates("doc_id")
    val (b5, nextHosts) = (hostCapN, state.hosts) match {
      case (Some(cap), Some(hs)) =>
        val r = graft.operators.IncrementalSelect.hostCapStep(
          hs, b4.join(batchHosts, Seq("doc_id")), "host", "doc_id", "doc_id", cap)
        (r.kept.select("doc_id", "text"), Some(r.nextState.localCheckpoint()))
      case (Some(_), None) =>
        throw new IllegalArgumentException(
          "hostCapN is set but state.hosts is missing — bootstrap it with " +
            "IncrementalSelect.hostCapInit over the prior curated arrivals " +
            "(silently skipping the cap would over-admit)")
      case (None, Some(hs)) =>
        // cap off THIS step, counters still maintained: a later capped
        // step must see every curated arrival, or it over-admits relative
        // to the full-run-equivalence contract
        val counts = b4.join(batchHosts, Seq("doc_id"))
          .filter(col("host").isNotNull)
          .groupBy("host").agg(count(lit(1)).as("n_seen"))
        (b4, Some(hs.unionByName(counts)
          .groupBy("host").agg(sum("n_seen").as("n_seen")).localCheckpoint()))
      case (None, None) => (b4, None)
    }
    mark("hostcap")

    val survivors = b5.withColumn("digest", md5(col("text"))).localCheckpoint()
    mark("survivors") // the near-dup + quality chain materializes here

    // 5. append survivors to every state table, each appended piece
    //    materialized ONCE at birth like the init tables (at scale: lake
    //    appends) — lazy pieces would re-derive every prior batch's
    //    signatures/assignments on every later step
    val nextSem = (state.semantic, batchEmbeddings) match {
      case (Some(sem), Some(be)) =>
        val survEmb = be.join(
          survivors.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
        Some(sem.copy(cells = sem.cells.unionByName(
          Similarity.assignCells(survEmb, sem.centroids).localCheckpoint())))
      case (s, _) => s
    }
    val next = State(
      // the docs piece is checkpointed like every other state append: the
      // N-batch state stays a union of materialized leaves, never a chain
      // of projections the next step's verify join re-derives
      docs = state.docs.unionByName(
        survivors.select("doc_id", "text", "digest").localCheckpoint()),
      bands = state.bands.unionByName(
        IncrementalDedup.bandTable(survivors, "doc_id", "text").localCheckpoint()),
      semantic = nextSem,
      lines = state.lines.map(_.unionByName(
        IncrementalDedup.lineDigests(survivors, "doc_id", "text")
          .select("line_digest").distinct().localCheckpoint())),
      grams = state.grams.map(_.unionByName(
        IncrementalDedup.spanGramTable(survivors, "doc_id", "text", state.spanK)
          .localCheckpoint())),
      hosts = nextHosts,
      spanK = state.spanK)
    mark("appends")
    (survivors.select("doc_id", "text"), next)
  }
}
