package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-batch SELECTION state — the incremental counterparts of the
  * corpus-wide selection policies in [[Sampling]] and [[Dedup]]. The
  * duplicate classes already have daily-step forms ([[IncrementalDedup]],
  * `Similarity.semDedupIncremental`); these close the same gap for the two
  * selection policies a crawl pipeline applies per batch: per-host admission
  * caps and latest-capture-per-URL upserts.
  *
  * Both keep KEY-scale state (one row per host / per URL), never
  * document-scale: shipped documents cannot be revoked, so the incremental
  * semantics is ADMISSION — a batch row is admitted iff the full-corpus
  * policy over (history arrivals ∪ batch) would have selected it, which
  * reduces to per-key counters / per-key maxima. That reduction is what
  * makes each step one broadcast classification plus, at most, a window
  * over the handful of keys whose cap decision the batch can change.
  */
object IncrementalSelect {

  /** (admitted batch rows, updated state) for [[hostCapStep]]. */
  final case class HostCapResult(kept: DataFrame, nextState: DataFrame)

  /** Bootstrap per-host arrival counts from the prior arrivals (KEPT and
    * dropped — full-run rank equivalence needs every arrival to occupy its
    * rank, exactly like the window the corpus-wide `Sampling.hostCap` runs).
    * Map-side-combined two-column aggregate; host-dimension output. */
  def hostCapInit(history: DataFrame, hostCol: String): DataFrame =
    history.groupBy(hostCol).agg(count(lit(1)).as("n_seen"))

  /** One daily admission step of the per-host document cap: a batch row is
    * admitted iff `n_seen(host) + rank_within_batch <= cap`, where the
    * within-batch rank orders by (`tsCol` asc, `idCol` asc) — crawl arrival
    * order. Under the monotonic-crawl contract (every history `tsCol`
    * precedes every batch `tsCol`; ties within a batch break on id) this
    * equals the full-corpus first-`cap`-arrivals rule over
    * history ∪ batch restricted to batch rows — the q93 oracle recomputes
    * exactly that window over the union.
    *
    * Scale shape: the state is host-dimension (broadcast); the batch's own
    * host histogram (map-side combined) classifies hosts into
    *   - saturated (`n_seen >= cap`)            → drop without ranking,
    *   - safe      (`n_seen + n_batch <= cap`)  → admit without ranking,
    *   - boundary  (everything else)            → the only rows windowed.
    * At steady state almost every heavy host is saturated and almost every
    * tail host is safe, so the per-host sort touches a vanishing fraction
    * of the batch — the incremental analogue of `Sampling.hostCap`'s
    * heavy-tail-confined window. The corpus never shuffles; the next state
    * is a host-dimension counter merge. */
  def hostCapStep(state: DataFrame, batch: DataFrame, hostCol: String,
                  tsCol: String, idCol: String, cap: Int): HostCapResult = {
    // NULL-host rows are exempt from the cap and kept — an unknown host is
    // not a host budget (the same fall-through `Sampling.hostCap` gives
    // them: its anti-join keeps NULL-host rows unconditionally). They are
    // not counted into state either.
    val nullHost = batch.filter(col(hostCol).isNull)
    val b = batch.filter(col(hostCol).isNotNull)
    val hist = b.groupBy(hostCol).agg(count(lit(1)).as("n_batch"))
    val cls = hist.join(state, Seq(hostCol), "left")
      .na.fill(0L, Seq("n_seen"))
    val safe = cls.filter(col("n_seen") + col("n_batch") <= cap).select(hostCol)
    val boundary = cls
      .filter(col("n_seen") < cap && col("n_seen") + col("n_batch") > cap)
      .select(col(hostCol), col("n_seen"))
    val keptSafe = b.join(broadcast(safe), Seq(hostCol), "left_semi")
    val w = Window.partitionBy(hostCol).orderBy(col(tsCol).asc, col(idCol).asc)
    val keptBoundary = b.join(broadcast(boundary), Seq(hostCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") + col("n_seen") <= cap)
      .drop("__rn", "n_seen")
    // saturated hosts fall through both semi-joins — dropped without a sort
    val nextState = state
      .unionByName(hist.withColumnRenamed("n_batch", "n_seen"))
      .groupBy(hostCol).agg(sum(col("n_seen")).as("n_seen"))
    HostCapResult(keptSafe.unionByName(keptBoundary).unionByName(nullHost),
      nextState)
  }

  /** (URLs whose best capture the batch improved, updated state) for
    * [[latestCaptureStep]]. `upserts` carries the new winning row plus the
    * cumulative `n_captures` across history and batch. */
  final case class LatestResult(upserts: DataFrame, nextState: DataFrame)

  /** Bootstrap the per-URL best-capture table: one row per URL —
    * (`urlCol`, `tsCol`, `idCol`, n_captures), winner = max `tsCol`, ties
    * to min `idCol` (the `Dedup.latestCapture` rule). At scale this is the
    * lake table the step MERGEs into, bucketed by `urlCol`. */
  def latestCaptureInit(history: DataFrame, urlCol: String, tsCol: String,
                        idCol: String): DataFrame =
    Dedup.latestCapture(history.select(urlCol, tsCol, idCol), urlCol, tsCol, idCol)

  /** One recrawl step of latest-capture-per-URL dedup: collapse the batch
    * to its per-URL winner first (map-side-combining `max_by` — a
    * recrawl-heavy batch reduces before it touches state), then emit the
    * batch winners that beat the persisted best under the same
    * (ts desc, id asc) rule; URLs never seen before are fresh upserts.
    * Restricting the full-corpus q81 window over history ∪ batch to rows
    * the batch contributed gives exactly this set — the q94 oracle.
    *
    * Scale shape: state is URL-grain (large at web scale — NOT broadcast);
    * both state-side joins key on `urlCol`, so a state table bucketed by
    * URL satisfies them from layout and only the collapsed batch moves —
    * the `IncrementalDedup` band-table discipline. The update is written as
    * unchanged-rows ∪ merged-rows, i.e. a MERGE INTO keyed on the bucket
    * column, not a rebuild: state rows for URLs the batch never mentions
    * are untouched. */
  def latestCaptureStep(state: DataFrame, batch: DataFrame, urlCol: String,
                        tsCol: String, idCol: String): LatestResult = {
    val b = Dedup.latestCapture(batch.select(urlCol, tsCol, idCol),
        urlCol, tsCol, idCol)
      .withColumnRenamed("n_captures", "__n_batch")
    // null-safe keying throughout: full-run latestCapture groups NULL urls
    // into ONE group, so the incremental form must match it against the
    // state's NULL row (an equi-join would treat NULL as always-fresh —
    // the cumulative count would reset and nextState would accrete one
    // duplicate NULL row per step)
    val st = state.select(col(urlCol).as("__st_url"), col(tsCol).as("__st_ts"),
      col(idCol).as("__st_id"), col("n_captures").as("__st_n"))
    val joined = b.join(st, b(urlCol).eqNullSafe(col("__st_url")), "left")
      .withColumn("__st_n", coalesce(col("__st_n"), lit(0L)))
      .withColumn("__batch_wins", col("__st_ts").isNull ||
        col(tsCol) > col("__st_ts") ||
        (col(tsCol) === col("__st_ts") && col(idCol) < col("__st_id")))
    val upserts = joined.filter(col("__batch_wins"))
      .select(col(urlCol), col(tsCol), col(idCol),
        (col("__st_n") + col("__n_batch")).as("n_captures"))
    val merged = joined.select(col(urlCol),
      when(col("__batch_wins"), col(tsCol)).otherwise(col("__st_ts")).as(tsCol),
      when(col("__batch_wins"), col(idCol)).otherwise(col("__st_id")).as(idCol),
      (col("__st_n") + col("__n_batch")).as("n_captures"))
    val unchanged = state.join(b.select(col(urlCol).as("__b_url")),
      state(urlCol).eqNullSafe(col("__b_url")), "left_anti")
    LatestResult(upserts, unchanged.unionByName(merged))
  }
}
