package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `df.sample`/`sampleBy` draw from a per-partition RNG, so the selected set
  * changes whenever the partition layout does (repartition, AQE coalesce, a
  * different input split count) — a reproducibility hazard for dataset
  * releases. These operators hash the row's stable key instead: the same row
  * is kept or dropped regardless of layout, engine, or run, and the decision
  * is SQL-portable (md5-based hash60, oracle-checkable in DuckDB).
  *
  * Scale: pure narrow filters — no shuffle, no driver state; the selection
  * predicate pushes into the scan's codegen stage.
  */
object Sampling {

  private val Buckets = 10000L

  private def bucketOf(keyCol: Column, salt: String): Column =
    pmod(TF.hash60(concat(keyCol.cast("string"), lit("|" + salt))), lit(Buckets))

  /** Keep ~`fraction` of rows, chosen by hash of `keyCol`. `salt` decouples
    * independent samples over the same keys (train/eval splits). */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
                 salt: String = ""): DataFrame =
    df.filter(bucketOf(keyCol, salt) < lit(math.round(fraction * Buckets)))

  /** Per-stratum rates (e.g. downsample dominant languages, keep the rare
    * tail whole). Rates resolve via an inlined CASE — no join, still a
    * single narrow filter. Strata absent from `fractions` use `default`. */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
                       fractions: Map[String, Double], default: Double,
                       salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.round(default * Buckets))) {
      case (acc, (stratum, f)) =>
        when(strataCol === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(bucketOf(keyCol, salt) < threshold)
  }

  /** Data-mixture construction: repeat each row `rate(stratum)` times, where
    * the rate may be fractional or < 1 (epoch weighting: wiki ×2.5, raw web
    * ×0.6, …). Each row gets `floor(rate)` copies plus one more iff its key
    * hash falls under the fractional part — so the realized per-stratum
    * count is exact to 1/Buckets and every decision is per-row deterministic
    * (same mixture for any partition layout, resumable mid-corpus).
    *
    * Emits a `copy` index (1-based) so downstream shuffles can't collapse
    * the duplicates. Pure narrow explode — no shuffle, no driver state. */
  def weightedRepeat(df: DataFrame, strataCol: Column, keyCol: Column,
                     rates: Map[String, Double], default: Double,
                     salt: String = ""): DataFrame = {
    def copiesFor(rate: Double): Column = {
      val whole = math.floor(rate).toLong
      lit(whole) + when(bucketOf(keyCol, salt) <
        lit(math.round((rate - whole) * Buckets)), lit(1L)).otherwise(lit(0L))
    }
    val nCopies = rates.foldLeft(copiesFor(default)) {
      case (acc, (stratum, r)) => when(strataCol === stratum, copiesFor(r)).otherwise(acc)
    }
    // sequence(1, 0) would count DOWN ([1,0]); rows with 0 copies must
    // instead explode an empty array (dropping the row).
    df.withColumn("copy", explode(when(nCopies >= 1, sequence(lit(1L), nCopies))
      .otherwise(array().cast("array<bigint>"))))
  }

  /** Leakage-safe train/valid/test splitting: the split is a function of the
    * HOST hash, never the document, so every page of a host — including the
    * near-duplicates, boilerplate siblings and templated variants that live
    * together on one site — lands in the same split. A document-grain split
    * leaks: held-out pages have same-host near-twins in train, and the eval
    * overstates generalization (the C4/Pile-era splitting lesson).
    *
    * `splits` are (label, fraction) in order; fractions must sum to 1. A row
    * lands in the first label whose cumulative hash-bucket cut covers its
    * host bucket, so a host's label is reproducible from (host, salt) alone
    * — stable across runs, layouts, engines (md5-based, oracle-checkable),
    * and corpus growth: adding documents never moves an existing host's
    * split. NULL hosts hash as one group (empty string) — together in one
    * split, like every host.
    *
    * Scale: a pure narrow projection — no shuffle, no dimension table, no
    * driver state; the predicate codegens into the scan stage. */
  def hostDisjointSplit(df: DataFrame, hostCol: Column,
                        splits: Seq[(String, Double)],
                        salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 > 0), s"split fractions must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val bucket = bucketOf(coalesce(hostCol.cast("string"), lit("")), salt)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(f => math.round(f * Buckets))
    val label = splits.init.zip(cuts.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, ((name, _), cut)) =>
        when(bucket < lit(cut), lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** Per-host document cap (corpus-balance policy: no single host may
    * contribute more than `cap` pages, the best-`orderCol` ones win; ties
    * break on `idCol` ascending so the result is layout-invariant).
    * NULL-host rows are exempt (kept): they fall through the anti-join
    * below — an unknown host is not a host budget. The incremental form
    * ([[IncrementalSelect.hostCapStep]]) pins the same contract.
    *
    * Scale design: a plain `row_number` window would shuffle + sort the
    * ENTIRE corpus by host. Instead the host histogram (map-side partial
    * agg → one tiny shuffle of (host, count) rows) finds the over-cap
    * hosts; that set is dimension-scale (≤ #hosts, and only the heavy
    * tail of it), so it broadcasts. Under-cap hosts pass through as a
    * broadcast ANTI join — never shuffled, never sorted; only the over-cap
    * hosts' rows (the small skewed head) pay the window. At web scale the
    * heavy tail is exactly the part that is also skewed — confining the
    * sort to it is what makes the window affordable.
    */
  def hostCap(df: DataFrame, hostCol: String, orderCol: String,
              idCol: String, cap: Int): DataFrame = {
    val over = df.groupBy(hostCol).agg(count(lit(1)).as("n_host"))
      .filter(col("n_host") > cap).select(hostCol)
    val light = df.join(broadcast(over), Seq(hostCol), "left_anti")
    val capped = df.join(broadcast(over), Seq(hostCol), "left_semi")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(hostCol)
          .orderBy(col(orderCol).desc, col(idCol).asc)))
      .filter(col("rn") <= cap).drop("rn")
    light.unionByName(capped)
  }

  /** Domain-level quality prior with per-document rescue (FineWeb-style
    * domain curation: a domain whose AVERAGE quality fails the bar drops
    * wholesale — spam farms are site-shaped, not page-shaped — but an
    * individually excellent page on a bad domain is rescued): keep iff
    * `avg(score) over host >= domainBar` OR own `score >= docBar`.
    *
    * Scale: the per-host average is a map-side-combined two-column
    * aggregate (dimension-scale output) broadcast back onto the scan; the
    * corpus itself never shuffles. Exactness across engines: feed an
    * INTEGER score (e.g. `(n_chars * 1000000) div n_words`) — the host
    * average is then one exact integer sum divided once, so Spark and a
    * SQL oracle agree bitwise with no float-sum order sensitivity. */
  def domainPriorKeep(df: DataFrame, hostCol: String, scoreCol: String,
                      domainBar: Double, docBar: Long): DataFrame = {
    val prior = df.groupBy(hostCol).agg(avg(col(scoreCol)).as("domain_avg"))
    df.join(broadcast(prior), Seq(hostCol))
      .filter(col("domain_avg") >= domainBar || col(scoreCol) >= docBar)
  }

  /** Token-budget mixture fill (the released-dataset contract: "this corpus
    * contains AT the budget boundary exactly B_lang tokens of each
    * language", not "≈ a fraction"): within each stratum, rows are taken in
    * seeded-hash order (layout/run-invariant, like every sampler here)
    * until the stratum's token budget is reached — a row is admitted iff
    * the tokens of all rows BEFORE it in hash order total < budget, so the
    * fill is greedy and the last admitted row may straddle the boundary.
    *
    * Scale design: the naive form is a per-stratum global sort + running
    * sum — unaffordable at corpus scale. Instead the hash's top bits coarsen
    * each stratum into 4096 order-preserving buckets; a (stratum, bucket)
    * token histogram (map-side-combined, dimension-scale) prefix-sums to
    * classify every bucket as fully-admitted (bucket ends strictly under
    * budget), fully-rejected (bucket starts at/after budget), or the ONE
    * straddling boundary bucket per stratum — and only the boundary
    * bucket's rows (≈ corpus/4096) pay a window. The q79 hostCap
    * discipline at token grain. Requires no token-count positivity: the
    * strict fully-admit bound stays exact even for 0-token rows. */
  def tokenBudget(df: DataFrame, strataCol: String, tokensCol: String,
                  keyCol: Column, budgets: Map[String, Long], default: Long,
                  salt: String = ""): DataFrame = {
    val budget = budgets.foldLeft(lit(default)) { case (acc, (stratum, b)) =>
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val h = TF.hash60(concat(keyCol.cast("string"), lit("|" + salt)))
    val withH = df.withColumn("__h", h)
      .withColumn("__bkt", shiftright(col("__h"), 48))
    // dimension-scale histogram: |strata| × ≤4096 rows
    val hist = withH.groupBy(strataCol, "__bkt")
      .agg(sum(col(tokensCol)).as("__bkt_toks"))
      .withColumn("__bkt_prior", coalesce(sum(col("__bkt_toks")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(strataCol)
          .orderBy("__bkt").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__budget", budget)
    val fullBkts = hist
      .filter(col("__bkt_prior") + col("__bkt_toks") < col("__budget"))
      .select(col(strataCol), col("__bkt"))
    val boundaryBkts = hist
      .filter(col("__bkt_prior") < col("__budget") &&
        col("__bkt_prior") + col("__bkt_toks") >= col("__budget"))
      .select(col(strataCol), col("__bkt"), col("__bkt_prior"), col("__budget"))
    val admitted = withH.join(broadcast(fullBkts), Seq(strataCol, "__bkt"), "left_semi")
    // only the straddling bucket per stratum pays the sort
    val boundary = withH
      .join(broadcast(boundaryBkts), Seq(strataCol, "__bkt"))
      .withColumn("__prior", col("__bkt_prior") + coalesce(
        sum(col(tokensCol)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol), col("__bkt"))
            .orderBy(col("__h"), keyCol).rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("__prior") < col("__budget"))
      .drop("__bkt_prior", "__budget", "__prior")
    admitted.unionByName(boundary).drop("__h", "__bkt")
  }

  /** Temperature-flattened multilingual sampling (the mixture rebalance of
    * XLM-R / mT5: raise each language's mass to a sub-linear exponent so
    * head languages shrink and tail languages keep everything). Keep rate
    * for a language with `n` documents is `min(1, c / sqrt(n))` — expected
    * kept count `∝ sqrt(n)`, i.e. temperature α = 0.5 up to the caller's
    * budget constant `c`; selection is by stable key hash (layout- and
    * run-invariant, like every sampler here).
    *
    * Bit-exactness across engines is designed in: `sqrt`, `/`, `*` and
    * `floor` are all IEEE-754 correctly-rounded, so the integer threshold
    * `floor(1e6·rate)` is identical in Spark and DuckDB — no float-compare
    * tolerance needed, the q80 oracle hash-matches. (This is why the
    * exponent is a sqrt and not `pow(n, α)`: pow is not correctly rounded
    * and may differ in the last ulp between libm implementations.)
    *
    * Scale: per-language counts are a map-side-combined two-column agg;
    * rates broadcast-join back; the corpus itself never shuffles. */
  def temperatureSample(df: DataFrame, langCol: String, keyCol: Column,
                        c: Double, salt: String = ""): DataFrame = {
    // Single multiply by 1e6 (not ·Buckets·100 chained): IEEE rounding of
    // (x·10000)·100 can differ from x·1000000 in the last ulp — the oracle
    // does one multiply, so this side must too.
    val rates = df.groupBy(langCol).agg(count(lit(1)).as("n_lang"))
      .withColumn("keep_threshold",
        floor(least(lit(1.0), lit(c) / sqrt(col("n_lang"))) * lit(1000000.0)).cast("long"))
    df.join(broadcast(rates), Seq(langCol))
      .filter(pmod(TF.hash60(concat(keyCol.cast("string"), lit("|" + salt))),
        lit(1000000L)) < col("keep_threshold"))
  }
}
