package graft.eval

import graft.core.{PiiCategories, PyCompat}
import graft.model.TestCase
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Strategy analytics over (corpus expected, stored LLM predictions, stored
  * regex predictions) — the rebuild of hybrid_analysis.py +
  * hybrid_analysis_deep.py: per-category method stats, regex-precision
  * ranking (O5), rescue analysis (A9: values the LLM missed but regex
  * caught), regex-only FP attribution, per-category union gain (A10), and
  * the merge strategies A-G (U3).
  *
  * Inputs are the stored artifact files (S2 scans) exactly as the reference
  * consumes them; expected values are the raw corpus types (no
  * normalization), matching get_expected (hybrid_analysis.py:36-42).
  */
object HybridAnalysis {
  import PiiCategories.{names => cats}

  final case class CaseSets(id: String,
      expected: Seq[Seq[String]], llm: Seq[Seq[String]], regex: Seq[Seq[String]])

  final case class MethodCatStat(cat: String, method: String, tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
    def recall: Double = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
    def f1: Double = {
      val (p, r) = (precision, recall)
      if (p + r > 0) 2 * p * r / (p + r) else 0.0
    }
  }

  /** Join corpus with both stored prediction files (broadcast, id-keyed). */
  def caseSets(corpus: Dataset[TestCase], llm: DataFrame, regex: DataFrame): Dataset[CaseSets] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def predMap(df: DataFrame, as: String) =
      df.select(col("id"), col("predicted").as(as))
    val joined = corpus.toDF()
      .join(broadcast(predMap(llm, "llm_pred")), Seq("id"), "left")
      .join(broadcast(predMap(regex, "regex_pred")), Seq("id"), "left")
    joined.map { row =>
      val exp = Array.fill(cats.length)(List.newBuilder[String])
      val expItems = Option(row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("expected_pii"))).getOrElse(Nil)
      for (r <- expItems; i <- PiiCategories.index.get(r.getString(0))) exp(i) += r.getString(1)
      def slots(field: String): Seq[Seq[String]] = {
        val st = row.getAs[org.apache.spark.sql.Row](field)
        Seq.tabulate(cats.length) { i =>
          if (st == null || st.isNullAt(i)) Nil else st.getSeq[String](i)
        }
      }
      CaseSets(row.getAs[String]("id"), exp.map(_.result()).toSeq,
        slots("llm_pred"), slots("regex_pred"))
    }
  }

  private def sets(s: Seq[Seq[String]], i: Int): Set[String] =
    if (s(i) == null) Set.empty else s(i).toSet

  /** Analysis 1: per-(category, method∈{llm,regex,hybrid}) TP/FP/FN. */
  def perCategoryStats(ds: Dataset[CaseSets]): Seq[MethodCatStat] = {
    import ds.sparkSession.implicits._
    ds.flatMap { c =>
      (0 until cats.length).flatMap { i =>
        val e = sets(c.expected, i); val l = sets(c.llm, i); val r = sets(c.regex, i)
        val h = l | r
        Seq(("llm", l), ("regex", r), ("hybrid", h)).map { case (m, p) =>
          (cats(i), m, (e & p).size.toLong, (p -- e).size.toLong, (e -- p).size.toLong)
        }
      }
    }.groupBy("_1", "_2").agg(sum("_3"), sum("_4"), sum("_5")).collect()
      .map(r => MethodCatStat(r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  /** O5: categories ranked by descending stored-regex precision. */
  def regexPrecisionRanking(stats: Seq[MethodCatStat]): Seq[(String, Double)] =
    stats.filter(_.method == "regex").sortBy(-_.precision).map(s => (s.cat, s.precision))

  /** A9: rescues — per case/category, sorted values the LLM missed (E−L)
    * that regex caught ((E−L)∩R). */
  def rescues(ds: Dataset[CaseSets]): Dataset[(String, String, String)] = {
    import ds.sparkSession.implicits._
    ds.flatMap { c =>
      (0 until cats.length).flatMap { i =>
        val caught = (sets(c.expected, i) -- sets(c.llm, i)) & sets(c.regex, i)
        caught.toList.sorted.map(v => (c.id, cats(i), v))
      }
    }
  }

  /** Analysis 3: regex-only false positives (R−E, not predicted by LLM). */
  def regexOnlyFps(ds: Dataset[CaseSets]): Dataset[(String, String, String)] = {
    import ds.sparkSession.implicits._
    ds.flatMap { c =>
      (0 until cats.length).flatMap { i =>
        val l = sets(c.llm, i)
        (sets(c.regex, i) -- sets(c.expected, i)).toList.sorted
          .filterNot(l.contains).map(v => (c.id, cats(i), v))
      }
    }
  }

  final case class UnionGain(cat: String, llmF1: Double, unionF1: Double,
      diff: Double, addedTp: Long, addedFp: Long)

  /** A10: per-category F1(LLM) vs F1(LLM∪regex). */
  def unionGain(stats: Seq[MethodCatStat]): Seq[UnionGain] = {
    val byCat = stats.groupBy(_.cat)
    cats.map { c =>
      val l = byCat(c).find(_.method == "llm").get
      val h = byCat(c).find(_.method == "hybrid").get
      UnionGain(c, l.f1, h.f1, h.f1 - l.f1, h.tp - l.tp, h.fp - l.fp)
    }
  }

  // --- U3: merge strategies -------------------------------------------

  type Strategy = (Set[String], Set[String], Set[String], Int) => Set[String]

  private val strongRegexCats = Set("주민등록번호", "여권번호", "운전면허번호", "이메일", "계좌번호", "생년월일", "카드번호").map(PiiCategories.index)
  private val weakRegexCats = Set("이름", "주소", "기타_고유식별정보").map(PiiCategories.index)

  /** Strategy D's partial match: whitespace-stripped substring containment
    * (hybrid_analysis.py:425-429). */
  def partialMatch(a0: String, b0: String): Boolean = {
    val a = PyCompat.pyStrip(a0).replace(" ", "")
    val b = PyCompat.pyStrip(b0).replace(" ", "")
    a.contains(b) || b.contains(a)
  }

  def strategies(highPrecCats: Set[Int], beneficialCats: Set[Int]): Map[String, Strategy] = Map(
    "A" -> ((e, l, r, c) => if (highPrecCats(c)) l | r else l),
    "B" -> ((e, l, r, c) => if (l.isEmpty) r else l),
    "C" -> ((e, l, r, c) =>
      if (strongRegexCats(c)) l | r
      else if (weakRegexCats(c)) l
      else if (l.isEmpty) r else l),
    "D" -> ((e, l, r, c) => l ++ r.filter(rv => l.exists(lv => partialMatch(rv, lv)))),
    "E" -> ((e, l, r, c) => if (strongRegexCats(c)) l | r else if (l.isEmpty) r else l),
    "F" -> ((e, l, r, c) => if (beneficialCats(c)) l | r else l),
    "G" -> ((e, l, r, c) =>
      if (c == PiiCategories.Account) l | r
      else if (l.isEmpty && (c == PiiCategories.Rrn || c == PiiCategories.Email)) r
      else l))

  /** Evaluate a merge strategy corpus-wide → (tp, fp, fn). */
  def strategyTotals(ds: Dataset[CaseSets], strategy: Strategy): (Long, Long, Long) = {
    import ds.sparkSession.implicits._
    val r = ds.map { c =>
      var tp = 0L; var fp = 0L; var fn = 0L
      for (i <- 0 until cats.length) {
        val e = sets(c.expected, i)
        val pred = strategy(e, sets(c.llm, i), sets(c.regex, i), i)
        tp += (e & pred).size; fp += (pred -- e).size; fn += (e -- pred).size
      }
      (tp, fp, fn)
    }.groupBy().agg(sum("_1"), sum("_2"), sum("_3")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Full strategy comparison: baselines + A-G, with data-derived
    * high-precision (P>0.80) and beneficial (union F1 gain > 0) category
    * sets, as in the reference. */
  def compareStrategies(ds: Dataset[CaseSets]): Map[String, (Long, Long, Long)] = {
    val stats = perCategoryStats(ds)
    val highPrec = stats.filter(s => s.method == "regex" && s.precision > 0.80)
      .map(s => PiiCategories.index(s.cat)).toSet
    val beneficial = unionGain(stats).filter(_.diff > 0)
      .map(g => PiiCategories.index(g.cat)).toSet
    def tot(m: String) = {
      val ss = stats.filter(_.method == m)
      (ss.map(_.tp).sum, ss.map(_.fp).sum, ss.map(_.fn).sum)
    }
    Map("llm" -> tot("llm"), "regex" -> tot("regex"), "union" -> tot("hybrid")) ++
      strategies(highPrec, beneficial).map { case (n, f) => n -> strategyTotals(ds, f) }
  }
}
