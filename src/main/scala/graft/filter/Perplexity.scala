package graft.filter

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language model for perplexity-based quality
  * scoring.
  *
  * `fit` runs as Spark aggregations (token/bigram counts — map-side partial
  * aggregation, one shuffle each) and collects only the frequency-capped
  * vocabulary to the driver; the resulting model is a compact serializable
  * value intended for `sparkContext.broadcast` + per-row lookup scoring
  * (broadcast-model scalar scorer — no shuffle at scoring time).
  *
  * At 10^12-doc scale the fit runs on a sample and maxVocab bounds driver /
  * broadcast memory; scoring cost is O(tokens) per document.
  */
final case class BigramLM(
    unigramCount: Map[String, Long],
    bigramCount: Map[(String, String), Long],
    continuationCount: Map[String, Int],
    followerTypes: Map[String, Int],
    totalUnigrams: Long,
    bigramTypes: Long,
    discount: Double) extends Serializable {

  private val unkP = 1.0 / math.max(totalUnigrams, 1L)

  /** Interpolated KN: P(w2|w1) = max(c12-d,0)/c1 + d·N1+(w1,·)/c1 · Pcont(w2). */
  def prob(w1: String, w2: String): Double = {
    val c1 = unigramCount.getOrElse(w1, 0L)
    val pcont = {
      val cc = continuationCount.getOrElse(w2, 0)
      if (bigramTypes > 0 && cc > 0) cc.toDouble / bigramTypes else unkP
    }
    if (c1 == 0) pcont
    else {
      val c12 = bigramCount.getOrElse((w1, w2), 0L)
      val lambda = discount * followerTypes.getOrElse(w1, 0) / c1
      math.max(c12 - discount, 0.0) / c1 + lambda * pcont
    }
  }

  def logProb(tokens: Array[String]): Double = {
    if (tokens.isEmpty) return 0.0
    var lp = 0.0
    var i = 1
    while (i < tokens.length) {
      lp += math.log(math.max(prob(tokens(i - 1), tokens(i)), 1e-12))
      i += 1
    }
    lp
  }

  /** Perplexity over whitespace tokens (lowercased). Lower = more natural. */
  def perplexity(text: String): Double = {
    val toks = BigramLM.tokenize(text)
    if (toks.length < 2) return 1e9
    math.exp(-logProb(toks) / (toks.length - 1))
  }
}

object BigramLM {
  def tokenize(text: String): Array[String] =
    text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Fit from a corpus of texts. Distributed counting; only the capped
    * vocab/bigram tables come back to the driver. */
  def fit(texts: Dataset[String], maxVocab: Int = 1 << 16, discount: Double = 0.75,
          maxBigrams: Int = 1 << 20): BigramLM = {
    val spark: SparkSession = texts.sparkSession
    import spark.implicits._

    val toks = texts.flatMap(t => tokenize(t)).groupBy("value").count()
    val topVocab = toks.orderBy(desc("count"), asc("value")).limit(maxVocab)
      .as[(String, Long)].collect()
    val vocab = topVocab.map(_._1).toSet
    val vb = spark.sparkContext.broadcast(vocab)

    // Bigram TYPES over the vocab can reach maxVocab² on diverse corpora —
    // far past driver memory. Cap like the vocab: keep the most frequent
    // maxBigrams (deterministic tie-break), which carry nearly all the
    // probability mass; the long tail folds into the KN back-off.
    val bigrams = texts.flatMap { t =>
      val ts = tokenize(t).map(w => if (vb.value.contains(w)) w else "<unk>")
      ts.sliding(2).collect { case Array(a, b) => (a, b) }
    }.groupBy("_1", "_2").count()
      .orderBy(desc("count"), asc("_1"), asc("_2")).limit(maxBigrams)
      .as[(String, String, Long)].collect()

    val uni = topVocab.toMap
    val big = bigrams.map { case (a, b, c) => (a, b) -> c }.toMap
    val cont = bigrams.groupBy(_._2).map { case (w2, rows) => w2 -> rows.length }
    val foll = bigrams.groupBy(_._1).map { case (w1, rows) => w1 -> rows.length }
    BigramLM(uni, big, cont, foll, topVocab.map(_._2).sum, bigrams.length.toLong, discount)
  }
}
