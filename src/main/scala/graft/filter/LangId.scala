package graft.filter

import scala.util.hashing.MurmurHash3

/** fastText-style language identifier: character n-grams (2-3) hashed into a
  * fixed-width bucket table feeding a linear per-language scorer, plus
  * script-range features that dominate for non-Latin scripts.
  *
  * The model is a plain serializable value: build once on the driver,
  * `sparkContext.broadcast` it, and score inside a map/expression — the
  * weights are read-only on executors (the broadcast-linear-classifier
  * pattern). The built-in default model is hand-initialized from published
  * character-trigram frequency tables for 6 Latin-script languages; a model
  * trained elsewhere can be loaded into the same struct.
  */
final case class LangIdModel(
    dim: Int,
    langs: IndexedSeq[String],
    weights: Array[Float]) extends Serializable {

  private val nLangs = langs.length

  @inline private def bucket(ngram: String): Int = {
    val h = MurmurHash3.stringHash(ngram, 42)
    java.lang.Math.floorMod(h, dim)
  }

  /** Classify text → (language, confidence∈(0,1]). Deterministic. Scoring is
    * capped to the first 4000 chars — ample signal for language ID, and keeps
    * per-row cost bounded on multi-MB crawl documents. */
  def classify(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val t = if (text.length > 4000) text.substring(0, 4000) else text
    // Script features: decisive for non-Latin scripts.
    var hangul = 0; var han = 0; var kana = 0; var cyr = 0; var arab = 0
    var latin = 0; var letters = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        if (c >= '가' && c <= '힣') hangul += 1
        else if (c >= 0x4E00 && c <= 0x9FFF) han += 1
        else if ((c >= 0x3040 && c <= 0x30FF)) kana += 1
        else if (c >= 0x0400 && c <= 0x04FF) cyr += 1
        else if (c >= 0x0600 && c <= 0x06FF) arab += 1
        else if (c < 0x0250) latin += 1
      }
      i += 1
    }
    if (letters == 0) return ("und", 0.0)
    val lf = letters.toDouble
    if (hangul / lf > 0.2) return ("ko", hangul / lf)
    if (kana / lf > 0.05) return ("ja", (kana + han) / lf)
    if (han / lf > 0.2) return ("zh", han / lf)
    if (cyr / lf > 0.3) return ("ru", cyr / lf)
    if (arab / lf > 0.3) return ("ar", arab / lf)

    // Latin path: hashed char 2-3-gram linear scores over the padded text.
    val padded = " " + t.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ") + " "
    val scores = new Array[Double](nLangs)
    var ngrams = 0
    var n = 2
    while (n <= 3) {
      var j = 0
      val max = padded.length - n
      while (j <= max) {
        val g = padded.substring(j, j + n)
        val b = bucket(g) * nLangs
        var l = 0
        while (l < nLangs) { scores(l) += weights(b + l); l += 1 }
        ngrams += 1
        j += 1
      }
      n += 1
    }
    if (ngrams == 0) return ("und", 0.0)
    var best = 0; var l = 1
    while (l < nLangs) { if (scores(l) > scores(best)) best = l; l += 1 }
    // softmax over mean scores for a bounded confidence
    val means = scores.map(_ / ngrams)
    val m = means(best)
    val z = means.map(s => math.exp(s - m)).sum
    (langs(best), 1.0 / z)
  }
}

object LangIdModel {

  /** Hand-initialized profiles: highest-frequency character trigrams/bigrams
    * (with word-boundary spaces) per language, strongest first. Public
    * frequency knowledge; weights decay with rank. */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", "ing", "ng ", " an", "and", "nd ", " of", "of ",
      " to", "to ", " in", "ion", "tio", "ent", "er ", "ed ", " is", "is ",
      "at ", "es ", " re", "on ", " be", "th", "he", "in", "er", "an", "re", "on"),
    "de" -> Seq("der", "ein", "ich", "sch", "die", "und", "ung", "cht", "ver", "gen",
      " de", " di", " un", "ten", "das", " da", "ber", "auf", "ie ", "en ",
      "ch ", "nd ", "ng ", "as ", "er ", "ei", "ch", "de", "un", "ie", "st", "ge"),
    "fr" -> Seq(" de", "de ", "le ", " le", "ent", "la ", " la", "ion", "que", " qu",
      "ue ", "les", "ais", "eur", "our", "ous", "ait", "ant", " pa", "men",
      "es ", "nt ", "on ", "re ", " et", "et ", "qu", "ou", "ai", "eu", "le", "de"),
    "es" -> Seq(" de", "de ", "la ", " la", "el ", " el", "que", " qu", "ue ", " en",
      "ció", "aci", "ent", "los", " lo", "del", "con", " co", "nte", "ado",
      "os ", "as ", "es ", "ar ", "en ", " es", "ón ", "ci", "ón", "ña", "ll", "rr"),
    "it" -> Seq(" di", "di ", "che", " ch", "zio", "ion", "one", "ell", "lla", "per",
      " pe", "non", " no", "del", " de", "ato", "are", "ere", "nte", "con",
      "to ", "re ", "la ", "il ", " il", "gli", " gl", "zz", "gl", "tt", "cc", "ia"),
    "pt" -> Seq(" de", "de ", "ão ", "ção", "açã", "ent", "que", " qu", "ue ", " da",
      "da ", " do", "do ", " em", "em ", "ara", " pa", "par", "com", " co",
      "os ", "as ", "res", "ções", "nh", "ão", "çã", "lh", "ss", "em", "do", "da"))

  val defaultLangs: IndexedSeq[String] = profiles.map(_._1).toIndexedSeq

  /** Default hand-initialized model (2^14 buckets). */
  lazy val default: LangIdModel = {
    val dim = 1 << 14
    val langs = defaultLangs
    val w = new Array[Float](dim * langs.length)
    for (((_, grams), li) <- profiles.zipWithIndex; (g, rank) <- grams.zipWithIndex) {
      val weight = (1.0 / math.sqrt(rank + 1.0)).toFloat
      val b = java.lang.Math.floorMod(MurmurHash3.stringHash(g, 42), dim)
      w(b * langs.length + li) += weight
    }
    LangIdModel(dim, langs, w)
  }
}
