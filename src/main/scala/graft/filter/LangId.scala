package graft.filter

import scala.util.hashing.MurmurHash3

/** fastText-style language identifier: character n-grams (2-3) hashed into a
  * fixed-width bucket table feeding a linear per-language scorer, plus
  * script-range features that dominate for non-Latin scripts.
  *
  * The model is a plain serializable value: build once on the driver,
  * `sparkContext.broadcast` it, and score inside a map/expression — the
  * weights are read-only on executors (the broadcast-linear-classifier
  * pattern). The built-in default model is fitted (naive-Bayes log-odds)
  * from a small built-in seed corpus covering 9 Latin-script languages and
  * gated at ≥95% held-out accuracy (LangIdAccuracySpec); a model trained on
  * a larger corpus loads into the same struct.
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

  /** [[bucket]] of `s.substring(from, from + n)` WITHOUT the substring
    * allocation — a transliteration of scala's `MurmurHash3.stringHash`
    * over the char range (same mix/mixLast/finalizeHash calls, same
    * char-pair packing, length = n). The scorer hashes every 2- and 3-gram
    * position of up to 4000 chars per document; the substring-per-position
    * form allocated ~8k short-lived strings per row for values this
    * computes in place (equality with the allocating form is spec-pinned
    * by fuzz in LangIdSpec). */
  @inline private[filter] def bucketRange(s: String, from: Int, n: Int): Int = {
    var h = 42
    var i = from
    val end = from + n
    while (i + 1 < end) {
      h = MurmurHash3.mix(h, (s.charAt(i) << 16) + s.charAt(i + 1))
      i += 2
    }
    if (i < end) h = MurmurHash3.mixLast(h, s.charAt(i).toInt)
    java.lang.Math.floorMod(MurmurHash3.finalizeHash(h, n), dim)
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
        val b = bucketRange(padded, j, n) * nLangs
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

  /** Fit a hashed char-2/3-gram naive-Bayes model from labeled samples:
    * weight(bucket, lang) = centered log P(gram | lang) with add-α smoothing,
    * so classify()'s weight-sum is a log-likelihood contest and the softmax
    * confidence stays calibrated. This is the same estimator fastText's
    * supervised mode reduces to for a bag-of-hashed-ngrams linear model. */
  def fit(samples: Seq[(String, String)], dim: Int = 1 << 14): LangIdModel = {
    val langs = samples.map(_._1).distinct.sorted.toIndexedSeq
    val nl = langs.length
    val counts = Array.fill(nl)(new Array[Double](dim))
    val totals = new Array[Double](nl)
    for ((lang, text) <- samples) {
      val li = langs.indexOf(lang)
      val padded = " " + text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ") + " "
      var n = 2
      while (n <= 3) {
        var j = 0
        val max = padded.length - n
        while (j <= max) {
          val b = java.lang.Math.floorMod(
            MurmurHash3.stringHash(padded.substring(j, j + n), 42), dim)
          counts(li)(b) += 1
          totals(li) += 1
          j += 1
        }
        n += 1
      }
    }
    val alpha = 0.5
    val w = new Array[Float](dim * nl)
    var b = 0
    while (b < dim) {
      var mean = 0.0
      var l = 0
      while (l < nl) {
        mean += math.log((counts(l)(b) + alpha) / (totals(l) + alpha * dim))
        l += 1
      }
      mean /= nl
      l = 0
      while (l < nl) {
        val lp = math.log((counts(l)(b) + alpha) / (totals(l) + alpha * dim))
        w(b * nl + l) = (lp - mean).toFloat
        l += 1
      }
      b += 1
    }
    LangIdModel(dim, langs, w)
  }

  /** Built-in seed corpus: a dozen generic sentences per Latin-script
    * language (ordinary public prose — news/weather/travel/cooking register,
    * written for this table). DISTINCT from the held-out sentences in
    * LangIdAccuracySpec, which gate the fitted model at >=95%. */
  private val seedCorpus: Seq[(String, String)] = Seq(
    "en" -> "it was raining heavily when we finally reached the old wooden cabin",
    "en" -> "many people believe that regular exercise improves both health and mood",
    "en" -> "the museum opens every morning at nine except on public holidays",
    "en" -> "add two cups of flour and stir the mixture until it becomes smooth",
    "en" -> "our neighbors moved to another city because of a new job offer",
    "en" -> "the football match was cancelled due to the heavy snowfall last night",
    "en" -> "economists expect prices to rise slowly over the coming months",
    "en" -> "he spent the whole summer repairing the roof of his grandmother's house",
    "en" -> "students should submit their assignments before the end of the month",
    "en" -> "a gentle breeze came through the open window carrying the smell of rain",
    "en" -> "the company plans to open three new factories in the region next year",
    "en" -> "could you tell me where the nearest railway station is located",
    "de" -> "es regnete stark als wir endlich die alte holzhütte erreichten",
    "de" -> "viele menschen glauben dass regelmäßige bewegung gesundheit und stimmung verbessert",
    "de" -> "das museum öffnet jeden morgen um neun außer an feiertagen",
    "de" -> "geben sie zwei tassen mehl hinzu und rühren sie die mischung glatt",
    "de" -> "unsere nachbarn sind wegen eines neuen jobangebots in eine andere stadt gezogen",
    "de" -> "das fußballspiel wurde wegen des starken schneefalls gestern abend abgesagt",
    "de" -> "ökonomen erwarten dass die preise in den kommenden monaten langsam steigen",
    "de" -> "er verbrachte den ganzen sommer damit das dach des hauses seiner großmutter zu reparieren",
    "de" -> "die studenten sollen ihre arbeiten vor dem ende des monats einreichen",
    "de" -> "eine sanfte brise kam durch das offene fenster und brachte den geruch von regen",
    "de" -> "das unternehmen plant nächstes jahr drei neue fabriken in der region zu eröffnen",
    "de" -> "können sie mir sagen wo sich der nächste bahnhof befindet",
    "fr" -> "il pleuvait fort quand nous avons enfin atteint la vieille cabane en bois",
    "fr" -> "beaucoup de gens pensent que l'exercice régulier améliore la santé et l'humeur",
    "fr" -> "le musée ouvre tous les matins à neuf heures sauf les jours fériés",
    "fr" -> "ajoutez deux tasses de farine et remuez le mélange jusqu'à ce qu'il soit lisse",
    "fr" -> "nos voisins ont déménagé dans une autre ville à cause d'une nouvelle offre d'emploi",
    "fr" -> "le match de football a été annulé en raison des fortes chutes de neige",
    "fr" -> "les économistes s'attendent à ce que les prix augmentent lentement dans les mois à venir",
    "fr" -> "il a passé tout l'été à réparer le toit de la maison de sa grand-mère",
    "fr" -> "les étudiants doivent remettre leurs devoirs avant la fin du mois",
    "fr" -> "une brise légère entrait par la fenêtre ouverte apportant l'odeur de la pluie",
    "fr" -> "l'entreprise prévoit d'ouvrir trois nouvelles usines dans la région l'année prochaine",
    "fr" -> "pouvez-vous me dire où se trouve la gare la plus proche",
    "es" -> "llovía mucho cuando por fin llegamos a la vieja cabaña de madera",
    "es" -> "mucha gente cree que el ejercicio regular mejora la salud y el ánimo",
    "es" -> "el museo abre todas las mañanas a las nueve excepto los días festivos",
    "es" -> "añade dos tazas de harina y remueve la mezcla hasta que quede suave",
    "es" -> "nuestros vecinos se mudaron a otra ciudad por una nueva oferta de trabajo",
    "es" -> "el partido de fútbol fue cancelado debido a la fuerte nevada de anoche",
    "es" -> "los economistas esperan que los precios suban lentamente en los próximos meses",
    "es" -> "pasó todo el verano reparando el techo de la casa de su abuela",
    "es" -> "los estudiantes deben entregar sus trabajos antes de que termine el mes",
    "es" -> "una brisa suave entraba por la ventana abierta trayendo el olor de la lluvia",
    "es" -> "la empresa planea abrir tres nuevas fábricas en la región el próximo año",
    "es" -> "puede decirme dónde está la estación de tren más cercana",
    "it" -> "pioveva forte quando finalmente abbiamo raggiunto la vecchia baita di legno",
    "it" -> "molte persone credono che l'esercizio regolare migliori la salute e l'umore",
    "it" -> "il museo apre ogni mattina alle nove tranne nei giorni festivi",
    "it" -> "aggiungi due tazze di farina e mescola il composto finché non diventa liscio",
    "it" -> "i nostri vicini si sono trasferiti in un'altra città per una nuova offerta di lavoro",
    "it" -> "la partita di calcio è stata annullata a causa della forte nevicata di ieri sera",
    "it" -> "gli economisti si aspettano che i prezzi salgano lentamente nei prossimi mesi",
    "it" -> "ha passato tutta l'estate a riparare il tetto della casa di sua nonna",
    "it" -> "gli studenti devono consegnare i compiti prima della fine del mese",
    "it" -> "una brezza leggera entrava dalla finestra aperta portando l'odore della pioggia",
    "it" -> "l'azienda prevede di aprire tre nuove fabbriche nella regione l'anno prossimo",
    "it" -> "può dirmi dove si trova la stazione ferroviaria più vicina",
    "pt" -> "chovia muito quando finalmente chegamos à velha cabana de madeira",
    "pt" -> "muitas pessoas acreditam que o exercício regular melhora a saúde e o humor",
    "pt" -> "o museu abre todas as manhãs às nove exceto nos feriados",
    "pt" -> "adicione duas xícaras de farinha e mexa a mistura até ficar homogênea",
    "pt" -> "nossos vizinhos se mudaram para outra cidade por causa de uma nova oferta de emprego",
    "pt" -> "o jogo de futebol foi cancelado devido à forte nevasca de ontem à noite",
    "pt" -> "os economistas esperam que os preços subam lentamente nos próximos meses",
    "pt" -> "ele passou o verão inteiro consertando o telhado da casa de sua avó",
    "pt" -> "os estudantes devem entregar seus trabalhos antes do fim do mês",
    "pt" -> "uma brisa suave entrava pela janela aberta trazendo o cheiro da chuva",
    "pt" -> "a empresa planeja abrir três novas fábricas na região no próximo ano",
    "pt" -> "pode me dizer onde fica a estação de trem mais próxima",
    "nl" -> "het regende hard toen we eindelijk de oude houten hut bereikten",
    "nl" -> "veel mensen geloven dat regelmatige beweging de gezondheid en het humeur verbetert",
    "nl" -> "het museum opent elke ochtend om negen uur behalve op feestdagen",
    "nl" -> "voeg twee kopjes bloem toe en roer het mengsel tot het glad is",
    "nl" -> "onze buren zijn naar een andere stad verhuisd vanwege een nieuwe baan",
    "nl" -> "de voetbalwedstrijd werd afgelast vanwege de hevige sneeuwval van gisteravond",
    "nl" -> "economen verwachten dat de prijzen de komende maanden langzaam zullen stijgen",
    "nl" -> "hij bracht de hele zomer door met het repareren van het dak van zijn grootmoeders huis",
    "nl" -> "studenten moeten hun opdrachten voor het einde van de maand inleveren",
    "nl" -> "een zachte bries kwam door het open raam en bracht de geur van regen mee",
    "nl" -> "het bedrijf is van plan volgend jaar drie nieuwe fabrieken in de regio te openen",
    "nl" -> "kunt u mij vertellen waar het dichtstbijzijnde treinstation is",
    "pl" -> "padało mocno kiedy w końcu dotarliśmy do starej drewnianej chaty",
    "pl" -> "wiele osób uważa że regularne ćwiczenia poprawiają zdrowie i nastrój",
    "pl" -> "muzeum otwiera się codziennie rano o dziewiątej z wyjątkiem świąt",
    "pl" -> "dodaj dwie szklanki mąki i mieszaj ciasto aż będzie gładkie",
    "pl" -> "nasi sąsiedzi przeprowadzili się do innego miasta z powodu nowej pracy",
    "pl" -> "mecz piłki nożnej został odwołany z powodu wczorajszych obfitych opadów śniegu",
    "pl" -> "ekonomiści spodziewają się że ceny będą powoli rosnąć w nadchodzących miesiącach",
    "pl" -> "spędził całe lato naprawiając dach domu swojej babci",
    "pl" -> "studenci powinni oddać swoje prace przed końcem miesiąca",
    "pl" -> "łagodny wiatr wpadał przez otwarte okno niosąc zapach deszczu",
    "pl" -> "firma planuje otworzyć trzy nowe fabryki w regionie w przyszłym roku",
    "pl" -> "czy może mi pan powiedzieć gdzie znajduje się najbliższa stacja kolejowa",
    "tr" -> "sonunda eski ahşap kulübeye vardığımızda şiddetli yağmur yağıyordu",
    "tr" -> "birçok insan düzenli egzersizin sağlığı ve ruh halini iyileştirdiğine inanıyor",
    "tr" -> "müze resmi tatiller dışında her sabah dokuzda açılıyor",
    "tr" -> "iki su bardağı un ekleyin ve karışım pürüzsüz olana kadar karıştırın",
    "tr" -> "komşularımız yeni bir iş teklifi nedeniyle başka bir şehre taşındı",
    "tr" -> "futbol maçı dün geceki yoğun kar yağışı nedeniyle iptal edildi",
    "tr" -> "ekonomistler fiyatların önümüzdeki aylarda yavaşça yükselmesini bekliyor",
    "tr" -> "bütün yazı büyükannesinin evinin çatısını onarmakla geçirdi",
    "tr" -> "öğrenciler ödevlerini ay sonundan önce teslim etmelidir",
    "tr" -> "açık pencereden gelen hafif esinti yağmur kokusunu taşıyordu",
    "tr" -> "şirket gelecek yıl bölgede üç yeni fabrika açmayı planlıyor",
    "tr" -> "en yakın tren istasyonunun nerede olduğunu söyleyebilir misiniz")

  val defaultLangs: IndexedSeq[String] = seedCorpus.map(_._1).distinct.sorted.toIndexedSeq

  /** Default model: fitted naive-Bayes log-odds over the seed corpus
    * (2^14 buckets). Gated at >=95% held-out accuracy by LangIdAccuracySpec. */
  lazy val default: LangIdModel = fit(seedCorpus)
}
