package graft.filter

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy gate for the language identifier (the driver fixtures' `lang`
  * column is random metadata over English-ish word salad, so the gate needs
  * its own labeled sample): generic in-language sentences, none of which
  * appear in the model's profile tables verbatim. Target: ≥95% overall,
  * 100% on non-Latin scripts (those ride the script-range features).
  */
class LangIdAccuracySpec extends AnyFunSuite {

  private val latin: Seq[(String, String)] = Seq(
    // English
    "en" -> "the quick brown fox jumps over the lazy dog near the river bank",
    "en" -> "scientists discovered a new species of butterfly in the mountains of peru",
    "en" -> "the government announced new measures to support small businesses this year",
    "en" -> "she walked slowly through the garden admiring the flowers and trees",
    "en" -> "the committee will meet next week to discuss the proposed changes",
    "en" -> "children love to play outside when the weather is warm and sunny",
    "en" -> "the history of this ancient city goes back more than two thousand years",
    "en" -> "please remember to turn off the lights before you leave the office",
    "en" -> "the train arrived at the station exactly on time despite the storm",
    "en" -> "reading books is one of the best ways to improve your knowledge",
    // German
    "de" -> "der schnelle braune fuchs springt über den faulen hund am flussufer",
    "de" -> "die regierung hat neue maßnahmen zur unterstützung kleiner unternehmen angekündigt",
    "de" -> "wissenschaftler entdeckten eine neue schmetterlingsart in den bergen",
    "de" -> "sie ging langsam durch den garten und bewunderte die blumen",
    "de" -> "der ausschuss wird sich nächste woche treffen um die änderungen zu besprechen",
    "de" -> "kinder spielen gerne draußen wenn das wetter warm und sonnig ist",
    "de" -> "die geschichte dieser alten stadt reicht mehr als zweitausend jahre zurück",
    "de" -> "bitte denken sie daran das licht auszuschalten bevor sie das büro verlassen",
    "de" -> "der zug kam trotz des sturms pünktlich am bahnhof an",
    "de" -> "bücher lesen ist eine der besten möglichkeiten sein wissen zu verbessern",
    // French
    "fr" -> "le renard brun rapide saute par-dessus le chien paresseux près de la rivière",
    "fr" -> "le gouvernement a annoncé de nouvelles mesures pour soutenir les petites entreprises",
    "fr" -> "les scientifiques ont découvert une nouvelle espèce de papillon dans les montagnes",
    "fr" -> "elle marchait lentement dans le jardin en admirant les fleurs et les arbres",
    "fr" -> "le comité se réunira la semaine prochaine pour discuter des changements proposés",
    "fr" -> "les enfants aiment jouer dehors quand le temps est chaud et ensoleillé",
    "fr" -> "l'histoire de cette ville ancienne remonte à plus de deux mille ans",
    "fr" -> "n'oubliez pas d'éteindre les lumières avant de quitter le bureau",
    "fr" -> "le train est arrivé à la gare exactement à l'heure malgré la tempête",
    "fr" -> "lire des livres est l'un des meilleurs moyens d'améliorer ses connaissances",
    // Spanish
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso cerca del río",
    "es" -> "el gobierno anunció nuevas medidas para apoyar a las pequeñas empresas",
    "es" -> "los científicos descubrieron una nueva especie de mariposa en las montañas",
    "es" -> "ella caminaba despacio por el jardín admirando las flores y los árboles",
    "es" -> "el comité se reunirá la próxima semana para discutir los cambios propuestos",
    "es" -> "a los niños les encanta jugar afuera cuando el clima es cálido y soleado",
    "es" -> "la historia de esta antigua ciudad se remonta a más de dos mil años",
    "es" -> "por favor recuerda apagar las luces antes de salir de la oficina",
    "es" -> "el tren llegó a la estación exactamente a tiempo a pesar de la tormenta",
    "es" -> "leer libros es una de las mejores maneras de mejorar tus conocimientos",
    // Italian
    "it" -> "la veloce volpe marrone salta sopra il cane pigro vicino al fiume",
    "it" -> "il governo ha annunciato nuove misure per sostenere le piccole imprese",
    "it" -> "gli scienziati hanno scoperto una nuova specie di farfalla nelle montagne",
    "it" -> "camminava lentamente nel giardino ammirando i fiori e gli alberi",
    "it" -> "il comitato si riunirà la prossima settimana per discutere le modifiche proposte",
    "it" -> "ai bambini piace giocare fuori quando il tempo è caldo e soleggiato",
    "it" -> "la storia di questa antica città risale a più di duemila anni fa",
    "it" -> "per favore ricordati di spegnere le luci prima di lasciare l'ufficio",
    "it" -> "il treno è arrivato alla stazione esattamente in orario nonostante la tempesta",
    "it" -> "leggere libri è uno dei modi migliori per migliorare le proprie conoscenze",
    // Portuguese
    "pt" -> "a rápida raposa marrom salta sobre o cão preguiçoso perto do rio",
    "pt" -> "o governo anunciou novas medidas para apoiar as pequenas empresas",
    "pt" -> "os cientistas descobriram uma nova espécie de borboleta nas montanhas",
    "pt" -> "ela caminhava devagar pelo jardim admirando as flores e as árvores",
    "pt" -> "o comitê se reunirá na próxima semana para discutir as mudanças propostas",
    "pt" -> "as crianças adoram brincar lá fora quando o tempo está quente e ensolarado",
    "pt" -> "a história desta cidade antiga remonta a mais de dois mil anos",
    "pt" -> "por favor lembre-se de apagar as luzes antes de sair do escritório",
    "pt" -> "o trem chegou à estação exatamente na hora apesar da tempestade",
    "pt" -> "ler livros é uma das melhores maneiras de melhorar seus conhecimentos",
    // Dutch
    "nl" -> "de snelle bruine vos springt over de luie hond bij de rivier",
    "nl" -> "de regering kondigde nieuwe maatregelen aan om kleine bedrijven te steunen",
    "nl" -> "wetenschappers ontdekten een nieuwe vlindersoort in de bergen",
    "nl" -> "ze liep langzaam door de tuin en bewonderde de bloemen en bomen",
    "nl" -> "de commissie komt volgende week bijeen om de voorgestelde wijzigingen te bespreken",
    "nl" -> "kinderen spelen graag buiten als het weer warm en zonnig is",
    "nl" -> "de geschiedenis van deze oude stad gaat meer dan tweeduizend jaar terug",
    "nl" -> "vergeet niet het licht uit te doen voordat je het kantoor verlaat",
    "nl" -> "de trein kwam ondanks de storm precies op tijd op het station aan",
    "nl" -> "boeken lezen is een van de beste manieren om je kennis te verbeteren",
    // Polish
    "pl" -> "szybki brązowy lis przeskakuje nad leniwym psem nad rzeką",
    "pl" -> "rząd ogłosił nowe środki wsparcia dla małych przedsiębiorstw",
    "pl" -> "naukowcy odkryli nowy gatunek motyla w górach",
    "pl" -> "szła powoli przez ogród podziwiając kwiaty i drzewa",
    "pl" -> "komisja spotka się w przyszłym tygodniu aby omówić proponowane zmiany",
    "pl" -> "dzieci uwielbiają bawić się na dworze gdy pogoda jest ciepła i słoneczna",
    "pl" -> "historia tego starożytnego miasta sięga ponad dwóch tysięcy lat",
    "pl" -> "proszę pamiętać o wyłączeniu światła przed wyjściem z biura",
    "pl" -> "pociąg przyjechał na stację dokładnie na czas pomimo burzy",
    "pl" -> "czytanie książek to jeden z najlepszych sposobów na poszerzanie wiedzy",
    // Turkish
    "tr" -> "hızlı kahverengi tilki nehrin yanındaki tembel köpeğin üzerinden atlar",
    "tr" -> "hükümet küçük işletmeleri desteklemek için yeni önlemler açıkladı",
    "tr" -> "bilim insanları dağlarda yeni bir kelebek türü keşfetti",
    "tr" -> "bahçede yavaşça yürüyerek çiçekleri ve ağaçları hayranlıkla izledi",
    "tr" -> "komite önerilen değişiklikleri görüşmek üzere gelecek hafta toplanacak",
    "tr" -> "çocuklar hava sıcak ve güneşli olduğunda dışarıda oynamayı sever",
    "tr" -> "bu eski şehrin tarihi iki bin yıldan daha eskiye dayanıyor",
    "tr" -> "lütfen ofisten çıkmadan önce ışıkları kapatmayı unutmayın",
    "tr" -> "tren fırtınaya rağmen istasyona tam zamanında vardı",
    "tr" -> "kitap okumak bilgini geliştirmenin en iyi yollarından biridir")

  private val scripts: Seq[(String, String)] = Seq(
    "ko" -> "오늘 날씨가 정말 좋아서 공원에 산책을 갔습니다",
    "ko" -> "한국의 전통 음식은 세계적으로 유명합니다",
    "ja" -> "今日はとても良い天気なので公園へ散歩に行きました",
    "ja" -> "日本の伝統的な料理は世界中で有名です",
    "zh" -> "今天天气很好所以我去公园散步了",
    "zh" -> "中国的传统美食在世界各地都很有名",
    "ru" -> "сегодня прекрасная погода поэтому мы пошли гулять в парк",
    "ru" -> "русская литература известна во всем мире",
    "ar" -> "الطقس جميل اليوم لذلك ذهبنا للتنزه في الحديقة",
    "ar" -> "المطبخ العربي مشهور في جميع أنحاء العالم")

  test("non-Latin scripts: 100% via script-range features") {
    val m = LangIdModel.default
    for ((lang, text) <- scripts) {
      val (pred, conf) = m.classify(text)
      assert(pred == lang, s"'$text' → $pred (want $lang, conf $conf)")
    }
  }

  test("Latin languages: >=95% accuracy on the held-out sample") {
    val m = LangIdModel.default
    val results = latin.map { case (lang, text) =>
      val (pred, _) = m.classify(text)
      (lang, pred, text)
    }
    val wrong = results.filter { case (l, p, _) => l != p }
    val acc = 1.0 - wrong.size.toDouble / results.size
    val detail = wrong.map { case (l, p, t) => s"  $l→$p: $t" }.mkString("\n")
    assert(acc >= 0.95, f"accuracy $acc%.3f < 0.95; misclassified:\n$detail")
  }

  test("allocation-free range bucket equals MurmurHash3.stringHash of the substring") {
    val m = LangIdModel.default
    val rnd = new scala.util.Random(99L)
    val alphabet = " abcdeéßİü한글щε.-"
    for (_ <- 0 until 5000) {
      val s = (0 until (2 + rnd.nextInt(30)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val n = 2 + rnd.nextInt(2) // 2- and 3-grams, the scorer's widths
      if (s.length >= n) {
        val j = rnd.nextInt(s.length - n + 1)
        val want = java.lang.Math.floorMod(
          scala.util.hashing.MurmurHash3.stringHash(s.substring(j, j + n), 42), m.dim)
        assert(m.bucketRange(s, j, n) == want, s"'$s' at $j width $n")
      }
    }
  }
}
