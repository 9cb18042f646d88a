package graft.functions

/** Per-language stopword lists for jusText's stopword-density mode
  * (Pomikálek 2011 §4: a block whose stopword density falls below the low
  * threshold is boilerplate regardless of length — keyword stuffing, tag
  * clouds, product-name grids — while genuine prose in the language is
  * saturated with function words).
  *
  * Lists are the high-frequency closed-class words of each language —
  * standard public linguistic knowledge (articles, prepositions, pronouns,
  * auxiliaries), deliberately small: jusText's density test needs coverage
  * of the function-word mass, not lexicon breadth. A production deployment
  * swaps in the full published jusText lists; the registry shape is the
  * contract.
  */
object JusTextStopwords {

  val en: Set[String] = Set(
    "the", "a", "an", "and", "or", "but", "if", "then", "else", "of", "to",
    "in", "on", "at", "by", "for", "with", "from", "as", "is", "are", "was",
    "were", "be", "been", "being", "am", "it", "its", "this", "that",
    "these", "those", "he", "she", "they", "we", "you", "i", "me", "him",
    "her", "them", "us", "my", "his", "their", "our", "your", "not", "no",
    "nor", "do", "does", "did", "done", "have", "has", "had", "having",
    "will", "would", "shall", "should", "can", "could", "may", "might",
    "must", "there", "here", "what", "which", "who", "whom", "whose",
    "when", "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "only", "own", "same", "so",
    "than", "too", "very", "just", "about", "above", "after", "again",
    "against", "before", "below", "between", "during", "into", "over",
    "through", "under", "until", "up", "down", "out", "off", "once",
    "because", "while", "also")

  val de: Set[String] = Set(
    "der", "die", "das", "den", "dem", "des", "ein", "eine", "einen",
    "einem", "einer", "eines", "und", "oder", "aber", "wenn", "dann",
    "als", "wie", "von", "zu", "zum", "zur", "in", "im", "an", "am", "auf",
    "bei", "mit", "nach", "aus", "für", "über", "unter", "vor", "durch",
    "gegen", "ohne", "um", "ist", "sind", "war", "waren", "sein", "bin",
    "bist", "wird", "werden", "wurde", "wurden", "hat", "haben", "hatte",
    "hatten", "kann", "können", "konnte", "muss", "soll", "will", "nicht",
    "kein", "keine", "ich", "du", "er", "sie", "es", "wir", "ihr", "mein",
    "dein", "ihre", "unser", "euer", "dieser", "diese", "dieses", "auch",
    "noch", "nur", "schon", "sehr", "mehr", "man", "was", "wer", "wo",
    "warum", "dass", "weil", "doch")

  val fr: Set[String] = Set(
    "le", "la", "les", "un", "une", "des", "du", "de", "d", "et", "ou",
    "mais", "si", "alors", "que", "qui", "quoi", "dont", "où", "à", "au",
    "aux", "en", "dans", "sur", "sous", "par", "pour", "avec", "sans",
    "chez", "entre", "vers", "est", "sont", "était", "étaient", "être",
    "suis", "es", "sera", "seront", "a", "ont", "avait", "avaient",
    "avoir", "ai", "as", "peut", "peuvent", "pouvait", "doit", "veut",
    "ne", "pas", "plus", "jamais", "rien", "personne", "je", "tu", "il",
    "elle", "on", "nous", "vous", "ils", "elles", "mon", "ton", "son",
    "ma", "ta", "sa", "mes", "tes", "ses", "notre", "votre", "leur", "ce",
    "cet", "cette", "ces", "aussi", "encore", "très", "bien", "tout",
    "toute", "tous", "toutes", "comme", "quand", "parce")

  /** lang code (as [[graft.filter.LangIdModel]] predicts it) → list. */
  val lists: Map[String, Set[String]] = Map("en" -> en, "de" -> de, "fr" -> fr)
}
