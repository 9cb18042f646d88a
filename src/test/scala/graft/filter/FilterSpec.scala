package graft.filter

import graft.SparkSpecBase

class FilterSpec extends SparkSpecBase {

  test("langid: script detection for non-Latin languages") {
    val m = LangIdModel.default
    assert(m.classify("안녕하세요. 오늘 회의에 참석해 주셔서 감사합니다. 다음 주에 다시 뵙겠습니다.")._1 == "ko")
    assert(m.classify("今天天气很好，我们一起去公园散步吧。明天还要上班。")._1 == "zh")
    assert(m.classify("今日はいい天気ですね。こんにちは、ありがとうございます。")._1 == "ja")
    assert(m.classify("Сегодня хорошая погода. Мы пойдём гулять в парк.")._1 == "ru")
  }

  test("langid: n-gram scoring for Latin languages") {
    val m = LangIdModel.default
    assert(m.classify("The quick brown fox jumps over the lazy dog and runs into the forest of the north.")._1 == "en")
    assert(m.classify("Der schnelle braune Fuchs springt über den faulen Hund und läuft in den Wald hinein.")._1 == "de")
    assert(m.classify("Le renard brun rapide saute par-dessus le chien paresseux dans la forêt que nous aimons.")._1 == "fr")
    assert(m.classify("El rápido zorro marrón salta sobre el perro perezoso en el bosque que los niños aman.")._1 == "es")
  }

  test("langid: deterministic and total") {
    val m = LangIdModel.default
    for (t <- Seq("", "12345", "!!!", "a", "mixed 한국어 and english text here")) {
      assert(m.classify(t) == m.classify(t))
    }
    assert(m.classify("")._1 == "und")
    assert(m.classify("12345 678 90")._1 == "und")
  }

  test("perplexity: in-domain text scores far lower than out-of-domain") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String]
    val lm = BigramLM.fit(texts, maxVocab = 4096)
    val inDomain = texts.head()
    val pplIn = lm.perplexity(inDomain)
    val pplOut = lm.perplexity("zzz qqq xxyyzz foo999 barbar bazbaz quux777 frobnicate")
    assert(pplIn < pplOut / 10, s"in=$pplIn out=$pplOut")
    assert(pplIn > 1.0)
  }

  test("perplexity: deterministic across fits") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String]
    val a = BigramLM.fit(texts, maxVocab = 1024).perplexity("key agg row scan slow fast")
    val b = BigramLM.fit(texts, maxVocab = 1024).perplexity("key agg row scan slow fast")
    assert(a == b)
  }
}
