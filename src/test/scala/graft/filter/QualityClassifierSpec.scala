package graft.filter

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Quality gate for the trained keep/drop classifier: held-out accuracy,
  * bit-determinism of the distributed fit, and edge handling. */
class QualityClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text").cache()

  // the SAME weak-label recipe the pinned q55 model trains on
  private def labeledAll =
    QualityClassifier.weakLabels(docs, $"doc_id", $"text")

  test("held-out accuracy >= 0.95 on both classes") {
    val all = labeledAll
    // hash split so train/test are disjoint and layout-independent
    val isTest = pmod(graft.functions.TextFunctions.hash60(
      concat($"id".cast("string"), $"y")), lit(5)) === 0
    val train = all.filter(!isTest)
    val test = all.filter(isTest).select("text", "y").as[(String, Double)].collect()
    val model = QualityClassifier.fit(
      train.select($"text".as("_1"), $"y".as("_2")).as[(String, Double)], epochs = 60)
    val (tp, tn, np, nn) = test.foldLeft((0, 0, 0, 0)) { case ((tp, tn, np, nn), (t, y)) =>
      val k = model.keep(t)
      if (y == 1.0) (tp + (if (k) 1 else 0), tn, np + 1, nn)
      else (tp, tn + (if (!k) 1 else 0), np, nn + 1)
    }
    assert(np > 5 && nn > 5, s"degenerate split np=$np nn=$nn")
    assert(tp.toDouble / np >= 0.95, s"keep recall ${tp.toDouble / np} ($tp/$np)")
    assert(tn.toDouble / nn >= 0.95, s"drop recall ${tn.toDouble / nn} ($tn/$nn)")
  }

  test("distributed fit is bit-identical under different partition layouts") {
    val l = labeledAll.select($"text".as("_1"), $"y".as("_2")).as[(String, Double)]
    val m1 = QualityClassifier.fit(l.repartition(3), epochs = 5)
    val m2 = QualityClassifier.fit(l.repartition(17), epochs = 5)
    assert(m1.bias == m2.bias)
    assert(java.util.Arrays.equals(m1.weights, m2.weights))
  }

  test("empty and null text fall back to the bias prior") {
    val l = labeledAll.select($"text".as("_1"), $"y".as("_2")).as[(String, Double)]
    val m = QualityClassifier.fit(l, epochs = 3)
    assert(m.score("") == m.score("   "))
    assert(m.score(null) == m.score(""))
  }
}
