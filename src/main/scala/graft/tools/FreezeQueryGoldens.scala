package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.DataFrame

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Freezes canonical dumps of the queries that have no SQL oracle (model- or
  * expression-defined semantics that DuckDB can't re-express): langid,
  * ANN candidates, winnow pairs, multimodal features, the full pipeline.
  * QueryGoldensSpec replays each query at sf0.001 and diffs against these.
  * Regenerate ONLY on an intentional semantics change. */
object QueryGoldens {
  /** Queries pinned by goldens (every other rows-only query is covered by a
    * value-exact parity suite instead — see README coverage table). */
  // NOTE: q45's values depend on the JRE-bundled zlib (Deflater level 1) —
  // stable within one JDK build (this sandbox pins one) but not guaranteed
  // across zlib variants; regenerate q45's golden when changing JDKs.
  val pinned: Seq[String] = Seq(
    "q19_ann_lsh", "q22_langid", "q23_pipeline_hosts", "q24_pipeline_pages",
    "q27_media_pipeline", "q31_ann_ivf", "q45_deflate",
    "q49_sketch_stats", "q55_quality_classifier", "q57_bpe_vocab",
    "q60_bpe_encode", "q61_semdedup", "q66_incr_semdedup", "q69_dsir_select",
    "q87_pack_bpe")

  val sfDir = "/root/testdata/sf0.001"
  val goldenDir = "src/test/resources/goldens/queries"

  /** Canonical text form: columns sorted by name, one row per line, rows
    * sorted lexicographically; deterministic float formatting (all pinned
    * queries already round their doubles). */
  def canonical(df: DataFrame): String = {
    import org.apache.spark.sql.functions.col
    val cols = df.columns.sorted
    val rows = df.select(cols.map(col): _*).collect().map { r =>
      cols.indices.map { i =>
        r.get(i) match {
          case null => "NULL"
          case s: Seq[_] => s.mkString("[", ",", "]")
          case b: Array[Byte] => b.map("%02x".format(_)).mkString
          case x => x.toString
        }
      }.mkString("|")
    }.sorted
    (cols.mkString("|") +: rows).mkString("\n") + "\n"
  }
}

object FreezeQueryGoldens {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "freeze-query-goldens")
    Files.createDirectories(Paths.get(QueryGoldens.goldenDir))
    for (name <- QueryGoldens.pinned) {
      val df = SparkEntry.queries(name)(spark, QueryGoldens.sfDir)
      val out = Paths.get(QueryGoldens.goldenDir, s"$name.txt")
      Files.write(out, QueryGoldens.canonical(df).getBytes(StandardCharsets.UTF_8))
      println(s"wrote $out")
    }
    spark.stop()
  }
}
