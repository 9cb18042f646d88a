package graft.pipeline

import graft.GraftSession
import org.apache.spark.sql.functions._

/** spark-submit entry for the composed curation run: documents (+
  * embeddings when present) through exact dedup → line dedup → near-dup
  * components → substring gate → quality gates → SemDeDup → PII scrub →
  * packing, every stage a content-addressed parquet checkpoint under
  * `outDir` (kill it at any point and rerun: completed stages are skipped,
  * the interrupted stage and everything after recompute).
  *
  * Usage: CurationMain [sfDir] [outDir]
  */
object CurationMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curation_out")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-curation")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val embPath = java.nio.file.Paths.get(s"$sfDir/embeddings.parquet")
    val embeddings =
      if (java.nio.file.Files.exists(embPath))
        Some(spark.read.parquet(embPath.toString).select("vec_id", "embedding"))
      else None
    val stages = Curation.runCheckpointed(spark, docs, embeddings, outDir,
      inputFp = QualityPipeline.inputFingerprint(sfDir))
    for ((name, path) <- stages) {
      val n = spark.read.parquet(path).count()
      println(f"stage=$name%-10s rows=$n%-8d $path")
    }
    spark.stop()
  }
}
