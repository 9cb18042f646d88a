package graft.pipeline

import graft.GraftSession
import org.apache.spark.sql.functions._

/** spark-submit entry for the composed curation run: lake scan (or the
  * documents fixture) + embeddings when present, through exact dedup →
  * line dedup → near-dup components → substring gate → quality gates →
  * SemDeDup → PII scrub → packing, every stage a content-addressed parquet
  * checkpoint under `outDir` (kill it at any point and rerun: completed
  * stages are skipped, the interrupted stage and everything after
  * recompute).
  *
  * Usage: CurationMain [inDir] [outDir] — `inDir` is either a PageLake
  * directory (detected by its crawl_date= partitions; pages are scanned
  * and keyed by url hash) or a driver fixture dir holding
  * documents.parquet (+ embeddings.parquet).
  */
object CurationMain {
  def main(args: Array[String]): Unit = {
    val inDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curation_out")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-curation")
    val isLake = {
      val d = new java.io.File(inDir)
      d.isDirectory && d.listFiles() != null &&
        d.listFiles().exists(f => f.isDirectory && f.getName.startsWith("crawl_date="))
    }
    val docs =
      if (isLake) Curation.fromLake(graft.sources.PageLake.read(spark, inDir))
      else spark.read.parquet(s"$inDir/documents.parquet").select("doc_id", "text")
    val embPath = java.nio.file.Paths.get(s"$inDir/embeddings.parquet")
    val embeddings =
      if (!isLake && java.nio.file.Files.exists(embPath))
        Some(spark.read.parquet(embPath.toString).select("vec_id", "embedding"))
      else None
    val stages = Curation.runCheckpointed(spark, docs, embeddings, outDir,
      inputFp = QualityPipeline.inputFingerprint(inDir),
      onStage = (n, s) => println(f"stage=$n%-10s ${s}%8.1fs wall"))
    import spark.implicits._
    val counts = stages.zipWithIndex.map { case ((name, path), i) =>
      val n = spark.read.parquet(path).count()
      println(f"stage=$name%-10s rows=$n%-8d $path")
      (i + 1, name, n)
    }
    // metrics side-output: one row per stage (the ops table a composed
    // 100-TB run reports to dashboards alongside its lineage)
    counts.toDF("stage_no", "stage", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/metrics")
    // per-file lineage: every produced artifact file with its row count —
    // each output row of every stage is attributable to a concrete file of
    // a concrete checkpoint (metadata-scale: one footer-backed count per
    // file, no data scan)
    val lineage = stages.flatMap { case (name, path) =>
      spark.read.parquet(path)
        .groupBy(input_file_name().as("file")).count()
        .collect().map(r => (name, r.getString(0), r.getLong(1)))
    }
    lineage.toDF("stage", "file", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/lineage")
    spark.stop()
  }
}
