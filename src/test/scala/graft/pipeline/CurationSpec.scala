package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** The composed curation run: stage semantics of the chain, and exact
  * resume-after-kill across a dedup stage boundary (the failure mode that
  * actually bites composed 100-TB jobs). */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  /** Small corpus with planted work for each stage (mirrors q64's plants). */
  private lazy val corpus = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").filter($"doc_id" < 120)
      .withColumn("text", concat($"text",
        lit("\nSubscribe to our newsletter for updates")))
    val copies = d.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val mutants = d.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        array_join(slice(split(trim($"text"), "\\s+"), 3, 1000000), " ").as("text"))
    d.unionByName(copies).unionByName(mutants)
  }

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  test("stage chain: every planted duplicate class dies at its stage") {
    var cur = corpus
    val byStage = Curation.stages().map { case (name, fn) =>
      cur = fn(cur).localCheckpoint()
      name -> cur.select("doc_id").as[Long].collect().toSet
    }.toMap
    // exact copies die at the exact stage, originals survive
    assert(byStage("exact").forall(id => id < 1000000L || id >= 2000000L))
    assert(!byStage("exact").exists(id => id >= 1000000L && id < 2000000L))
    // mutants (still present after exact) die at the near-dup stage
    assert(byStage("lines").exists(_ >= 2000000L))
    assert(!byStage("neardup").exists(_ >= 2000000L))
    // survivor sets only shrink, and originals of the planted pairs survive
    assert(byStage("neardup").subsetOf(byStage("lines")))
    assert(byStage("quality").subsetOf(byStage("substring")))
    assert(byStage("quality").nonEmpty, "chain must not empty the corpus")
  }

  test("checkpointed run resumes after a kill without recomputing completed stages") {
    val outA = Files.createTempDirectory("curationA").toString
    val outB = Files.createTempDirectory("curationB").toString
    val inDir = Files.createTempDirectory("curationIn").toString
    corpus.write.mode("overwrite").parquet(inDir)
    val docs = spark.read.parquet(inDir)
    val fp = QualityPipeline.inputFingerprint(inDir)

    // clean reference run
    val ref = Curation.runCheckpointed(spark, docs, Some(embs), outB, inputFp = fp)
    val refFinal = spark.read.parquet(ref.last._2)
      .select("doc_id", "shard", "seq_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq

    // run A fully, then simulate a kill DURING the substring stage:
    // everything from substring on is lost, exact/lines/neardup survive
    val stagesA = Curation.runCheckpointed(spark, docs, Some(embs), outA, inputFp = fp)
    val names = stagesA.map(_._1)
    assert(names == Seq("exact", "lines", "neardup", "substring", "quality",
      "semdedup", "scrub", "pack"))
    val killFrom = names.indexOf("substring")
    for ((_, path) <- stagesA.drop(killFrom)) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
    val preserved = stagesA.take(killFrom).map { case (n, p) =>
      n -> Files.getLastModifiedTime(Paths.get(p, "_SUCCESS")).toMillis
    }

    // resume: completed stages untouched (exact resume), lost stages rebuilt
    val resumed = Curation.runCheckpointed(spark, docs, Some(embs), outA, inputFp = fp)
    for ((name, t0) <- preserved) {
      val p = resumed.find(_._1 == name).get._2
      assert(Files.getLastModifiedTime(Paths.get(p, "_SUCCESS")).toMillis == t0,
        s"completed stage $name must not recompute on resume")
    }
    val resumedFinal = spark.read.parquet(resumed.last._2)
      .select("doc_id", "shard", "seq_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(resumedFinal == refFinal, "resumed run must equal a clean run")
  }

  test("lake-scan front end: curation over a PageLake equals the same pages read directly") {
    val lakeDir = Files.createTempDirectory("curationLake").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
      .filter(abs(hash($"url")) % 4 === 0) // small deterministic subset
    graft.sources.PageLake.write(pages, lakeDir)
    def survivors(src: org.apache.spark.sql.DataFrame): Set[Long] = {
      var cur = Curation.fromLake(src)
      for ((_, fn) <- Curation.stages()) cur = fn(cur).localCheckpoint()
      cur.select("doc_id").as[Long].collect().toSet
    }
    val direct = survivors(pages.select("url", "text"))
    val viaLake = survivors(graft.sources.PageLake.read(spark, lakeDir)
      .select("url", "text"))
    assert(viaLake == direct && direct.nonEmpty,
      "lake round-trip must not change curation results (url-hash ids are stable)")
  }

  test("changed input invalidates the whole chain (content-addressed, never stale)") {
    val out = Files.createTempDirectory("curationC").toString
    val inDir = Files.createTempDirectory("curationInC").toString
    corpus.filter($"doc_id" < 60).write.mode("overwrite").parquet(inDir)
    val first = Curation.runCheckpointed(spark, spark.read.parquet(inDir), None,
      out, inputFp = QualityPipeline.inputFingerprint(inDir))
    val nFirst = spark.read.parquet(first.find(_._1 == "quality").get._2).count()
    // new input: more docs — every stage must recompute off the new data
    corpus.write.mode("overwrite").parquet(inDir)
    val second = Curation.runCheckpointed(spark, spark.read.parquet(inDir), None,
      out, inputFp = QualityPipeline.inputFingerprint(inDir))
    val nSecond = spark.read.parquet(second.find(_._1 == "quality").get._2).count()
    assert(nSecond > nFirst, "stale checkpoints must not survive an input change")
  }
}
