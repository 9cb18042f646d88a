package graft.operators

import graft.SparkSpecBase
import graft.pipeline.SyntheticPages
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(
    SyntheticPages.fromDocuments(spark, sfDir)).cache()

  test("synthetic media: deterministic ids, valid types, non-empty binary") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(m => Set("image", "audio", "video")(m.media_type)))
    assert(rows.forall(_.content.nonEmpty))
    val again = Multimodal.syntheticMedia(SyntheticPages.fromDocuments(spark, sfDir))
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(again == rows.map(_.media_id).sorted.toSeq)
  }

  test("decode stub produces type-consistent deterministic metadata") {
    val d = Multimodal.decode(media).collect()
    assert(d.length == media.count())
    for (x <- d) x.media_type match {
      case "image" => assert(x.meta.width >= 64 && x.meta.height >= 64 && x.meta.durationMs == 0)
      case "audio" => assert(x.meta.sampleRate >= 8000 && x.meta.width == 0)
      case "video" => assert(x.meta.nFrames >= 1 && x.meta.durationMs >= 1000)
    }
    val again = Multimodal.decode(media).collect()
    assert(again.map(x => (x.media_id, x.meta)).sortBy(_._1).toSeq ==
      d.map(x => (x.media_id, x.meta)).sortBy(_._1).toSeq)
  }

  test("feature extraction: fixed dim, deterministic, joinable with ANN ops") {
    val f = Multimodal.features(Multimodal.decode(media), dim = 16)
    val rows = f.collect()
    assert(rows.forall(_.getSeq[Float](2).length == 16))
    // plumb into the existing similarity operator (vec_id/embedding shape)
    val emb = f.select(col("media_id").as("vec_id"), col("embedding"))
    val top = Similarity.bruteForceTopK(emb, emb.limit(3), 2)
    assert(top.filter(col("rank") === 1).count() == 3)
  }

  test("resize caps dimensions and shrinks payload; non-images untouched") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, 256).collect()
    for (r <- resized if r.media_type == "image")
      assert(r.meta.width <= 256 && r.meta.height <= 256)
    val origAudio = decoded.filter(_.media_type == "audio").collect().map(x => x.media_id -> x.meta).toMap
    for (r <- resized if r.media_type == "audio")
      assert(r.meta == origAudio(r.media_id))
  }

  test("frame sampling explodes videos into bounded deterministic frames") {
    val frames = Multimodal.sampleFrames(Multimodal.decode(media)).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.media_id)
    for ((_, fs) <- byMedia) {
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length).toSeq)
      assert(fs.forall(f => f.ts_ms == f.frame_idx * 10000L))
    }
  }

  test("metadata-only reads prune the binary column at the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    Multimodal.decode(media).write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("media_id", "media_type", "meta")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("content"),
      s"binary column must be pruned:\n$plan")
  }
}
