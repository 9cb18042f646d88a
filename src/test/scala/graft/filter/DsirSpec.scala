package graft.filter

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** DSIR (Xie et al. 2023) gates: the fitted model is bit-deterministic under
  * partitioning, on-domain documents outweigh off-domain ones, and Gumbel
  * top-k selection is layout-invariant and strongly prefers the target
  * distribution. */
class DsirSpec extends SparkSpecBase {

  private val vocab = graft.queries.TextQueries.DsirVocab
  private def domainText(id: Long, offset: Int): String =
    (0 until 24).map(j => vocab(((id + j * 7 + offset) % vocab.size).toInt)).mkString(" ")

  private lazy val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("fit is bit-deterministic under repartitioning") {
    import spark.implicits._
    val target = (0L until 100L).map(i => domainText(i, 3)).toDF("text")
    val m1 = Dsir.fit(target, raw, col("text"), dim = 1 << 12)
    val m2 = Dsir.fit(target.repartition(7), raw.repartition(13), col("text"), dim = 1 << 12)
    assert(java.util.Arrays.equals(m1.logRatio, m2.logRatio))
  }

  test("on-domain text outweighs off-domain text") {
    import spark.implicits._
    val target = (0L until 100L).map(i => domainText(i, 3)).toDF("text")
    val model = Dsir.fit(target, raw, col("text"))
    val onDomain = model.logWeight(domainText(42L, 0))
    val offDomain = model.logWeight(
      raw.orderBy("doc_id").select("text").head().getString(0))
    assert(onDomain > 0 && offDomain < 0 && onDomain - offDomain > 10,
      s"on=$onDomain off=$offDomain")
    assert(model.logWeight("") == 0.0)
  }

  test("resampling selects the planted on-domain candidates, layout-invariantly") {
    val target = raw.select(graft.queries.TextQueries
      .dsirDomainText(col("doc_id"), offset = 3).as("text"))
    val planted = raw.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        graft.queries.TextQueries.dsirDomainText(col("doc_id"), offset = 0).as("text"))
    val candidates = raw.unionByName(planted)
    val model = Dsir.fit(target, raw, col("text"))
    val nPlanted = planted.count()
    val k = nPlanted.toInt + 10
    val sel = Dsir.resample(candidates, col("doc_id"), col("text"), model, k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel.size == k)
    // every planted on-domain candidate wins a slot — the log-weight gap
    // dwarfs the Gumbel noise (stddev ≈ 1.28)
    assert(sel.count(_ >= 500000L) == nPlanted, s"selected ${sel.count(_ >= 500000L)}")
    // layout invariance: noise is keyed on (id, seed), not on partitioning
    val sel2 = Dsir.resample(candidates.repartition(13), col("doc_id"), col("text"),
        model, k).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel2 == sel)
  }
}
