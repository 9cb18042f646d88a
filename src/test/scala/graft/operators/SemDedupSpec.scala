package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** SemDeDup: planted-duplicate behavior, brute-force parity of the drop
  * rule, and layout invariance. */
class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  private def withPlanted = {
    val planted = embs.filter($"vec_id" % 20 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    embs.unionByName(planted)
  }

  test("planted scaled copies are dropped, their originals kept") {
    val out = Similarity.semDedup(withPlanted, threshold = 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    val plantedIds = out.keys.filter(_ >= 100000L)
    assert(plantedIds.nonEmpty)
    for (p <- plantedIds) {
      assert(!out(p), s"scaled copy $p (cosine 1 to ${p - 100000}) must be dropped")
      assert(out(p - 100000L), s"original ${p - 100000} is the earliest in its ball — kept")
    }
  }

  test("drop rule matches the brute-force within-cluster reference") {
    val res = Similarity.semDedup(withPlanted, threshold = 0.99).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"), r.getAs[Boolean]("keep")))
    // brute force: normalize, group by the REPORTED cell, drop iff an
    // earlier-id same-cell vector is within the cosine threshold
    val unit = withPlanted.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      r.getLong(0) -> v.map(x => if (n > 0) x / n else 0.0)
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byCell = res.groupBy(_._2)
    for ((_, members) <- byCell; (id, _, keep) <- members) {
      val expectDrop = members.exists { case (other, _, _) =>
        other < id && cos(unit(other), unit(id)) >= 0.99
      }
      assert(keep == !expectDrop, s"vec $id: keep=$keep but brute force says drop=$expectDrop")
    }
  }

  test("result is invariant to input partition layout") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.semDedup(df, threshold = 0.99)
        .select("vec_id", "keep").as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run(withPlanted) == run(withPlanted.repartition(13)))
  }
}
