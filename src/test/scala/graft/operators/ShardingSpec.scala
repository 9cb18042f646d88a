package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Seeded training-shard shuffle: layout-invariant, balanced, epoch
  * reshuffles independent, written shards carry the permutation. */
class ShardingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select($"doc_id".cast("long").as("doc_id")).cache()

  test("assignment is a layout-invariant permutation: every doc exactly once, positions dense per shard") {
    val a = Sharding.assignShards(docs, $"doc_id", 8, "ep0")
    val b = Sharding.assignShards(docs.repartition(17), $"doc_id", 8, "ep0")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    assert(rows(a) == rows(b), "partition layout must not change the permutation")
    val n = docs.count()
    assert(a.count() == n && a.select("doc_id").distinct().count() == n)
    // positions are 1..count(shard) with no gaps
    val dense = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1L)
    assert(dense.isEmpty, "in-shard positions must be dense 1..n")
  }

  test("shards are balanced and a new salt is a genuinely different permutation") {
    val n = docs.count()
    val a = Sharding.assignShards(docs, $"doc_id", 8, "ep0")
    val sizes = a.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(sizes.size == 8, s"all 8 shards populated: $sizes")
    val expect = n / 8.0
    assert(sizes.values.forall(s => math.abs(s - expect) < 6 * math.sqrt(expect)),
      s"shard sizes within 6 sigma of uniform: $sizes")
    val b = Sharding.assignShards(docs, $"doc_id", 8, "ep1")
    val moved = a.select("doc_id", "shard").except(b.select("doc_id", "shard")).count()
    assert(moved > n / 2, "a new salt must reshuffle most docs across shards")
  }

  test("curriculumShards: same membership as assignShards, in-shard order follows the curriculum") {
    val scored = docs.withColumn("score", ($"doc_id" * 37) % 100)
    val cur = Sharding.curriculumShards(scored, $"doc_id", 4,
      Seq($"score".asc), "ep0")
    // membership identical to the plain seeded shuffle at the same salt
    val plain = Sharding.assignShards(docs, $"doc_id", 4, "ep0")
    assert(cur.select("doc_id", "shard").as[(Long, Long)].collect().toSet ==
      plain.select("doc_id", "shard").as[(Long, Long)].collect().toSet)
    // within every shard, pos order is nondecreasing in the score
    val orderedPerShard = cur.as[(Long, Long, Long, Long)].collect() // doc_id, score, shard, pos
      .groupBy(_._3).values.map { rows =>
        val byPos = rows.sortBy(_._4).map(_._2)
        byPos.zip(byPos.tail).forall { case (a, b) => a <= b }
      }
    assert(orderedPerShard.forall(identity), "curriculum order violated inside a shard")
    // layout invariance
    val cur2 = Sharding.curriculumShards(scored.repartition(13), $"doc_id", 4,
      Seq($"score".asc), "ep0")
    assert(cur.collect().toSet == cur2.collect().toSet)
  }

  test("writeShards materializes one file per shard, rows in shuffle order") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Sharding.writeShards(docs, out, $"doc_id", 4, "ep0")
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("shard").distinct().count() == 4)
    for (k <- 0 until 4) {
      val dir = new java.io.File(s"$out/shard=$k")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k must be one file, got ${files.length}")
      // file row order = the seeded permutation: hashes monotone nondecreasing
      val hs = spark.read.parquet(files.head.getPath)
        .select(graft.functions.TextFunctions.hash60(
          concat($"doc_id".cast("string"), lit("|ep0"))).as("h"))
        .as[Long].collect()
      assert(hs.zip(hs.tail).forall { case (x, y) => x <= y },
        s"shard $k rows must be in shuffle-hash order")
    }
    // the written (shard, in-file order) equals assignShards' (shard, pos)
    val assigned = Sharding.assignShards(docs, $"doc_id", 4, "ep0")
      .select("doc_id", "shard").as[(Long, Long)].collect().toSet
    val written = back.select($"doc_id", $"shard".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(written == assigned)
  }
}
