package graft.tools

import graft.GraftSession
import graft.operators.BpeVocab
import org.apache.spark.sql.functions._

/** Production-vocab BPE timing: the fixture corpus has only 31 distinct
  * words (merges exhaust at ~93), so the smoke derives a rich deterministic
  * vocabulary from it — each doc's md5 split into 4-hex-char chunks — and
  * fits a 4k-merge vocab (the q57/q60 fixtures run 64 merges; real vocabs
  * are 32k, and an accidental quadratic recount in the merge loop only
  * shows at this size). */
object BpeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nMerges = args.lift(0).map(_.toInt).getOrElse(4096)
    val spark = GraftSession.local(8, "bpe-smoke")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(regexp_replace(md5(col("text")), "(....)", "$1 ").as("text"))
    val t0 = System.nanoTime()
    val model = BpeVocab.fit(docs, "text", nMerges = nMerges, maxWords = 1 << 16)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BPESMOKE merges=${model.merges.length} sec=$sec%.2f")
    spark.stop()
  }
}
