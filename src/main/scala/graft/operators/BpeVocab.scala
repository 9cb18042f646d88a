package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning (Sennrich et al. 2016) for the
  * tokenizer-training step of a data pipeline.
  *
  * Split of labor at scale: the corpus-sized work — counting word
  * frequencies over 10¹² documents — is one Spark shuffle with map-side
  * combine on a uniform key; the merge loop itself then runs on the
  * frequency-capped word table (top `maxWords` types carry almost all pair
  * mass), which is driver-sized by construction — the same cap discipline as
  * `BigramLM.fit` / the IVF sample. That is also how production BPE trainers
  * work: none of them stream the raw corpus through the merge loop.
  *
  * Determinism: ties on pair frequency break lexicographically, the word
  * table is capped with a (count desc, word asc) order, and counts are exact
  * Longs — the same merges come out for any partition layout.
  */
object BpeVocab {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  final case class Model(merges: Seq[Merge]) extends Serializable {
    private val rankOf: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap

    /** Encode one word with the learned merges (lowest-rank pair first —
      * the standard BPE inference order). `</w>` marks the word end. */
    def encode(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var parts: Vector[String] =
        word.init.map(_.toString).toVector :+ (word.last.toString + "</w>")
      var done = false
      while (!done && parts.length > 1) {
        var best = Int.MaxValue
        var at = -1
        var i = 0
        while (i < parts.length - 1) {
          val r = rankOf.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) done = true
        else parts = (parts.take(at) :+ (parts(at) + parts(at + 1))) ++ parts.drop(at + 2)
      }
      parts
    }
  }

  /** Distributed word-frequency table: one shuffle, map-side combined,
    * capped to the top `maxWords` types (deterministic tie-break). */
  def wordCounts(df: DataFrame, textCol: String, maxWords: Int): Seq[(String, Long)] = {
    import df.sparkSession.implicits._
    df.select(explode(TF.tokensLower(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(maxWords)
      .as[(String, Long)].collect().toSeq
  }

  /** Learn `nMerges` BPE merges from the corpus.
    *
    * The merge loop is pair-indexed (pair → count, pair → words containing
    * it): each rank rewrites ONLY the words that contain the winning pair
    * and adjusts counts by the rewritten words' deltas — not a full recount
    * over the word table. The argmax scan stays a full pass over live pairs
    * so the lexicographic tie-break is order-independent (deterministic for
    * any layout). This is the structure real BPE trainers use; the naive
    * recount-everything loop is O(nMerges × total symbols) and takes hours
    * at a 32k-merge vocab. */
  def fit(df: DataFrame, textCol: String, nMerges: Int,
          maxWords: Int = 1 << 16): Model = {
    // word → symbol sequence (chars + </w> on the last), weighted by count
    val words: Array[(Array[String], Long)] = wordCounts(df, textCol, maxWords)
      .map { case (w, c) =>
        (w.init.map(_.toString).toArray :+ (w.last.toString + "</w>"), c)
      }.toArray

    val pairCounts = new java.util.HashMap[(String, String), Long]()
    // pair → word indices that contained it when last touched; entries may
    // go stale after rewrites — containment is re-checked before use
    val pairWords = new java.util.HashMap[(String, String), java.util.BitSet]()
    def addWordPairs(idx: Int, sign: Long): Unit = {
      val (syms, c) = words(idx)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = pairCounts.merge(p, sign * c, (a, b) => a + b)
        if (n <= 0) pairCounts.remove(p)
        else if (sign > 0)
          pairWords.computeIfAbsent(p, _ => new java.util.BitSet(words.length)).set(idx)
        i += 1
      }
    }
    var w = 0
    while (w < words.length) { addWordPairs(w, 1); w += 1 }

    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      if (pairCounts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        pairCounts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
            (c == best._2 && (p._1 < best._1._1 ||
              (p._1 == best._1._1 && p._2 < best._1._2)))) best = (p, c)
        }
        val ((l, r), c) = best
        merges += Merge(rank, l, r, c)
        val fused = l + r
        val affected = pairWords.remove((l, r))
        if (affected != null) {
          var idx = affected.nextSetBit(0)
          while (idx >= 0) {
            val (syms, wc) = words(idx)
            var contains = false
            var i = 0
            while (!contains && i < syms.length - 1) {
              contains = syms(i) == l && syms(i + 1) == r
              i += 1
            }
            if (contains) { // stale index entries are skipped
              addWordPairs(idx, -1)
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  out += fused; i += 2
                } else { out += syms(i); i += 1 }
              }
              words(idx) = (out.toArray, wc)
              addWordPairs(idx, 1)
            }
            idx = affected.nextSetBit(idx + 1)
          }
        }
        pairCounts.remove((l, r))
        rank += 1
      }
    }
    Model(merges.result())
  }
}
