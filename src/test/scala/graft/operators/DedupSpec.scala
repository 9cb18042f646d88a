package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text").cache()

  test("exact dedup groups exact copies and keeps min id as canonical") {
    val withCopy = docs.unionByName(
      docs.filter($"doc_id" === 0).select(lit(999L).as("doc_id"), $"text"))
    val groups = Dedup.exactGroups(withCopy, "doc_id", "text")
      .filter($"n_docs" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("canonical_id") == 0L)
    assert(groups.head.getAs[Long]("n_docs") == 2L)
  }

  test("minhash similarity estimate tracks exact jaccard for a near-dup") {
    val base = docs.filter($"doc_id" === 0)
    val mutated = base.select(lit(1L).as("doc_id"),
      array_join(slice(graft.functions.TextFunctions.tokens($"text"), 4, 100000), " ").as("text"))
    val two = base.select($"doc_id", $"text").unionByName(mutated)
    val sigs = Dedup.minhashSignatures(two, "doc_id", "text", k = 64)
      .collect().groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("i")).map(_.getAs[Long]("sig")).toSeq).toMap
    val est = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }.toDouble / 64
    val exact = Dedup.jaccardVerify(two, "doc_id", "text",
      Seq((0L, 1L)).toDF("id_a", "id_b")).head().getAs[Double]("jaccard")
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact")
    assert(exact > 0.8)
  }

  test("LSH candidates contain the planted near-duplicate pair") {
    val near = docs.filter($"doc_id" < 20)
      .select(($"doc_id" + 1000L).as("doc_id"),
        array_join(slice(graft.functions.TextFunctions.tokens($"text"), 3, 100000), " ").as("text"))
    val all = docs.unionByName(near)
    val pairs = Dedup.candidatePairs(Dedup.lshBands(
      Dedup.minhashSignatures(all, "doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 20).count(i => pairs.contains((i.toLong, i + 1000L)))
    assert(found >= 16, s"only $found/20 planted pairs found")
  }

  test("fast per-row minhash path is value-identical to the long form") {
    val sigsFast = Dedup.minhashSignaturesFast(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigsLong = Dedup.minhashSignatures(docs, "doc_id", "text").collect()
      .groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("i")).map(_.getAs[Long]("sig")).toSeq).toMap
    assert(sigsLong.keySet.subsetOf(sigsFast.keySet))
    for ((id, s) <- sigsLong) assert(sigsFast(id) == s, s"doc $id")
    // band digests identical too
    val bandsFast = Dedup.lshBandsFast(Dedup.minhashSignaturesFast(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val bandsLong = Dedup.lshBands(Dedup.minhashSignatures(docs, "doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("band")) -> r.getAs[String]("band_digest")).toMap
    for ((k, v) <- bandsLong) assert(bandsFast(k) == v, s"band $k")
  }

  test("fast minhash matches long form on text with leading/trailing \\t \\n (crawl whitespace)") {
    // Spark trim strips only ' '; split keeps leading/trailing empty tokens.
    // The per-row expression must shingle these exactly like the long form.
    val tricky = Seq(
      (1L, "\tthe quick brown fox jumps over the dog\n"),
      (2L, "  the quick brown fox jumps over the dog  "),
      (3L, "\n\nalpha beta gamma delta\t"),
      (4L, "one\ttwo\nthree four five"),
      (5L, " \t mixed   inner\t\twhitespace runs here \n ")
    ).toDF("doc_id", "text")
    val fast = Dedup.minhashSignaturesFast(tricky, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val long = Dedup.minhashSignatures(tricky, "doc_id", "text").collect()
      .groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("i")).map(_.getAs[Long]("sig")).toSeq).toMap
    assert(long.keySet == fast.keySet)
    for ((id, s) <- long) assert(fast(id) == s, s"doc $id diverges on whitespace tokenization")
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val base = docs.filter($"doc_id" === 0)
    val mutated = base.select(lit(1L).as("doc_id"),
      concat($"text", lit(" extra token")).as("text"))
    val far = docs.filter($"doc_id" === 7).select(lit(2L).as("doc_id"), $"text")
    val three = base.unionByName(mutated).unionByName(far)
    val sh = Dedup.simhash64(three, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(2L)),
      s"near=${hamming(sh(0L), sh(1L))} far=${hamming(sh(0L), sh(2L))}")
    assert(hamming(sh(0L), sh(1L)) <= 8)
  }

  test("hashed band digests induce exactly the md5-string form's buckets") {
    val sigs = Dedup.minhashSignaturesFast(docs, "doc_id", "text")
      .filter(element_at($"sigs", 1) =!= Long.MaxValue)
    val s = Dedup.lshBandsFast(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val h = Dedup.lshBandsHashed(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(s.keySet == h.keySet)
    // same candidate buckets: two (id, band) rows share a hashed digest iff
    // they share the md5 digest (both directions — merging OR splitting a
    // bucket would change the candidate set)
    for (ks <- s.keySet.groupBy(_._2).values.map(_.toSeq); a <- ks; b <- ks)
      assert((s(a) == s(b)) == (h(a) == h(b)), s"$a vs $b")
  }

  test("simhash expression equals the declarative explode/groupBy form") {
    // fixture corpus + the tokenizer's edge shapes: tab/newline framing
    // (trim strips only ' ', split keeps the resulting empty tokens),
    // empty and all-space docs (ONE "" token), repeated tokens (multiset
    // votes), non-ASCII (locale lowercasing path), mixed-case ASCII
    val edges = Seq(
      (9001L, "\tleading tab"), (9002L, "trailing newline\n"),
      (9003L, ""), (9004L, "   "), (9005L, "dup dup dup dup unique"),
      (9006L, "İstanbul ŞEHİR café"), (9007L, "MIXED Case TOKENS"),
      (9008L, " spaced  out  ")).toDF("doc_id", "text")
    val in = docs.unionByName(edges)
    val fast = Dedup.simhash64(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.simhash64Declarative(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
    // a NULL text yields no row in either form
    val withNull = edges.unionByName(
      Seq((9100L, null: String)).toDF("doc_id", "text"))
    assert(Dedup.simhash64(withNull, "doc_id", "text").count() == 8)
  }

  test("candidate-pair flood cap: 1k identical docs star-link linearly, not 500k pairs") {
    // An identical-doc flood puts every copy in the same (band, digest)
    // bucket; without the cap the self-join squares it (1000 copies →
    // ~499,500 pairs per band). Oversized buckets must star-link to the
    // bucket minimum: O(n) pairs, and the whole cluster still reaches
    // verify + connected components (dropping it would silently lose
    // near-dup clusters that are not byte-identical).
    val flood = (0L until 1000L).map(i =>
      (i, "the same exact boilerplate text repeated verbatim on every page"))
      .toDF("doc_id", "text")
    val bands = Dedup.lshBandsFast(Dedup.minhashSignaturesFast(flood, "doc_id", "text"))
    val star = Dedup.candidatePairs(bands, maxBucket = 64).collect()
    assert(star.length == 999, s"expected 999 star pairs, got ${star.length}")
    assert(star.forall(_.getLong(0) == 0L), "every member must link to the bucket min")
    // the star is enough for dup-group resolution: one component, labeled 0
    val comp = Dedup.connectedComponents(
        star.map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comp.length == 1000 && comp.forall(_._2 == 0L))
    // a small planted near-dup pair alongside the flood still surfaces
    val two = docs.filter($"doc_id" < 2).unionByName(flood)
    val bands2 = Dedup.lshBandsFast(Dedup.minhashSignaturesFast(
      two.unionByName(docs.filter($"doc_id" < 2)
        .select(($"doc_id" + 5000L).as("doc_id"), $"text")), "doc_id", "text"))
    val pairs2 = Dedup.candidatePairs(bands2, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2.contains((0L, 5000L)) && pairs2.contains((1L, 5001L)))
  }

  test("sign_lsh_buckets expression is value-identical to composed per-table lshBucket columns") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").limit(50)
    val (nTables, nPlanes, dim) = (8, 12, 64)
    val fused = e.select($"vec_id",
        graft.functions.SignLshFunctions.sign_lsh_buckets($"embedding", nTables, nPlanes, dim))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = e.select($"vec_id" +: (0 until nTables).map(t =>
        Similarity.lshBucket($"embedding",
          Similarity.hyperplanes(nPlanes, dim, 1000L + t)).as(s"b$t")): _*)
      .collect().map(r => r.getLong(0) -> (0 until nTables).map(t => r.getLong(t + 1))).toMap
    for ((id, buckets) <- composed) assert(fused(id) == buckets, s"vec $id")
  }

  test("neardupPairs: planted scaled duplicates all found, plan has no cartesian product") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val planted = e.filter($"vec_id" % 20 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val all = e.unionByName(planted)
    val res = Similarity.neardupPairs(all, threshold = 0.99, dim = 64)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "near-dup search must not be all-pairs")
    val pairs = res.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val expected = e.filter($"vec_id" % 20 === 0).collect()
      .map(_.getAs[Long]("vec_id")).map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(pairs), s"missing ${expected -- pairs}")
  }

  test("brute-force cosine top-k: self is rank 1 with sim 1.0") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val top = Similarity.bruteForceTopK(e, e.filter($"vec_id" < 3), 5)
      .filter($"rank" === 1).collect()
    assert(top.length == 3)
    assert(top.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("cand_id")))
    assert(top.forall(r => math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9))
  }

  test("IVF ANN: deterministic, self found at rank 1, decent recall vs brute force") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    val ivf = Similarity.ivfTopK(e, q, 5).collect()
    assert(ivf.nonEmpty)
    // self vector probes its own cell → rank 1 sim 1.0
    val rank1 = ivf.filter(_.getAs[Int]("rank") == 1)
    assert(rank1.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("cand_id")))
    // recall vs brute-force top-5 (random vectors, 4/16 cells probed)
    val bf = Similarity.bruteForceTopK(e, q, 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val hits = ivf.count(r => bf.contains((r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))))
    assert(hits >= bf.size / 4, s"recall too low: $hits/${bf.size}")
    // deterministic across runs
    val again = Similarity.ivfTopK(e, q, 5).collect()
    assert(again.map(_.toString).sorted.toSeq == ivf.map(_.toString).sorted.toSeq)
  }

  test("IVF ANN result is invariant to corpus partition layout") {
    // the centroid sample is an ORDERED take — a bare limit() would make
    // centroid init (and every cell assignment) depend on input layout
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    def run(c: org.apache.spark.sql.DataFrame): Seq[String] =
      Similarity.ivfTopK(c, q, 5).collect().map(_.toString).sorted.toSeq
    assert(run(e) == run(e.repartition(13)))
  }

  test("connected components: chain and singleton-pair collapse to min-id labels") {
    // 1-2-3-4 is a diameter-3 chain (worst case for naive propagation) plus
    // an isolated pair; every node must converge to its component's min id
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components converge on a 300-node chain (pointer-jump, not O(diameter))") {
    // needs 299 rounds with plain neighbor propagation; pointer jumping
    // must land it well inside maxIter=25 — and the guard throws rather
    // than returning half-propagated labels if it ever doesn't
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 300)
    assert(comp.values.forall(_ == 0L), s"all labels must reach 0: ${comp.filter(_._2 != 0L)}")
  }

  test("connected components resolve LSH near-dup pairs into (original, mutant) groups") {
    val base = docs.filter($"doc_id" < 50)
    val near = base.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"),
        array_join(slice(graft.functions.TextFunctions.tokens($"text"), 3, 100000), " ").as("text"))
    val d = base.unionByName(near)
    val pairs = Dedup.jaccardVerify(d, "doc_id", "text",
        Dedup.candidatePairs(Dedup.lshBandsFast(Dedup.minhashSignaturesFast(d, "doc_id", "text"))))
      .filter($"jaccard" >= 0.5)
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted mutant joins its source's component, labeled by the source
    for (src <- Seq(0L, 10L, 20L, 30L, 40L))
      assert(comp.get(src + 1000L).contains(comp.getOrElse(src, src)),
        s"mutant ${src + 1000} not grouped with $src: $comp")
  }

  test("keepBestPerComponent keeps the argmax-score member, not the min id") {
    val d = Seq(
      (1L, 5), (2L, 9), (3L, 9), // cluster A: 2 and 3 tie on score → id 2 wins
      (10L, 1), (11L, 1),        // cluster B: constant score → min id 10 wins
      (42L, 0)                   // singleton → always survives
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    def kept(df: org.apache.spark.sql.DataFrame) =
      Dedup.keepBestPerComponent(df, "doc_id", "score", pairs)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept(d) == Set(2L, 10L, 42L))
    // constant scores degrade to exactly q39's min-id retention
    assert(kept(d.withColumn("score", lit(1))) == Set(1L, 10L, 42L))
    // survivor set is invariant to input partition layout
    assert(kept(d.repartition(13)) == Set(2L, 10L, 42L))
  }

  test("keepBestPerComponent works when the caller's id column is literally \"id\"") {
    // regression: the component frame's own (id, comp) columns must not
    // collide with a caller idCol named "id" (drop/ambiguity hazards)
    val d = Seq((1L, 5), (2L, 9), (42L, 0)).toDF("id", "score")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerComponent(d, "id", "score", pairs)
    assert(out.columns.toSeq == Seq("id", "score"))
    assert(out.collect().map(_.getAs[Long]("id")).toSet == Set(2L, 42L))
  }

  test("LSH ANN: cosine-identical queries land in the source's bucket and rank it first") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // scaling preserves cosine and all hyperplane signs ⇒ the source vector
    // must share the bucket and surface at rank 1 with sim == 1
    val q = e.filter($"vec_id" < 10)
      .select(($"vec_id" + 5000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val lsh = Similarity.lshTopK(e, q, 3).filter($"rank" === 1).collect()
    assert(lsh.length == 10)
    assert(lsh.forall(r => r.getAs[Long]("cand_id") == r.getAs[Long]("query_id") - 5000L))
    assert(lsh.forall(r => math.abs(r.getAs[Double]("sim") - 1.0) < 1e-6))
  }

  test("semantic decontamination flags exactly the planted benchmark sources") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val bench = e.filter($"vec_id" < 10)
      .select(($"vec_id" + 5000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val out = Similarity.decontaminateSemantic(e, bench, 0.999)
    val flagged = out.filter($"contaminated").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == (0L until 10L).toSet, s"flagged: $flagged")
    // the scaled copies register as exact semantic matches
    val sims = out.filter($"vec_id" < 10).select("max_sim")
      .collect().map(_.getDouble(0))
    assert(sims.forall(_ == 1.0), s"planted sims must round to 1.0: ${sims.toSeq}")
  }

  test("latestCapture keeps max-ts capture per url, ts ties break on min id") {
    val caps = Seq(
      (1L, "u/a", 10L), (2L, "u/a", 30L), (3L, "u/a", 20L), // plain: max ts wins
      (4L, "u/b", 50L), (9L, "u/b", 50L),                   // tie → min id
      (7L, "u/c", 5L)                                        // singleton
    ).toDF("id", "url", "ts")
    val out = Dedup.latestCapture(caps, "url", "ts", "id")
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("id"), r.getAs[Long]("ts"), r.getAs[Long]("n_captures")))).toMap
    assert(out == Map("u/a" -> ((2L, 30L, 3L)), "u/b" -> ((4L, 50L, 2L)),
      "u/c" -> ((7L, 5L, 1L))))
  }

  test("latestCapture is layout-invariant and matches the window formulation") {
    val caps = spark.range(0, 2000).toDF("id")
      .withColumn("url", concat(lit("p"), ($"id" % 97).cast("string")))
      .withColumn("ts", ($"id" * 31) % 50) // dense ts collisions per url
    def got(df: org.apache.spark.sql.DataFrame) =
      Dedup.latestCapture(df, "url", "ts", "id")
        .select("url", "id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      caps.withColumn("rn", row_number().over(
          Window.partitionBy("url").orderBy($"ts".desc, $"id".asc)))
        .filter($"rn" === 1).select("url", "id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    }
    assert(got(caps) == viaWindow)
    assert(got(caps.repartition(13)) == viaWindow)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    import graft.functions.SortedIntersectFunctions.sorted_intersect_count
    // fuzz over the real corpus: every doc's sorted shingle set against a
    // mutated doc's — the exact pairing the verify joins evaluate
    val sh = docs.select($"doc_id",
      sort_array(graft.functions.TextFunctions.shingleHashes($"text", 3)).as("sh"))
    val mut = docs.select(($"doc_id" + 1000000L).as("doc_id"),
        array_join(slice(split(trim($"text"), "\\s+"), 3, 1000000), " ").as("text"))
      .select($"doc_id",
        sort_array(graft.functions.TextFunctions.shingleHashes($"text", 3)).as("sh"))
    val pairs = sh.select($"doc_id".as("a"), $"sh".as("sh_a"))
      .join(mut.select(($"doc_id" - 1000000L).as("a"), $"sh".as("sh_b")), "a")
    val diff = pairs.select(
        sorted_intersect_count($"sh_a", $"sh_b").as("merge"),
        size(array_intersect($"sh_a", $"sh_b")).as("hash"))
      .filter($"merge" =!= $"hash").count()
    assert(diff == 0)
    // plus hand-built edge cases: empty, disjoint, identical, interleaved
    val edge = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 5L, 9L, 12L), Seq(5L, 6L, 9L, 20L))).toDF("a", "b")
    val bad = edge.select(
        sorted_intersect_count($"a", $"b").as("merge"),
        size(array_intersect($"a", $"b")).as("hash"))
      .filter($"merge" =!= $"hash").count()
    assert(bad == 0)
  }
}
