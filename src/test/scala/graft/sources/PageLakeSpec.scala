package graft.sources

import graft.SparkSpecBase
import graft.pipeline.SyntheticPages
import org.apache.spark.sql.functions._

class PageLakeSpec extends SparkSpecBase {

  private lazy val lakeDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pagelake").toString
    // spread warc_ts over several days so multiple partitions exist
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
      .withColumn("warc_ts", timestamp_seconds(
        unix_timestamp(col("warc_ts")) + (abs(hash(col("url"))) % 5) * 86400L))
    PageLake.write(pages, d)
    d
  }

  test("round-trip preserves rows and text byte-identically") {
    val orig = SyntheticPages.fromDocuments(spark, sfDir)
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val back = PageLake.read(spark, lakeDir)
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == orig)
  }

  test("hive-style date partitions exist on disk") {
    val dirs = new java.io.File(lakeDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("crawl_date="))
    assert(dirs.length >= 2, s"expected multiple date partitions, got ${dirs.toSeq}")
  }

  test("single-date input with many url buckets writes in parallel (>1 file per day)") {
    // date-only repartition would funnel a whole day through one write task;
    // (crawl_date, url_bucket) must fan a single date out across writers.
    val d = java.nio.file.Files.createTempDirectory("pagelake1d").toString
    // disable AQE's small-partition coalescing: at fixture scale it folds the
    // (date, bucket) shuffle back to 1 partition; at real scale the same plan
    // keeps ~Buckets writers per day (partitions stay above the target size)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try PageLake.write(SyntheticPages.fromDocuments(spark, sfDir), d) // one warc_ts day
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val dateDirs = new java.io.File(d).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("crawl_date="))
    assert(dateDirs.length == 1, s"fixture should be single-date, got ${dateDirs.toSeq}")
    val parts = dateDirs.head.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts > 1, s"one write task for an entire day: $parts file(s)")
  }

  test("bucketed tables equi-join on url with NO shuffle exchange") {
    val pages = SyntheticPages.fromDocuments(spark, sfDir).select("url", "text")
    // unique names: the in-memory catalog resets per JVM but the warehouse
    // dir survives, and saveAsTable refuses an orphaned location
    val (ta, tb) = (s"lake_a_${System.nanoTime}", s"lake_b_${System.nanoTime}")
    PageLake.writeBucketedTable(pages, ta, buckets = 8)
    PageLake.writeBucketedTable(pages.select(col("url"), length(col("text")).as("n")),
      tb, buckets = 8)
    // force the non-broadcast path: at scale neither side of a page-level
    // join fits in memory, so the co-located SMJ is the plan that matters
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table(ta).join(spark.table(tb), "url")
      assert(j.count() == pages.count())
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"bucket pruning metadata missing:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      // managed tables: DROP deletes the warehouse data too (no /tmp leak)
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }

  test("compaction merges fragmented partitions, preserves rows, skips healthy ones") {
    val dir = java.nio.file.Files.createTempDirectory("lake-compact").toString
    // fragment the lake: force many tiny files per date partition
    graft.pipeline.SyntheticPages.fromDocuments(spark, sfDir)
      .withColumn("crawl_date", to_date(col("warc_ts")))
      .withColumn("url_bucket", PageLake.urlBucket(col("url")))
      .repartition(24)
      .write.mode("overwrite").partitionBy("crawl_date").parquet(dir)
    def rows(d: String): Seq[String] = {
      val df = spark.read.parquet(d)
      // cast every column (incl. the binary html) to string — Row.toString
      // would render binary by object identity
      df.select(df.columns.sorted.map(c => col(c).cast("string")): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    val beforeRows = rows(dir)
    val beforeFiles = countParquetFiles(dir)

    val (rewritten, before, after) = PageLake.compact(spark, dir,
      targetFileBytes = 64L * 1024 * 1024)
    assert(before == beforeFiles)
    assert(rewritten > 0, "fragmented partitions must be rewritten")
    assert(after < before, s"file count must shrink: $before -> $after")
    assert(countParquetFiles(dir) == after)
    assert(rows(dir) == beforeRows, "compaction must not change data")

    // second pass: already compacted ⇒ nothing rewritten
    val (r2, b2, a2) = PageLake.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(r2 == 0 && b2 == a2)
  }

  test("compaction keeps output files bucket-clustered (range, not round-robin)") {
    val dir = java.nio.file.Files.createTempDirectory("lake-compact-rng").toString
    SyntheticPages.fromDocuments(spark, sfDir)
      .withColumn("crawl_date", to_date(col("warc_ts")))
      .withColumn("url_bucket", PageLake.urlBucket(col("url")))
      .repartition(24)
      .write.mode("overwrite").partitionBy("crawl_date").parquet(dir)
    // tiny target ⇒ nTarget > 1 output files per partition
    val (rewritten, _, _) = PageLake.compact(spark, dir, targetFileBytes = 16L * 1024)
    assert(rewritten > 0)
    for (part <- new java.io.File(dir).listFiles()
         if part.isDirectory && part.getName.startsWith("crawl_date=")) {
      val files = part.listFiles().filter(_.getName.endsWith(".parquet"))
      if (files.length > 1) {
        // each file must own a contiguous url_bucket range: ranges of
        // different files may touch only at a boundary bucket
        val ranges = files.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("url_bucket"), max("url_bucket")).head()
          (r.getInt(0), r.getInt(1))
        }.sortBy(_._1)
        for (Array(a, b) <- ranges.sliding(2).map(_.toArray))
          assert(a._2 <= b._1,
            s"bucket ranges overlap across files: ${ranges.toSeq} in ${part.getName}")
      }
    }
  }

  test("compaction swap is crash-recoverable (orphaned .old restored)") {
    val dir = java.nio.file.Files.createTempDirectory("lake-crash").toString
    SyntheticPages.fromDocuments(spark, sfDir)
      .withColumn("crawl_date", to_date(col("warc_ts")))
      .withColumn("url_bucket", PageLake.urlBucket(col("url")))
      .repartition(8)
      .write.mode("overwrite").partitionBy("crawl_date").parquet(dir)
    val root = new java.io.File(dir)
    val part = root.listFiles().filter(p => p.isDirectory &&
      p.getName.startsWith("crawl_date=")).head
    val want = spark.read.parquet(part.getAbsolutePath).count()
    // simulate a crash caught between the two renames: live moved aside
    val old = new java.io.File(root, "." + part.getName + ".old")
    assert(part.renameTo(old))
    PageLake.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(part.exists(), "recovery must restore the partition")
    assert(!old.exists(), "recovered .old must be cleaned up")
    assert(spark.read.parquet(part.getAbsolutePath).count() == want)
  }

  test("manifest pruning: bucket reads open fewer files, same answer") {
    val dir = java.nio.file.Files.createTempDirectory("lake-manifest").toString
    SyntheticPages.fromDocuments(spark, sfDir)
      .withColumn("crawl_date", to_date(col("warc_ts")))
      .withColumn("url_bucket", PageLake.urlBucket(col("url")))
      .repartition(24)
      .write.mode("overwrite").partitionBy("crawl_date").parquet(dir)
    // range-clustering via compaction makes the file-level stats selective
    PageLake.compact(spark, dir, targetFileBytes = 16L * 1024)
    assert(PageLake.readManifest(spark, dir).nonEmpty, "compact must write the manifest")
    val buckets = Seq(3)
    val (selected, total) = PageLake.pruneStats(spark, dir, buckets)
    assert(total > 1 && selected < total,
      s"manifest must prune files: $selected/$total opened")
    val got = PageLake.readBuckets(spark, dir, buckets)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    val want = spark.read.parquet(dir)
      .filter(col("url_bucket").isInCollection(buckets))
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(got == want && want.nonEmpty)
    // partition column survives the explicit-file read path
    assert(PageLake.readBuckets(spark, dir, buckets).columns.contains("crawl_date"))
    // missing manifest: readBuckets rebuilds it and still answers exactly
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_graft_manifest.json"), false)
    val got2 = PageLake.readBuckets(spark, dir, buckets)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(got2 == want)
    // no matching bucket range -> empty result, zero files opened
    assert(PageLake.readBuckets(spark, dir, Seq(9999)).count() == 0)
  }

  test("joint date∩bucket pruning opens only the intersection; manifest carries rows + ts range") {
    // multi-day lake (reuses the suite fixture) — every (day, bucket) pair
    // is strictly narrower than either one-dimensional prune
    val days = PageLake.readManifest(spark, lakeDir).get.map(_.crawlDate).distinct.sorted
    assert(days.size >= 2, s"fixture must span several days, got $days")
    val day = days.head
    val buckets = Seq(3)
    val (joint, total) = PageLake.pruneStats(spark, lakeDir, buckets, Some(day))
    val (bucketOnly, _) = PageLake.pruneStats(spark, lakeDir, buckets)
    val dayFiles = PageLake.readManifest(spark, lakeDir).get.count(_.crawlDate == day)
    assert(joint <= bucketOnly && joint <= dayFiles && joint < total,
      s"joint prune must be the intersection: $joint vs bucket-only $bucketOnly, day $dayFiles, total $total")
    // answer equals the full-scan filter regardless of pruning
    val got = PageLake.readDayBuckets(spark, lakeDir, day, buckets)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    val want = PageLake.read(spark, lakeDir)
      .filter(col("crawl_date") === lit(day) && col("url_bucket").isInCollection(buckets))
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(got == want && want.nonEmpty)
    // manifest row accounting sums to the lake's row count without opening
    // data files, and per-file warc_ts ranges are real (not sentinels)
    val stats = PageLake.readManifest(spark, lakeDir).get
    assert(stats.forall(_.rows > 0))
    assert(stats.map(_.rows).sum == PageLake.read(spark, lakeDir).count())
    assert(stats.forall(s => s.minTs > Long.MinValue && s.maxTs < Long.MaxValue
      && s.minTs <= s.maxTs))
    val acct = PageLake.dayAccounting(spark, lakeDir)
    assert(acct.map(_._1) == days)
    assert(acct.map(_._3).sum == stats.map(_.rows).sum)
  }

  test("compact heals a stale or corrupt manifest even when nothing needs rewriting") {
    val dir = java.nio.file.Files.createTempDirectory("lake-manifest-heal").toString
    PageLake.write(SyntheticPages.fromDocuments(spark, sfDir), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.json")
    // stale: manifest names a file that no longer exists (crash between a
    // swap and the manifest write of a previous run)
    val out = fs.create(mPath, true)
    out.write("""[{"path":"/gone/part-0.parquet","date":"2024-01-01","min_bucket":0,"max_bucket":1}]""".getBytes)
    out.close()
    val (rewritten, _, _) = PageLake.compact(spark, dir) // healthy lake: no rewrite
    assert(rewritten == 0)
    val healed = PageLake.readManifest(spark, dir).get
    assert(healed.nonEmpty && healed.forall(s =>
      fs.exists(new org.apache.hadoop.fs.Path(s.path))), "manifest must match live files")
    // corrupt JSON reads as absent; bucket reads still answer exactly
    val out2 = fs.create(mPath, true)
    out2.write("{not json".getBytes)
    out2.close()
    assert(PageLake.readManifest(spark, dir).isEmpty)
    val want = spark.read.parquet(dir).filter(col("url_bucket") === 3).count()
    assert(PageLake.readBuckets(spark, dir, Seq(3)).count() == want && want > 0)
  }

  test("PageLake.write maintains the manifest (one entry per data file)") {
    val want = countParquetFiles(lakeDir)
    val m = PageLake.readManifest(spark, lakeDir)
    assert(m.nonEmpty, "write() must leave a manifest")
    assert(m.get.size == want, s"manifest entries ${m.get.size} != files $want")
    assert(m.get.forall(s => s.minBucket >= 0 && s.maxBucket < PageLake.Buckets
      && s.minBucket <= s.maxBucket))
  }

  private def countParquetFiles(dir: String): Int = {
    val root = java.nio.file.Paths.get(dir)
    val s = java.nio.file.Files.walk(root)
    try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
    finally s.close()
  }

  test("readBuckets self-heals off a stale manifest (files mutated outside write/compact)") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_stale").toString
    PageLake.write(SyntheticPages.fromDocuments(spark, sfDir), d)
    val allBuckets = 0 until PageLake.Buckets
    // foreign per-batch ingest: copy an existing data file to a new name in
    // its date partition WITHOUT refreshing the manifest
    val dateDir = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("crawl_date=")).head
    val src = dateDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val foreign = new java.io.File(dateDir, "part-foreign-ingest.parquet")
    java.nio.file.Files.copy(src.toPath, foreign.toPath)
    val total = PageLake.read(spark, d).count() // full scan sees the new file
    assert(PageLake.readBuckets(spark, d, allBuckets).count() == total,
      "stale manifest must not hide foreign-ingested rows")
    assert(PageLake.pruneStats(spark, d, allBuckets)._2.toLong ==
      PageLake.readManifest(spark, d).get.size + 1)
    // foreign DELETE: a manifest-listed file vanishes (the foreign copy
    // stays, so the lake is non-empty); the read must not fail on the
    // missing path (fallback to live-listing stats)
    java.nio.file.Files.delete(src.toPath)
    val remaining = PageLake.read(spark, d).count()
    assert(PageLake.readBuckets(spark, d, allBuckets).count() == remaining)
  }

  test("collectStats degrades on url_bucket schema drift instead of failing") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_drift").toString
    // foreign writer left url_bucket as a STRING — its min/max statistics
    // are non-numeric; the stats build must degrade that file to the full
    // bucket range, not throw ClassCastException
    spark.range(5).select(col("id").cast("string").as("url_bucket"),
        concat(lit("https://h/"), col("id")).as("url"))
      .coalesce(1).write.parquet(s"$d/crawl_date=2024-01-01")
    val stats = PageLake.collectStats(spark, d)
    assert(stats.nonEmpty)
    assert(stats.forall(s => s.minBucket == 0 && s.maxBucket == PageLake.Buckets - 1),
      s"unusable stats must map to the full bucket range, got $stats")
    assert(PageLake.writeManifest(spark, d) == stats.size) // build survives drift
  }

  test("snapshot log: appends create versions; time travel reads each as-of view") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_snap").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    val a = pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 0)
    val b = pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 1)
    PageLake.write(a, d)
    val v1 = PageLake.currentVersion(spark, d)
    assert(v1 >= 1)
    val n1 = PageLake.read(spark, d).count()
    PageLake.append(b, d)
    val v2 = PageLake.currentVersion(spark, d)
    assert(v2 == v1 + 1)
    val full = PageLake.read(spark, d).count()
    assert(full > n1)
    // the as-of views: v1 sees only the first write, v2 the whole lake
    assert(PageLake.readVersion(spark, d, v1).count() == n1)
    assert(PageLake.readVersion(spark, d, v2).count() == full)
    // the time-travel frame keeps the partition column
    assert(PageLake.readVersion(spark, d, v1).columns.contains("crawl_date"))
    val snaps = PageLake.snapshots(spark, d)
    assert(snaps.map(_._1) == Seq(v1, v2), s"snapshot list: $snaps")
    assert(snaps.last._3 == full, s"row accounting per snapshot: $snaps")
  }

  test("compaction expires older snapshots; expired time travel fails loudly") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_exp").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    val a = pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 0)
    val b = pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 1)
    PageLake.write(a, d)
    val v1 = PageLake.currentVersion(spark, d)
    PageLake.append(b, d) // second batch → every partition now has ≥2 files
    val full = PageLake.read(spark, d).count()
    val (rewritten, _, _) = PageLake.compact(spark, d)
    assert(rewritten >= 1, "fixture must actually compact")
    // only the post-compaction snapshot remains readable
    val snaps = PageLake.snapshots(spark, d).map(_._1)
    assert(snaps.size == 1 && snaps.head > v1, s"older snapshots must expire: $snaps")
    val ex = intercept[Exception](PageLake.readVersion(spark, d, v1))
    assert(ex.getMessage.contains("expired") || ex.getMessage.contains("does not exist"),
      s"unexpected message: ${ex.getMessage}")
    assert(PageLake.read(spark, d).count() == full)
    assert(PageLake.readVersion(spark, d, snaps.head).count() == full)
  }

  test("snapshot isolation under concurrent compaction: a pre-resolved version fails loudly, never partially") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_iso").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    PageLake.write(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 0), d)
    PageLake.append(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 1), d)
    val v2 = PageLake.currentVersion(spark, d)
    // a reader resolves v2 BEFORE the compaction runs: the DataFrame pins
    // the exact data-file list that snapshot recorded
    val resolved = PageLake.readVersion(spark, d, v2)
    val nRows = resolved.count()
    val (rewritten, _, _) = PageLake.compact(spark, d) // rewrites + expires
    assert(rewritten >= 1, "fixture must actually compact")
    // the stale pre-resolved plan must THROW on next use — compaction
    // deleted the files it points at; silently returning partial (or
    // empty) data would be a correctness bug, not staleness
    val ex = intercept[Exception](resolved.count())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(c => c.isInstanceOf[java.io.FileNotFoundException] ||
      String.valueOf(c.getMessage).matches("(?is).*(file|path).*(not exist|not found|deleted).*")),
      s"expected a missing-file failure, got: $ex")
    // a FRESH resolve of the expired version fails with the documented
    // explicit message (no half-readable view either way)
    val ex2 = intercept[Exception](PageLake.readVersion(spark, d, v2))
    assert(ex2.getMessage.contains("expired") || ex2.getMessage.contains("does not exist"),
      s"unexpected message: ${ex2.getMessage}")
    // the positive side: a version resolved AFTER compaction survives a
    // subsequent no-op compact (nothing rewritten ⇒ nothing expires)
    val v3 = PageLake.currentVersion(spark, d)
    val resolved3 = PageLake.readVersion(spark, d, v3)
    val (r2, _, _) = PageLake.compact(spark, d)
    assert(r2 == 0, "second compact over a healthy lake must rewrite nothing")
    assert(resolved3.count() == nRows, "servable snapshot view must survive a no-op compact")
  }

  test("unservable snapshots left by external deletes are swept on the next compact") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_sweep").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    PageLake.write(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 0), d)
    // a v1 file specifically: deleting an append-only file would (rightly)
    // leave v1 servable — additions never invalidate an older as-of view
    val victim = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
        .filter(p => p.toString.endsWith(".parquet")).findFirst()
      it.get()
    }
    PageLake.append(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 1), d)
    val before = PageLake.snapshots(spark, d).map(_._1)
    assert(before.size == 2)
    // simulate a crashed compaction's aftermath: a data file vanished
    // outside any completed manifest write
    java.nio.file.Files.delete(victim)
    // a compact with nothing to rewrite (huge per-file target → no
    // partition qualifies) still refreshes the stale manifest and sweeps
    val (rewritten, _, _) = PageLake.compact(spark, d, targetFileBytes = 1L)
    assert(rewritten == 0, "fixture must exercise the no-rewrite sweep path")
    val after = PageLake.snapshots(spark, d).map(_._1)
    assert(after.size == 1 && !before.contains(after.head),
      s"both stale snapshots swept, fresh one kept: before=$before after=$after")
    assert(PageLake.readVersion(spark, d, after.head).count() ==
      PageLake.read(spark, d).count())
  }

  test("a torn/corrupt snapshot-log file is swept as unservable, not kept forever") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_torn").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    PageLake.write(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 0), d)
    PageLake.append(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 1), d)
    val Seq(v1, v2) = PageLake.snapshots(spark, d).map(_._1)
    // tear the OLDER snapshot file (a crash mid-write leaves half a JSON);
    // snapshots() hides it and readVersion fails on it — it is unservable
    val torn = java.nio.file.Paths.get(d, "_graft_manifest_log", f"v$v1%05d.json")
    java.nio.file.Files.write(torn, "{\"files\":[{\"pa".getBytes("UTF-8"))
    assert(PageLake.snapshots(spark, d).map(_._1) == Seq(v2))
    assert(PageLake.expireUnservable(spark, d) == 1, "torn file must be swept")
    assert(!java.nio.file.Files.exists(torn), "v1 file must be deleted from disk")
    // idempotent, and the servable current snapshot is untouched
    assert(PageLake.expireUnservable(spark, d) == 0)
    assert(PageLake.readVersion(spark, d, v2).count() == PageLake.read(spark, d).count())
  }

  test("an unparsable snapshot NEWER than the newest parsable is left alone (in-flight commit)") {
    val d = java.nio.file.Files.createTempDirectory("pagelake_inflight").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    PageLake.write(pages, d)
    val v = PageLake.currentVersion(spark, d)
    // a foreign writer's half-flushed NEXT version (our own writes are
    // tmp+rename-atomic, but the sweep must not assume every writer is):
    // deleting it would hole the log mid-commit
    val inflight = java.nio.file.Paths.get(d, "_graft_manifest_log", f"v${v + 1}%05d.json")
    java.nio.file.Files.write(inflight, "{\"files\":[{\"pa".getBytes("UTF-8"))
    assert(PageLake.expireUnservable(spark, d) == 0,
      "a newer-than-newest unparsable version file may be an in-flight commit")
    assert(java.nio.file.Files.exists(inflight))
  }

  test("a reader holding a resolved as-of view fails cleanly once compaction expires it") {
    // snapshot isolation under concurrent compaction: the reader resolved
    // version N BEFORE compact ran; afterwards the read must fail loudly
    // (vanished files), never return silent partial data
    val d = java.nio.file.Files.createTempDirectory("pagelake_iso").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    PageLake.write(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 0), d)
    val v1 = PageLake.currentVersion(spark, d)
    PageLake.append(pages.filter(pmod(abs(hash(col("url"))), lit(2)) === 1), d)
    val asOf = PageLake.readVersion(spark, d, v1) // resolved pre-compaction
    val n1 = asOf.count()
    assert(n1 > 0)
    val (rewritten, _, _) = PageLake.compact(spark, d)
    assert(rewritten >= 1, "fixture must actually compact")
    // the already-resolved frame enumerated v1's concrete files; those were
    // rewritten+deleted, so any action now throws (FileNotFound / vanished)
    val ex = intercept[Exception](asOf.count())
    val msg = Option(ex.getMessage).getOrElse("") + Option(ex.getCause)
      .flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.matches("(?s).*(does not exist|filenotfound|no such file|deleted|vanished).*"),
      s"expected a vanished-file failure, got: $ex")
  }

  test("date filter prunes partitions at the scan") {
    val day = PageLake.read(spark, lakeDir)
      .select(col("crawl_date").cast("string")).distinct().orderBy("crawl_date")
      .head().getString(0)
    val df = PageLake.readDay(spark, lakeDir, day)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(crawl_date"), s"no partition filter:\n$plan")
    val scanned = df.count()
    val total = PageLake.read(spark, lakeDir).count()
    assert(scanned < total && scanned > 0)
  }
}
