package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake layout for crawl pages — the Iceberg-shaped table this pipeline
  * targets (`BASELINE.json input_hint`). No Iceberg runtime ships in this
  * sandbox, so the layout is plain partitioned parquet with the identical
  * physical organization Iceberg's `days(warc_ts)` + `bucket(url)` spec
  * would produce:
  *
  *   crawl_date=YYYY-MM-DD/ part-*.parquet   (hive-style date partitions)
  *   rows sorted by url_bucket within files  (co-locates url hash ranges →
  *                                            cheap per-host scans + stable
  *                                            bucket-join pre-org)
  *
  * Date filters prune whole partitions at planning time (PartitionFilters in
  * the scan); url filters ride min/max row-group stats via the sort.
  */
object PageLake {
  val Buckets = 64

  def urlBucket(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(hash(url), lit(Buckets))

  def write(pages: DataFrame, path: String): Unit = {
    withInt64Timestamps(pages.sparkSession) {
      pages
        .withColumn("crawl_date", to_date(col("warc_ts")))
        .withColumn("url_bucket", urlBucket(col("url")))
        // Repartition by (date, bucket), not date alone: one day of crawl is
        // terabytes, and a date-only shuffle would funnel it through a single
        // write task. (date, bucket) gives up to `Buckets` parallel writers per
        // day while keeping each output file single-date + bucket-contiguous.
        .repartition(col("crawl_date"), col("url_bucket"))
        .sortWithinPartitions("url_bucket", "url")
        .write.mode("overwrite")
        .partitionBy("crawl_date")
        .parquet(path)
    }
    writeManifest(pages.sparkSession, path): Unit
  }

  /** Per-batch incremental ingest: APPEND a batch of pages into the lake's
    * date partitions (same layout discipline as [[write]] — per-(date,
    * bucket) fan-out, bucket-sorted files) and refresh the manifest so
    * readers keep their zero-footer-I/O pruning. This is the writer the
    * small-file problem comes from — run [[compact]] periodically behind
    * it. */
  def append(pages: DataFrame, path: String): Unit = {
    withInt64Timestamps(pages.sparkSession) {
      pages
        .withColumn("crawl_date", to_date(col("warc_ts")))
        .withColumn("url_bucket", urlBucket(col("url")))
        .repartition(col("crawl_date"), col("url_bucket"))
        .sortWithinPartitions("url_bucket", "url")
        .write.mode("append")
        .partitionBy("crawl_date")
        .parquet(path)
    }
    refreshManifest(pages.sparkSession, path): Unit
  }

  /** INCREMENTAL manifest refresh (the Iceberg append-manifest behavior):
    * keep prior entries for files still present, read footers ONLY for
    * files the manifest doesn't know, drop entries for vanished files.
    * Per-append cost is O(new files) footer reads + one listing — a full
    * [[writeManifest]] rebuild pays O(lake files) footers per batch. */
  def refreshManifest(spark: SparkSession, path: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val prior = readManifest(spark, path).getOrElse(Nil).map(s => s.path -> s).toMap
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val merged = Seq.newBuilder[FileStat]
    for (part <- fs.listStatus(root)
         if part.isDirectory && part.getPath.getName.startsWith("crawl_date=")) {
      val date = part.getPath.getName.stripPrefix("crawl_date=")
      for (f <- fs.listStatus(part.getPath)
           if f.isFile && f.getPath.getName.endsWith(".parquet")) {
        merged += prior.getOrElse(f.getPath.toString,
          fileStat(conf, f.getPath, date))
      }
    }
    persistManifest(spark, path, merged.result())
  }

  /** Lake writes use INT64-micros timestamps (what the Iceberg spec
    * mandates): Spark's INT96 default carries NO parquet min/max statistics
    * (parquet-mr treats INT96 as unordered), which would leave the
    * manifest's warc_ts range at the unknown sentinel for every file.
    *
    * Sessions CONFIGURED with TIMESTAMP_MICROS (GraftSession does, and a
    * cluster deployment should) take the no-mutation fast path — there is
    * no per-write parquet option for this, so on an unconfigured session
    * the save/set/restore below can race with concurrent writes in the
    * same session; the worst outcome is an INT96 file whose warc_ts stats
    * degrade to the unknown sentinel (full-range reads, never wrong
    * answers). */
  private def withInt64Timestamps[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.getOption(key)
    if (saved.contains("TIMESTAMP_MICROS")) body
    else {
      spark.conf.set(key, "TIMESTAMP_MICROS")
      try body
      finally saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Register pages as a bucketed + bucket-sorted catalog table: both sides
    * of a url equi-join written this way are co-partitioned, so the join
    * plans with NO shuffle exchange (and no sort when one file per bucket) —
    * Spark's native analogue of Iceberg's `bucket(url)` partition transform.
    * At 100 TB this turns the biggest recurring cost of page-level joins
    * (re-shuffling the whole lake every query) into a one-time write cost. */
  def writeBucketedTable(pages: DataFrame, table: String,
                         buckets: Int = Buckets): Unit = {
    val spark = pages.sparkSession
    // The in-memory catalog resets per JVM but the warehouse dir does not:
    // clear both the catalog entry and an orphaned managed location, or
    // saveAsTable refuses with LOCATION_ALREADY_EXISTS on the second run.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(warehouse),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    pages.write.bucketBy(buckets, "url").sortBy("url")
      .mode("overwrite").format("parquet").saveAsTable(table)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Small-file compaction (the parquet-lake analogue of Iceberg/Delta
    * OPTIMIZE): incremental ingest leaves each date partition littered with
    * per-batch files; scans then pay per-file open/footer costs and the
    * NameNode/listing pays per-object costs — at 100 TB the small-file
    * problem, not data volume, is what kills lake scans.
    *
    * Per date partition: if the file count exceeds `ceil(bytes/targetBytes)`
    * by more than `slack`, rewrite the partition into that many files
    * (keeping the url_bucket/url sort so row-group pruning survives), then
    * atomically swap the directory. Partitions already near target are left
    * untouched — compaction cost is proportional to the fragmented tail,
    * not the lake. The walk itself is metadata-scale driver work (what
    * Iceberg reads from its manifest instead). Returns (partitions
    * rewritten, files before, files after).
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              slack: Double = 1.5): (Int, Int, Int) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var rewritten = 0
    var before = 0
    var after = 0
    // Crash recovery from a previous interrupted swap: a live dir missing
    // with its .old present means the crash hit between the two renames —
    // restore the original. Leftover .compact tmp dirs are stale output,
    // safe to drop.
    for (s <- fs.listStatus(root) if s.isDirectory) {
      val n = s.getPath.getName
      if (n.startsWith(".crawl_date=") && n.endsWith(".old")) {
        val live = new org.apache.hadoop.fs.Path(root, n.stripPrefix(".").stripSuffix(".old"))
        if (!fs.exists(live)) fs.rename(s.getPath, live)
        else fs.delete(s.getPath, true)
      } else if (n.startsWith(".crawl_date=") && n.endsWith(".compact")) {
        fs.delete(s.getPath, true)
      }
    }
    // Mutual exclusion with streamed ingestion: a dangling write-ahead
    // intent under _stream_commits/ means a crashed stream append awaits
    // replay, and its rollback compares the live listing against the
    // intent's pre-append listing — compacting NOW would replace those
    // paths wholesale and the rollback would delete the compacted lake as
    // "partial output". The stream's recovery must run first.
    val commitsRoot = new org.apache.hadoop.fs.Path(root, "_stream_commits")
    if (fs.exists(commitsRoot)) {
      val dangling = fs.listStatus(commitsRoot)
        .flatMap(d => if (d.isDirectory) fs.listStatus(d.getPath) else Array(d))
        .filter(_.getPath.getName.endsWith(".intent"))
      if (dangling.nonEmpty)
        throw new IllegalStateException(
          s"compaction refused: crashed stream ingest awaits replay " +
            s"(${dangling.head.getPath}); restart the ingest stream first")
    }
    val parts = fs.listStatus(root).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("crawl_date="))
    var failed = false
    try for (p <- parts) {
      val files = fs.listStatus(p.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val nTarget = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      before += files.length
      if (files.length > nTarget * slack) {
        val tmp = new org.apache.hadoop.fs.Path(p.getPath.getParent,
          "." + p.getPath.getName + ".compact")
        val old = new org.apache.hadoop.fs.Path(p.getPath.getParent,
          "." + p.getPath.getName + ".old")
        // Range-partition on (url_bucket, url), not round-robin: keeps each
        // output FILE bucket-clustered (contiguous url_bucket range), so
        // file-level min/max pruning and bucket-join pre-organization
        // survive compaction — round-robin would scatter every bucket
        // across every file.
        withInt64Timestamps(spark) {
          spark.read.parquet(p.getPath.toString)
            .repartitionByRange(nTarget, col("url_bucket"), col("url"))
            .sortWithinPartitions("url_bucket", "url")
            .write.mode("overwrite").parquet(tmp.toString)
        }
        // Crash-safe swap: live → .old, tmp → live, drop .old. A crash
        // between the renames leaves the data recoverable under .old (never
        // deleted-but-unreplaced); rerunning compact() restores it below.
        if (fs.exists(old)) fs.delete(old, true)
        if (!fs.rename(p.getPath, old))
          throw new java.io.IOException(s"compaction swap (aside) failed for ${p.getPath}")
        if (!fs.rename(tmp, p.getPath)) {
          fs.rename(old, p.getPath) // roll back so the partition reappears
          throw new java.io.IOException(s"compaction swap failed for ${p.getPath}")
        }
        fs.delete(old, true)
        rewritten += 1
        after += fs.listStatus(p.getPath)
          .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      } else after += files.length
    } catch {
      case e: Throwable => failed = true; throw e
    } finally {
      // Refresh the manifest whenever it no longer matches the live file
      // set — not just when THIS run rewrote something. A crash between a
      // successful swap and the manifest write (this run or a previous
      // one), or an exception after some partitions were already
      // rewritten, would otherwise leave stale paths that readBuckets
      // passes to the reader. The check is metadata-only (listing vs the
      // manifest's path set); the footer scan runs only on mismatch.
      // If the rewrite loop itself threw, a manifest-write failure here is
      // suppressed (logged) so the PRIMARY failure propagates instead of
      // being replaced — readers self-heal off a stale manifest anyway
      // (trustedStats falls back to footer stats on listing mismatch).
      try { if (manifestStale(spark, path)) writeManifest(spark, path): Unit }
      catch {
        case e: Throwable if failed =>
          System.err.println(s"[PageLake] manifest refresh after failed compaction " +
            s"also failed (suppressed): ${e.getMessage}")
      }
    }
    // Rewrites DELETE the replaced data files, so snapshots older than the
    // manifest refresh above can no longer be served — expire them instead
    // of leaving dangling time-travel entries (Iceberg's maintenance
    // pairing: rewrite_data_files then expire_snapshots). A run that
    // rewrote nothing still sweeps snapshots a CRASHED earlier compaction
    // left unservable (its swap deleted files; its expiry never ran).
    if (rewritten > 0) expireSnapshots(spark, path, keepLast = 1): Unit
    else expireUnservable(spark, path): Unit
    (rewritten, before, after)
  }

  /** The lake's current data-file listing (metadata-only walk),
    * restrictable to a set of date partitions so per-day reads pay one
    * directory listing, not a whole-lake walk. */
  private[graft] def liveFiles(spark: SparkSession, path: String,
                               dates: Option[Set[String]] = None): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    (for {
      part <- fs.listStatus(root)
      if part.isDirectory && part.getPath.getName.startsWith("crawl_date=")
      if dates.forall(_.contains(part.getPath.getName.stripPrefix("crawl_date=")))
      f <- fs.listStatus(part.getPath)
      if f.isFile && f.getPath.getName.endsWith(".parquet")
    } yield f.getPath.toString).toSet
  }

  /** Manifest missing, unparseable, or naming a file set different from
    * the lake's current listing. */
  private def manifestStale(spark: SparkSession, path: String): Boolean =
    readManifest(spark, path) match {
      case None => true
      case Some(stats) => stats.map(_.path).toSet != liveFiles(spark, path)
    }

  /** Stats the READ path trusts: the manifest, but only when its file set
    * matches the live listing. Files added or removed outside
    * `write`/`compact` (per-batch ingest, manual deletes) otherwise make a
    * manifest-driven read silently skip rows or fail on missing paths —
    * the staleness check is a metadata-only listing compare, and the
    * footer-scan fallback runs only on mismatch (or a missing manifest:
    * reads never write to the lake — read-only mounts, snapshots).
    *
    * Cost control at 10⁵-10⁶-file lakes: `dates` restricts BOTH the
    * validation listing and the fallback footer scan to the partitions the
    * read actually touches (a day-scoped read lists one directory, not the
    * lake); `validate = false` skips the listing entirely for deployments
    * where every lake mutation goes through `write`/`compact` — the trust
    * model Iceberg's transactional metadata gives for free. */
  private def trustedStats(spark: SparkSession, path: String,
                           dates: Option[Set[String]] = None,
                           validate: Boolean = true): Seq[FileStat] = {
    val manifest = readManifest(spark, path)
      .map(s => dates.fold(s)(ds => s.filter(f => ds.contains(f.crawlDate))))
    if (!validate) manifest.getOrElse(collectStats(spark, path, dates))
    else manifest match {
      case Some(stats) if stats.map(_.path).toSet == liveFiles(spark, path, dates) =>
        stats
      case _ => collectStats(spark, path, dates)
    }
  }

  /** A day's slice: resolves to a partition-pruned scan. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    read(spark, path).filter(col("crawl_date") === lit(day))

  // --- Iceberg-style manifest (file-level stats pruning) -----------------

  /** One manifest entry per data file — the stats Iceberg keeps per file in
    * its manifests: partition value (crawlDate), url_bucket min/max (bucket
    * pruning), row count (ops-level row accounting without opening files),
    * and warc_ts min/max in epoch micros (timestamp-range pruning finer
    * than the date partition). `rows = -1` / ts sentinels mean "unknown"
    * (legacy manifest or unusable stats) — unknown always reads as the
    * full range, so pruning may change which files are OPENED, never the
    * answer. */
  final case class FileStat(path: String, crawlDate: String,
                            minBucket: Int, maxBucket: Int,
                            rows: Long = -1L,
                            minTs: Long = Long.MinValue,
                            maxTs: Long = Long.MaxValue)

  private val ManifestName = "_graft_manifest.json"
  private val SnapshotLogDir = "_graft_manifest_log"
  private val VersionHintName = "version-hint.text"

  /** Rebuild the lake's manifest: one footer read per data file, recording
    * each file's url_bucket min/max (and its date partition) — the
    * file-level stats Iceberg keeps in manifest files so READERS never pay
    * per-file metadata I/O. Writers call this once after mutating the lake
    * (`write`/`compact` do); the cost is O(files) driver-side metadata
    * reads at write time, amortized over every subsequent pruned read. */
  def writeManifest(spark: SparkSession, path: String): Int =
    persistManifest(spark, path, collectStats(spark, path))

  private def persistManifest(spark: SparkSession, path: String,
                              stats: Seq[FileStat]): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = om.createArrayNode()
    stats.foreach { s =>
      val n = arr.addObject()
      n.put("path", s.path); n.put("date", s.crawlDate)
      n.put("min_bucket", s.minBucket); n.put("max_bucket", s.maxBucket)
      n.put("rows", s.rows)
      n.put("min_ts", s.minTs); n.put("max_ts", s.maxTs): Unit
    }
    val bytes = om.writeValueAsBytes(arr)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, ManifestName), true)
    try out.write(bytes) finally out.close()
    // Snapshot log (the Iceberg HadoopTables protocol shape: numbered
    // manifest versions + a version-hint file): every manifest write
    // APPENDS version N+1 and then atomically repoints the hint via a tmp
    // rename — a reader that resolved version N keeps a consistent view
    // for as long as N's data files live (appends never delete files, so
    // append-only histories are fully time-travelable; compaction is the
    // expiry boundary, see [[compact]]/[[expireSnapshots]]).
    val logDir = new org.apache.hadoop.fs.Path(root, SnapshotLogDir)
    fs.mkdirs(logDir)
    val v = currentVersion(spark, path) + 1
    // tmp + rename, like the hint below: a version file must APPEAR
    // complete or not at all — a reader (or expireUnservable's sweep) that
    // lists the log mid-write must never see a half-flushed v*.json
    val vTmp = new org.apache.hadoop.fs.Path(logDir, f".v$v%05d.json.tmp")
    val vOut = fs.create(vTmp, true)
    try vOut.write(bytes) finally vOut.close()
    val vPath = new org.apache.hadoop.fs.Path(logDir, f"v$v%05d.json")
    if (!fs.rename(vTmp, vPath))
      throw new java.io.IOException(s"snapshot version write failed for $path")
    val hintTmp = new org.apache.hadoop.fs.Path(logDir, ".version-hint.tmp")
    val hOut = fs.create(hintTmp, true)
    try hOut.write(v.toString.getBytes("UTF-8")) finally hOut.close()
    val hint = new org.apache.hadoop.fs.Path(logDir, VersionHintName)
    if (fs.exists(hint)) fs.delete(hint, false)
    if (!fs.rename(hintTmp, hint))
      throw new java.io.IOException(s"version-hint update failed for $path")
    stats.length
  }

  /** File-level url_bucket stats straight from parquet footers (what
    * writeManifest persists). Files without usable url_bucket statistics
    * (foreign writer, stats disabled, schema drift) are recorded with the
    * FULL bucket range — always opened, never silently dropped: pruning may
    * only change which files are read, never the answer. */
  def collectStats(spark: SparkSession, path: String,
                   dates: Option[Set[String]] = None): Seq[FileStat] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val stats = scala.collection.mutable.ArrayBuffer.empty[FileStat]
    for (part <- fs.listStatus(root)
         if part.isDirectory && part.getPath.getName.startsWith("crawl_date=")
         if dates.forall(_.contains(part.getPath.getName.stripPrefix("crawl_date=")))) {
      val date = part.getPath.getName.stripPrefix("crawl_date=")
      for (f <- fs.listStatus(part.getPath)
           if f.isFile && f.getPath.getName.endsWith(".parquet")) {
        stats += fileStat(conf, f.getPath, date)
      }
    }
    stats.toSeq
  }

  /** One file's manifest entry, straight from its parquet footer. */
  private def fileStat(conf: org.apache.hadoop.conf.Configuration,
                       p: org.apache.hadoop.fs.Path, date: String): FileStat = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var tsMn = Long.MaxValue
          var tsMx = Long.MinValue
          var rows = 0L
          for (block <- reader.getFooter.getBlocks.asScala) {
            rows += block.getRowCount
            for (c <- block.getColumns.asScala) c.getPath.toDotString match {
              case "url_bucket" =>
                val st: org.apache.parquet.column.statistics.Statistics[_] = c.getStatistics
                // Try-guarded: a foreign writer may have left url_bucket
                // with a NON-NUMERIC type (schema drift) — genericGetMin
                // would then throw ClassCastException; unusable stats must
                // DEGRADE to the full bucket range (file always opened),
                // never fail the build.
                if (st != null && !st.isEmpty) scala.util.Try {
                  (st.genericGetMin.asInstanceOf[Number].intValue(),
                    st.genericGetMax.asInstanceOf[Number].intValue())
                } match {
                  case scala.util.Success((lo, hi)) =>
                    mn = math.min(mn, lo); mx = math.max(mx, hi)
                  case scala.util.Failure(_) =>
                    mn = 0; mx = Buckets - 1
                }
              case "warc_ts" =>
                // Spark writes TimestampType as INT64 epoch micros; same
                // degrade-on-drift discipline as url_bucket
                val st: org.apache.parquet.column.statistics.Statistics[_] = c.getStatistics
                if (st != null && !st.isEmpty) scala.util.Try {
                  (st.genericGetMin.asInstanceOf[Number].longValue(),
                    st.genericGetMax.asInstanceOf[Number].longValue())
                } match {
                  case scala.util.Success((lo, hi)) =>
                    tsMn = math.min(tsMn, lo); tsMx = math.max(tsMx, hi)
                  case scala.util.Failure(_) =>
                    tsMn = Long.MinValue; tsMx = Long.MaxValue
                }
              case _ =>
            }
          }
          val (bLo, bHi) = if (mn != Int.MaxValue) (mn, mx) else (0, Buckets - 1)
          val (tLo, tHi) = if (tsMn != Long.MaxValue) (tsMn, tsMx)
                           else (Long.MinValue, Long.MaxValue)
          FileStat(p.toString, date, bLo, bHi, rows, tLo, tHi)
        } finally reader.close()
  }

  /** The manifest, if the lake has one. */
  def readManifest(spark: SparkSession, path: String): Option[Seq[FileStat]] =
    readFileBytes(spark, new org.apache.hadoop.fs.Path(path, ManifestName))
      .flatMap(parseManifest)

  private def readFileBytes(spark: SparkSession,
                            p: org.apache.hadoop.fs.Path): Option[Array[Byte]] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try {
      val in = fs.open(p)
      Some(try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toByteArray
      } finally in.close())
    } catch {
      // a file that cannot even be read (torn write, checksum mismatch) is
      // indistinguishable from absent on this metadata path: callers treat
      // None as corrupt/unservable and rebuild or sweep
      case _: java.io.IOException => None
    }
  }

  /** A torn/corrupt manifest parses as absent (callers rebuild), never as
    * an exception on the read path. */
  private def parseManifest(bytes: Array[Byte]): Option[Seq[FileStat]] =
    scala.util.Try {
      val arr = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map(n => FileStat(n.get("path").asText(),
        n.get("date").asText(), n.get("min_bucket").asInt(),
        n.get("max_bucket").asInt(),
        // legacy manifests lack these fields → unknown sentinels
        // (full-range reads, row count unavailable)
        if (n.has("rows")) n.get("rows").asLong() else -1L,
        if (n.has("min_ts")) n.get("min_ts").asLong() else Long.MinValue,
        if (n.has("max_ts")) n.get("max_ts").asLong() else Long.MaxValue)).toSeq
    }.toOption

  // --- Snapshots / time travel (append-only histories) -------------------

  /** Latest snapshot version; 0 when the lake predates the snapshot log.
    * Hint-file first, directory-scan fallback (a crash between the version
    * write and the hint rename leaves the new version discoverable). */
  def currentVersion(spark: SparkSession, path: String): Int = {
    val logDir = new org.apache.hadoop.fs.Path(path, SnapshotLogDir)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hinted = readFileBytes(spark,
        new org.apache.hadoop.fs.Path(logDir, VersionHintName))
      .flatMap(b => scala.util.Try(new String(b, "UTF-8").trim.toInt).toOption)
    val scanned =
      if (!fs.exists(logDir)) None
      else fs.listStatus(logDir).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toInt).toOption }
        .flatten.maxOption
    (hinted.toSeq ++ scanned.toSeq).maxOption.getOrElse(0)
  }

  /** (version, nFiles, totalRows) per retained snapshot, ascending. */
  def snapshots(spark: SparkSession, path: String): Seq[(Int, Int, Long)] = {
    val logDir = new org.apache.hadoop.fs.Path(path, SnapshotLogDir)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) Nil
    else fs.listStatus(logDir).toSeq.map(_.getPath).flatMap { p =>
      val n = p.getName
      if (!(n.startsWith("v") && n.endsWith(".json"))) None
      else for {
        v <- scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toInt).toOption
        stats <- readFileBytes(spark, p).flatMap(parseManifest)
      } yield (v, stats.length, stats.map(s => math.max(0L, s.rows)).sum)
    }.sortBy(_._1)
  }

  /** Time-travel read: exactly the data files snapshot `version` listed —
    * the view a reader that resolved that version saw. Valid for as long
    * as those files live: appends never delete, so append-only histories
    * travel freely; COMPACTION rewrites files and expires older snapshots
    * ([[compact]] → [[expireSnapshots]]), after which this throws naming
    * the vanished files (Iceberg's expired-snapshot contract, not a
    * silent partial read). */
  def readVersion(spark: SparkSession, path: String, version: Int): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path,
      s"$SnapshotLogDir/" + f"v$version%05d.json")
    val stats = readFileBytes(spark, p).flatMap(parseManifest).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot v$version of $path does not exist or was expired " +
          s"(retained: ${snapshots(spark, path).map(_._1).mkString(",")})"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val missing = stats.map(_.path)
      .filterNot(f => fs.exists(new org.apache.hadoop.fs.Path(f)))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"snapshot v$version of $path references files removed by a later " +
          s"compaction: ${missing.take(3).mkString(", ")}" +
          (if (missing.size > 3) s" (+${missing.size - 3} more)" else ""))
    if (stats.isEmpty) read(spark, path).limit(0)
    else spark.read.option("basePath", path).parquet(stats.map(_.path): _*)
  }

  /** Drop snapshot-log entries older than the newest `keepLast` (the
    * `expire_snapshots` maintenance action). The CURRENT manifest and the
    * data files are untouched — only time-travel history is released. */
  def expireSnapshots(spark: SparkSession, path: String, keepLast: Int = 1): Int = {
    val logDir = new org.apache.hadoop.fs.Path(path, SnapshotLogDir)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = snapshots(spark, path).map(_._1)
    val drop = vs.dropRight(math.max(0, keepLast))
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(logDir, f"v$v%05d.json"), false): Unit
    }
    drop.length
  }

  /** Expire every snapshot (except the newest) that references a data file
    * no longer on disk — the cleanup for histories whose files were
    * deleted OUTSIDE a completed compaction (a compaction that crashed
    * after its swap, a foreign delete). Snapshots whose files all still
    * live are kept: file ADDITIONS by later writers never invalidate an
    * older as-of view. Metadata-only (per-snapshot existence checks). */
  def expireUnservable(spark: SparkSession, path: String): Int = {
    val logDir = new org.apache.hadoop.fs.Path(path, SnapshotLogDir)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // enumerate the on-disk log, not snapshots(): a torn/corrupt v*.json is
    // hidden by snapshots() (and readVersion fails on it), but it is still
    // unservable and must be swept rather than linger forever
    val onDisk =
      if (!fs.exists(logDir)) Seq.empty[Int]
      else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toInt).toOption }
        .flatten.sorted
    val newestParsable = snapshots(spark, path).lastOption.map(_._1)
    var dropped = 0
    for (v <- onDisk if !newestParsable.contains(v)) {
      val p = new org.apache.hadoop.fs.Path(logDir, f"v$v%05d.json")
      val servable = try {
        val in = fs.open(p)
        val bytes = try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
          bos.toByteArray
        } finally in.close()
        parseManifest(bytes) match {
          case Some(stats) =>
            stats.forall(s => fs.exists(new org.apache.hadoop.fs.Path(s.path)))
          case None =>
            // exists but fails to parse ⇒ torn/corrupt ⇒ unservable — but
            // ONLY when a newer parsable snapshot exists: a newer-than-
            // newest unparsable file may be a foreign writer's in-flight
            // commit (our own writes are tmp+rename-atomic), and deleting
            // it would hole the log mid-write
            newestParsable.forall(v >= _)
        }
      } catch {
        // a checksum mismatch IS corruption evidence (torn bytes under an
        // intact .crc) — same unservable rule as an unparsable body
        case _: org.apache.hadoop.fs.ChecksumException =>
          newestParsable.forall(v >= _)
        // any other read failure (throttling, network blip) is NOT —
        // deleting on a transient error could destroy a healthy snapshot;
        // leave it for the next sweep
        case _: java.io.IOException => true
      }
      if (!servable) { fs.delete(p, false); dropped += 1 }
    }
    dropped
  }

  /** Bucket-pruned scan: read ONLY the files whose stat range can contain a
    * requested url_bucket (plus an exact filter on the survivors) — the
    * Iceberg manifest-pruning read path. Result always equals the full-scan
    * filter; the manifest changes which files are OPENED, not the answer.
    * Falls back to a freshly built manifest if the lake lacks one. */
  def readBuckets(spark: SparkSession, path: String, buckets: Seq[Int],
                  validate: Boolean = true): DataFrame = {
    val stats = trustedStats(spark, path, validate = validate)
    val wanted = buckets.toSet
    val files = stats.filter(s => wanted.exists(b => b >= s.minBucket && b <= s.maxBucket))
      .map(_.path)
    if (files.isEmpty) {
      read(spark, path).filter(lit(false))
    } else {
      // basePath keeps the crawl_date partition column available even
      // though we enumerate leaf files explicitly
      spark.read.option("basePath", path).parquet(files: _*)
        .filter(col("url_bucket").isInCollection(wanted))
    }
  }

  /** Files a bucket read would open vs the lake total — the pruning
    * effectiveness measure (exposed for tests/ops dashboards). Pass `day`
    * to measure the JOINT date∩bucket prune `readDayBuckets` performs. */
  def pruneStats(spark: SparkSession, path: String, buckets: Seq[Int],
                 day: Option[String] = None): (Int, Int) = {
    val stats = trustedStats(spark, path)
    val wanted = buckets.toSet
    val hit = stats.count(s => day.forall(_ == s.crawlDate) &&
      wanted.exists(b => b >= s.minBucket && b <= s.maxBucket))
    (hit, stats.length)
  }

  /** Joint date ∩ bucket pruned scan: opens ONLY the files whose partition
    * date matches AND whose url_bucket stat range can contain a requested
    * bucket — the composition Iceberg gets from one manifest pass over
    * (partition value, column bounds). A date-only read then a bucket
    * filter would open every file of the day; a bucket-only read would
    * open the matching buckets of EVERY day. Exact filters on the
    * survivors keep the answer independent of pruning. */
  def readDayBuckets(spark: SparkSession, path: String, day: String,
                     buckets: Seq[Int], validate: Boolean = true): DataFrame = {
    // day-scoped stats: validation lists ONE partition directory and the
    // footer-scan fallback opens only that day's files
    val stats = trustedStats(spark, path, dates = Some(Set(day)), validate = validate)
    val wanted = buckets.toSet
    val files = stats.filter(s => s.crawlDate == day &&
      wanted.exists(b => b >= s.minBucket && b <= s.maxBucket)).map(_.path)
    if (files.isEmpty) read(spark, path).filter(lit(false))
    else spark.read.option("basePath", path).parquet(files: _*)
      .filter(col("crawl_date") === lit(day) &&
        col("url_bucket").isInCollection(wanted))
  }

  /** Per-day (files, rows) accounting straight off the manifest — the
    * ops-dashboard view Iceberg serves from manifest metadata without
    * touching data files. Rows are -1-summed as "unknown" when any file
    * predates the row-count manifest field. */
  def dayAccounting(spark: SparkSession, path: String): Seq[(String, Int, Long)] =
    trustedStats(spark, path).groupBy(_.crawlDate).toSeq.sortBy(_._1).map {
      case (day, fs) =>
        val rows = if (fs.exists(_.rows < 0)) -1L else fs.map(_.rows).sum
        (day, fs.length, rows)
    }
}
