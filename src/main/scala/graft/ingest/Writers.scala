package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse writers — SURVEY.md §2.1 rows S6–S8. */
object Writers {

  /** S7: partitioned parquet write — the warehouse layout. Partition
    * columns become directories, enabling partition pruning on read;
    * at 100 TB choose low-cardinality columns (date, region) so files
    * stay large. */
  def partitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Normalized (scheme, authority, path) key for location equality.
    * Comparing raw `URI.getPath` alone equates `hdfs://nn/warehouse/t`
    * with `file:/warehouse/t` — a false collision that would spuriously
    * block a legitimate recreate (fail-loud, but wrong). The opposite
    * error is worse: defaulting a MISSING scheme to `file` would make a
    * scheme-less metastore location (common for entries migrated from
    * Hive) compare UNEQUAL to the qualified default path on an
    * hdfs-default deployment, letting the destruction guard pass and
    * delete live data. So both sides are qualified through the actual
    * FileSystem first — makeQualified resolves scheme and authority from
    * fs.defaultFS exactly the way reads of that location would. */
  private def locKey(u: java.net.URI): (String, String, String) = {
    val (fs, p) = fsFor(u.toString)
    val q = fs.makeQualified(p).toUri
    (
      Option(q.getScheme).getOrElse("file"),
      Option(q.getAuthority).getOrElse(""),
      java.nio.file.Paths.get(Option(q.getPath).filter(_.nonEmpty).getOrElse("/"))
        .normalize.toString.stripSuffix("/"),
    )
  }

  /** Clear the way for (re)creating MANAGED table `table`. A fresh
    * metastore over a reused warehouse dir (each harness JVM rebuilds
    * the catalog; spark-warehouse persists) makes saveAsTable fail with
    * LOCATION_ALREADY_EXISTS. Same hazard — and same rules — as
    * Pipeline.loadInto's overwrite path: only a MANAGED location (or a
    * genuinely orphaned default path) may be deleted; an EXTERNAL
    * table's data is preserved by DROP on purpose, so recreating a
    * managed table over it must fail loudly, not delete it. The orphan
    * branch additionally scans the catalog for ANY other entry whose
    * location resolves to the default path (an EXTERNAL table under a
    * different name pointing there is live data, not an orphan) — an
    * O(tables-in-db) metastore walk, acceptable for a layout-changing
    * maintenance write. */
  private def prepareManagedTarget(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val dtp = catalog.defaultTablePath(ident)
    if (catalog.tableExists(ident)) {
      val meta = catalog.getTableMetadata(ident)
      if (meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED) {
        spark.sql(s"DROP TABLE $table")
        deleteTree(meta.location.toString)
      } else {
        require(locKey(dtp) != locKey(meta.location),
          s"prepareManagedTarget: EXTERNAL table $table sits at its default managed " +
            s"path (${meta.location}); recreating over it would destroy preserved data. " +
            "Drop the table and relocate its data explicitly first.")
        spark.sql(s"DROP TABLE $table") // external: directory preserved
        deleteTree(dtp.toString)        // only the would-be managed path
      }
    } else {
      // no same-name entry — but the default dir is only an orphan if no
      // OTHER catalog entry claims it (temp views have no metadata; skip)
      val db = ident.database.getOrElse(catalog.getCurrentDatabase)
      val claimant = catalog.listTables(db).filter(_.table != table).find(t =>
        scala.util.Try(catalog.getTableMetadata(t)).toOption
          .exists(m => locKey(m.location) == locKey(dtp)))
      require(claimant.isEmpty,
        s"prepareManagedTarget: table ${claimant.get} already stores its data at " +
          s"$table's default managed path ($dtp); deleting it as an orphan would " +
          "destroy that table. Relocate it first.")
      deleteTree(dtp.toString) // orphan dir from a dead metastore
    }
  }

  /** Plain managed parquet table (catalog entry + default location) with
    * the same collision safety as [[bucketed]]. */
  def managed(df: DataFrame, table: String): Unit = {
    prepareManagedTarget(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** Bucketed managed table — the co-located-join layout: both sides of a
    * recurring fact↔fact join bucketed on the join key with the same
    * bucket count hash-partition identically on disk, so the join plans
    * with ZERO shuffle (SortMergeJoin over bucket-aligned scans). At
    * 100 TB this converts the dominant repeated shuffle into a one-time
    * write cost. Requires saveAsTable (bucket metadata lives in the
    * catalog). */
  def bucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit = {
    prepareManagedTarget(df.sparkSession, table)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Sorted/clustered parquet layout — the SCAN-PRUNING twin of
    * [[bucketed]] (which co-locates joins): range-repartition on the
    * cluster key, then sort within each partition, so every output file
    * covers a narrow, disjoint key range and carries tight parquet
    * row-group min/max statistics. A pushed-down range predicate then
    * skips whole row groups whose stats miss the range — at 100 TB the
    * difference between scanning a day and scanning the table for a
    * date-range query (PlanAuditSpec locks the skip via scan
    * numOutputRows). Write cost: one range exchange + in-partition sort.
    * `nFiles` sizes the layout: at scale pick totalBytes/targetFileSize,
    * as [[compact]] does.
    *
    * The cluster key must be a type ParquetFilters can turn into a
    * parquet-level predicate (int/long/date/string/decimal…).
    * TIMESTAMP_NTZ is NOT one in Spark 4.1 — the predicate shows under
    * PushedFilters but silently never reaches the row-group stats, so an
    * NTZ-clustered layout prunes nothing; cluster on a derived DATE
    * instead (s15_sorted_layout demonstrates exactly this). */
  def clustered(df: DataFrame, path: String, clusterCol: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** S8: incremental (high-watermark) append — only rows strictly past
    * the last loaded watermark are appended; the predicate pushes down to
    * the source scan so the incremental pass reads only new data. Returns
    * the watermark to use for the NEXT run: the max of the freshly
    * appended rows, or the CALLER'S lastWatermark when nothing fresh
    * arrived — never None after an idle run, which would make the
    * documented chaining pattern (`val newWm = incrementalAppend(...,
    * lastWatermark, ...)`) silently degrade the next run into an
    * unfiltered full re-append of the whole table. */
  def incrementalAppend(
      df: DataFrame,
      watermarkCol: String,
      lastWatermark: Option[Any],
      path: String,
  ): Option[Any] = {
    val fresh = (lastWatermark match {
      case Some(wm) => df.filter(col(watermarkCol) > lit(wm))
      case None     => df
    }).persist()
    try {
      // Compute the watermark before the write from the cached frame so a
      // post-write re-scan of a live source can't return a watermark for
      // rows that were never appended (which would skip them forever —
      // the fatal direction). Caveat: persist is a cache, not a snapshot;
      // if a cached partition is lost and recomputed from a still-moving
      // source, rows newer than the returned watermark can be appended
      // now and re-appended next run (duplicates — the recoverable
      // direction). A moving source that needs exactly-once requires a
      // staging write + watermark-from-staged-files, or source-side
      // snapshot isolation (JDBC repeatable-read, table-format snapshot).
      val wm = fresh.agg(max(col(watermarkCol))).collect().headOption.flatMap(r => Option(r.get(0)))
      fresh.write.mode(SaveMode.Append).parquet(path)
      wm.orElse(lastWatermark)
    } finally fresh.unpersist()
  }

  /** Hadoop FS handle for `path` (r3 verdict #3: the rewrite family runs
    * on `org.apache.hadoop.fs.FileSystem`, not `java.nio.file`, so
    * MERGE/SCD2/compaction work unchanged on HDFS and object stores).
    * The active session's hadoopConf carries fs.* settings (credentials,
    * endpoints); a bare Configuration still resolves local paths for
    * library use outside a session. */
  private[graft] def fsFor(path: String): (FileSystem, HPath) = {
    val conf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
    val p = new HPath(path)
    (p.getFileSystem(conf), p)
  }

  /** Swap `tmpPath` into `path` with rename-aside. A crash between the
    * two renames leaves the data recoverable in `path__old`;
    * [[recoverSwap]] (called by every entry point before touching the
    * dataset) moves it back, so no state reads as "brand new" after a
    * partial swap. On HDFS both renames are atomic metadata ops; on an
    * object store rename is a copy (O(data)) — there the real fix is a
    * table format with metadata commits, which this family mirrors
    * semantically. */
  private def swapIn(fs: FileSystem, path: String, tmpPath: String): Unit = {
    val target = new HPath(path)
    val aside = new HPath(path + "__old")
    if (fs.exists(aside)) fs.delete(aside, true)
    require(fs.rename(target, aside), s"swapIn: rename $target -> $aside failed")
    require(fs.rename(new HPath(tmpPath), target), s"swapIn: rename $tmpPath -> $target failed")
    fs.delete(aside, true)
  }

  private def recoverSwap(fs: FileSystem, path: String): Boolean = {
    val target = new HPath(path)
    val aside = new HPath(path + "__old")
    if (!fs.exists(target) && fs.exists(aside)) {
      require(fs.rename(aside, target), s"recoverSwap: rename $aside -> $target failed")
      true
    } else false
  }

  /** Heal a crashed swap: if the dataset is missing but its rename-aside
    * copy exists, restore it. Returns true if a recovery happened. */
  def recoverSwap(path: String): Boolean = recoverSwap(fsFor(path)._1, path)

  /** Infer first-level-down Hive partition columns (dir segments shaped
    * `k=v`) so rewrites preserve the layout instead of flattening it. */
  private def partitionColsOf(fs: FileSystem, path: String): Seq[String] = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    var level = new HPath(path)
    var continue = fs.exists(level) && fs.getFileStatus(level).isDirectory
    while (continue) {
      val partDirs = fs.listStatus(level)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      partDirs.map(_.getPath.getName.takeWhile(_ != '=')).distinct.toSeq match {
        // descend a k=v subdir specifically — a stray non-partition
        // directory must not truncate detection of deeper partition levels
        case Seq(one) => cols += one; level = partDirs.head.getPath; continue = true
        case _ => continue = false
      }
    }
    cols.toSeq
  }

  /** Recursive delete on the path's Hadoop filesystem (accepts a URI
    * with scheme, e.g. a catalog table location). No-op for a missing
    * path. Used by [[Pipeline.loadInto]] for warehouse-dir cleanup —
    * which may live on HDFS/object storage — while the rewrite family
    * below deletes through its already-resolved FileSystem handle. */
  def deleteTree(path: String): Unit = {
    val (fs, p) = fsFor(path)
    fs.delete(p, true)
  }

  /** Local-scratch overload (java.nio): kept ONLY for process-local tmp
    * trees — notably [[Scratch]]'s JVM-shutdown hook, which must not
    * depend on Hadoop's FileSystem cache (closed by its own shutdown
    * hook, racing ours). */
  def deleteTree(p: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(p)) return
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally walk.close()
  }

  /** Recursive local copy (java.nio) — what lets a session-cached
    * IMMUTABLE fixture (e.g. a producer-table prefix built once per
    * corpus) be cloned into each execution's scratch dir so the
    * execution can mutate its copy freely. Destination must not
    * exist. */
  def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    require(java.nio.file.Files.exists(src), s"copyTree: missing source $src")
    require(!java.nio.file.Files.exists(dst), s"copyTree: destination exists $dst")
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { f =>
      val to = dst.resolve(src.relativize(f))
      if (java.nio.file.Files.isDirectory(f)) {
        java.nio.file.Files.createDirectories(to): Unit
      } else {
        java.nio.file.Files.createDirectories(to.getParent)
        java.nio.file.Files.copy(f, to): Unit
      }
    } finally walk.close()
  }

  /** A real MERGE rejects duplicate source keys; silently unioning both
    * copies would corrupt the keyed dataset's uniqueness invariant. One
    * extra aggregate job is the price of failing fast. NULL keys are
    * counted separately: count_distinct ignores them, so without the
    * third counter a single NULL-key row would surface as a misleading
    * "duplicate key" failure (and N of them would be indistinguishable
    * from real duplicates). */
  private[graft] def requireUniqueKeys(op: String, updates: DataFrame, key: String): Unit = {
    val Array(nRows, nKeys, nNullKeys) = updates
      .agg(
        count(lit(1)),
        count_distinct(col(key)),
        coalesce(sum(when(col(key).isNull, 1L).otherwise(0L)), lit(0L)),
      ).collect().head
      .toSeq.map(_.asInstanceOf[Long]).toArray
    require(nNullKeys == 0,
      s"$op: updates contain $nNullKeys NULL '$key' values — a merge key must be non-null")
    require(nRows == nKeys,
      s"$op: updates contain duplicate '$key' values ($nRows rows, $nKeys distinct keys)")
  }

  /** Key-based upsert (MERGE) into a parquet dataset without a table
    * format: keep-rows = existing ANTI JOIN updates (one shuffle on the
    * key), union the updates, rewrite via temp dir + rename-aside swap.
    * At 100 TB a partitioned layout limits the rewrite to touched
    * partitions (filter `existing` by the updates' partition values
    * before this call); a real deployment graduates to a table format
    * with transactional MERGE, which this mirrors semantically. */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame, key: String): Unit = {
    requireUniqueKeys("upsertByKey", updates, key)
    val (fs, target) = fsFor(path) // resolved ONCE; every FS op below reuses it
    recoverSwap(fs, path) // a crashed prior swap must not read as an empty dataset
    if (!fs.exists(target)) {
      updates.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val parts = partitionColsOf(fs, path)
    val existing = spark.read.parquet(path)
    val merged = existing.join(updates, Seq(key), "left_anti").unionByName(updates)
    val tmpPath = path + "__upsert_tmp"
    val writer = merged.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer).parquet(tmpPath)
    swapIn(fs, path, tmpPath)
  }

  /** SCD Type-2 apply — dimension HISTORY instead of overwrite: the
    * stored dim carries (data..., valid_from, valid_to) with the current
    * version marked valid_to IS NULL. Applying a batch at
    * `effectiveVersion`:
    *  - current rows whose key is in the batch are CLOSED
    *    (valid_to = effectiveVersion),
    *  - all other rows pass through untouched,
    *  - batch rows become the new current versions
    *    (valid_from = effectiveVersion, valid_to = NULL).
    * One semi + one anti join on the key (the same shuffle class as
    * MERGE), rewrite via tmp + rename-aside swap. As with upsertByKey, a
    * real deployment graduates to a table format; the semantics mirror
    * MERGE ... WHEN MATCHED THEN UPDATE/INSERT history handling. */
  def scdType2(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      key: String,
      effectiveVersion: Long,
  ): Unit = {
    requireUniqueKeys("scdType2", updates, key)
    val (fs, target) = fsFor(path)
    recoverSwap(fs, path)
    val stamped = updates
      .withColumn("valid_from", lit(effectiveVersion))
      .withColumn("valid_to", lit(null).cast("long"))
    if (!fs.exists(target)) {
      stamped.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val parts = partitionColsOf(fs, path) // preserve a Hive layout, as upsert/compact do
    val existing = spark.read.parquet(path)
    // Reject out-of-order or replayed applies BEFORE touching anything: a
    // version ≤ the newest stored one would close current rows with an
    // earlier bound — inverted/zero-length intervals no as-of query
    // matches (and a silent wrong answer for point-in-time reads).
    val newest = existing.agg(max(col("valid_from"))).collect().head
    require(newest.isNullAt(0) || effectiveVersion > newest.getLong(0),
      s"scdType2: effectiveVersion $effectiveVersion must exceed the newest stored " +
        s"version ${newest.get(0)} — out-of-order or replayed apply")
    // one scan + ONE join: mark matched keys, close matched CURRENT rows,
    // pass everything else (history + unmatched current) through untouched
    val keys = updates.select(col(key)).withColumn("__hit", lit(true))
    val merged = existing.join(keys, Seq(key), "left")
      .withColumn(
        "valid_to",
        when(col("valid_to").isNull && coalesce(col("__hit"), lit(false)), lit(effectiveVersion))
          .otherwise(col("valid_to")))
      .drop("__hit")
      .unionByName(stamped)
    val tmpPath = path + "__scd2_tmp"
    val writer = merged.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer).parquet(tmpPath)
    swapIn(fs, path, tmpPath)
  }

  /** Small-file compaction — streaming/incremental ingestion leaves many
    * tiny parquet files; at 100 TB that destroys scan parallelism math
    * (task-per-file) and NameNode/listing costs. Rewrites the dataset
    * into ~`targetMB`-sized files (size-based repartition, atomic via
    * temp dir + swap). Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, targetMB: Int = 128): (Int, Int) = {
    // one recursive listing yields both the file count and the byte total
    // (a FileStatus carries its length — no per-file stat round-trips,
    // which matters on object stores where each stat is a request)
    val (fs, _) = fsFor(path)
    def parquetFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(new HPath(p), true)
      val acc = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) acc += st
      }
      acc.toSeq
    }
    recoverSwap(fs, path)
    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nParts = math.max(1, (totalBytes / (targetMB.toLong * 1024 * 1024)).toInt)
    val tmpPath = path + "__compact_tmp"
    val parts = partitionColsOf(fs, path) // preserve a Hive layout instead of flattening it
    val writer = spark.read.parquet(path).repartition(nParts).write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer).parquet(tmpPath)
    swapIn(fs, path, tmpPath)
    (before.size, parquetFiles(path).size)
  }
}
