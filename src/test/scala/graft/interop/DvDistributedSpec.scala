package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The deletion-vector SCALE contract (round-10 verdict item): MoR
  * delete commits build per-file bitmaps ON EXECUTORS and collect only
  * O(touched files) descriptor rows to the driver — never the matched
  * positions — and reads ship descriptor-only filters whose blobs are
  * decoded task-side. Asserted through the [[DvIntrospect]] seam, which
  * records the size of the ONE driver collect each commit performs and
  * the descriptor count of each read filter built. */
class DvDistributedSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  test("Delta: a many-row DV delete collects O(touched files), not O(rows)") {
    val path = freshDir("dvd_delta_scale")
    DeltaLake.write(
      spark.range(0, 4000).select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartitionByRange(4, col("k")),
      path)
    assert(DeltaLake.snapshot(spark, path).files.size == 4)
    // ~2000 matched rows spread over exactly 2 of the 4 files
    DvIntrospect.lastCommitDriverRows = -1
    DeltaLake.deleteMergeOnRead(spark, path, col("k") < 2000L)
    val s = DeltaLake.snapshot(spark, path)
    val dvFiles = s.files.filter(_.dv.nonEmpty)
    // range boundaries are sampled, so the match may touch 2 or 3 of
    // the 4 files — the contract is driver rows == touched files,
    // orders of magnitude below the 2000 matched positions
    assert(dvFiles.size >= 2 && dvFiles.size < 4)
    assert(DvIntrospect.lastCommitDriverRows == dvFiles.size,
      s"the commit's driver collect must return one descriptor per touched file " +
        s"(${dvFiles.size}), not the 2000 matched positions — got " +
        s"${DvIntrospect.lastCommitDriverRows}")
    assert(dvFiles.map(_.dv.get.cardinality).sum == 2000L)
    assert(DeltaLake.read(spark, path).count() == 2000L)
    // a many-hundred-position vector cannot inline: it must be a
    // task-written framed .bin blob ("p"), never positions shipped
    // through the driver (a boundary file with a handful may inline)
    val bigDvs = dvFiles.map(_.dv.get).filter(_.cardinality > 100)
    assert(bigDvs.nonEmpty && bigDvs.forall(_.storageType == "p"))
    bigDvs.foreach { d =>
      assert(new java.io.File(d.pathOrInlineDv).isFile,
        s"task-side DV blob ${d.pathOrInlineDv} missing")
    }
  }

  test("row tracking backfill at scale: one id per row, unique, watermark exact") {
    // the s53 backfill-exactness proof (moved here r13): a multi-file
    // distributed base backfills one baseRowId range per file, the
    // append takes the next range, the watermark lands at rows-1, and
    // every row serves a unique non-null id — checked distributed
    val path = freshDir("dvd_rowtrack_scale")
    DeltaLake.write(
      spark.range(0, 6000).filter(col("id") % 2 === 0)
        .select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartitionByRange(4, col("k")), path)
    DeltaLake.enableRowTracking(spark, path)
    DeltaLake.write(
      spark.range(0, 6000).filter(col("id") % 2 === 1)
        .select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartitionByRange(3, col("k")), path,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(DeltaLake.snapshot(spark, path).rowIdHighWaterMark == 5999L,
      "backfill + append must assign exactly one id per row")
    val ids = DeltaLake.readWithRowTracking(spark, path).select(col("_row_id"))
    assert(ids.filter(col("_row_id").isNull).count() == 0L)
    assert(ids.distinct().count() == 6000L, "ids must be unique across all files")
  }

  test("Delta: a point delete still inlines; a superseding merge stays file-bounded") {
    val path = freshDir("dvd_delta_merge")
    DeltaLake.write(
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
        .repartitionByRange(2, col("k")),
      path)
    // point delete -> storageType "i" (inline z85 in the log line)
    DvIntrospect.lastCommitDriverRows = -1
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 3L)
    val s1 = DeltaLake.snapshot(spark, path)
    val dv1 = s1.files.flatMap(_.dv)
    assert(dv1.size == 1 && dv1.head.storageType == "i" && dv1.head.cardinality == 1L)
    assert(DvIntrospect.lastCommitDriverRows == 1)
    // a second, larger delete on the SAME file merges the prior vector
    // task-side (superseding DV) — the driver still sees one descriptor
    DvIntrospect.lastCommitDriverRows = -1
    DeltaLake.deleteMergeOnRead(spark, path, col("k") < 400L)
    assert(DvIntrospect.lastCommitDriverRows == 1)
    val s2 = DeltaLake.snapshot(spark, path)
    val dv2 = s2.files.flatMap(_.dv)
    assert(dv2.size == 1, "one superseding vector per file")
    assert(dv2.head.cardinality == 400L, "merged vector = union of old and new positions")
    assert(DeltaLake.read(spark, path).count() == 600L)
    assert(DeltaLake.read(spark, path).filter(col("k") === 3L).count() == 0L)
  }

  test("Delta: the read filter ships descriptors, not positions") {
    val path = freshDir("dvd_delta_read")
    DeltaLake.write(
      spark.range(0, 3000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(3, col("k")),
      path)
    DeltaLake.deleteMergeOnRead(spark, path, col("k") % 3L === 0L)
    DvIntrospect.lastReadDescriptors = -1
    val df = DeltaLake.read(spark, path)
    // building the frame resolved the snapshot's DV filter: one
    // descriptor per DV-carrying file, positions untouched driver-side
    assert(DvIntrospect.lastReadDescriptors == 3,
      s"expected 3 per-file descriptors, got ${DvIntrospect.lastReadDescriptors}")
    assert(df.count() == 2000L)
    assert(df.filter(col("k") % 3L === 0L).count() == 0L)
  }

  test("Iceberg v3: a many-row DV delete collects O(touched files), not O(rows)") {
    val path = freshDir("dvd_ice_scale")
    Iceberg.write(
      spark.range(0, 4000).select(col("id").as("k"), (col("id") % 5).as("v"))
        .repartitionByRange(4, col("k")),
      path)
    Iceberg.upgradeToV3(spark, path)
    DvIntrospect.lastCommitDriverRows = -1
    Iceberg.deleteMergeOnRead(spark, path, col("k") < 2000L)
    val s = Iceberg.snapshot(spark, path)
    // range boundaries are sampled, so the match may touch 2 or 3 of
    // the 4 files — the contract is driver rows == touched files,
    // orders of magnitude below the 2000 matched positions
    assert(s.dvDeletes.size >= 2 && s.dvDeletes.size < 4)
    assert(DvIntrospect.lastCommitDriverRows == s.dvDeletes.size,
      s"the commit's driver collect must return one locator per touched file " +
        s"(${s.dvDeletes.size}) — got ${DvIntrospect.lastCommitDriverRows}")
    assert(s.dvDeletes.map(_.cardinality).sum == 2000L)
    assert(Iceberg.read(spark, path).count() == 2000L)
    // the puffin files were written by the build tasks
    s.dvDeletes.foreach(d =>
      assert(new java.io.File(new org.apache.hadoop.fs.Path(d.path).toUri.getPath).isFile))
  }

  test("Iceberg v3: superseding DV merge is task-side; one DV per file holds") {
    val path = freshDir("dvd_ice_merge")
    Iceberg.write(
      spark.range(0, 1000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(2, col("k")),
      path)
    Iceberg.upgradeToV3(spark, path)
    Iceberg.deleteMergeOnRead(spark, path, col("k") === 5L)
    DvIntrospect.lastCommitDriverRows = -1
    Iceberg.deleteMergeOnRead(spark, path, col("k") < 300L)
    assert(DvIntrospect.lastCommitDriverRows == 1)
    val s = Iceberg.snapshot(spark, path)
    assert(s.dvDeletes.size == 1, "one merged DV per data file (v3 invariant)")
    assert(s.dvDeletes.head.cardinality == 300L)
    assert(Iceberg.read(spark, path).count() == 700L)
  }

  test("Iceberg: a changelog step over a many-row MoR delete diffs task-side") {
    val path = freshDir("dvd_ice_changelog")
    Iceberg.write(
      spark.range(0, 4000).select(col("id").as("k"), (col("id") % 5).as("v"))
        .repartitionByRange(4, col("k")),
      path)
    Iceberg.upgradeToV3(spark, path)
    Iceberg.deleteMergeOnRead(spark, path, col("k") < 2000L)
    val touched = Iceberg.snapshot(spark, path).dvDeletes.size
    DvIntrospect.lastChangelogDiffDescriptors = -1
    val cl = Iceberg.changeLog(spark, path, fromSeq = 0L)
    val dels = cl.filter(col("_change_type") === "delete")
    // the delete image is exact: the 2000 newly covered rows
    assert(dels.count() == 2000L)
    assert(dels.agg(org.apache.spark.sql.functions.max(col("k"))).collect()
      .head.getLong(0) == 1999L)
    // and the step shipped per-file DESCRIPTORS (child + parent sides
    // over the touched files), never the 2000 positions — the diff is
    // a task-side bitmap XOR keyed by the probing scan
    val shipped = DvIntrospect.lastChangelogDiffDescriptors
    assert(shipped >= touched && shipped <= 2 * touched + 2,
      s"changelog step must ship O(files) descriptors (touched=$touched), " +
        s"got $shipped")
    // a second MoR delete: the next step's image is ONLY the newly
    // covered rows (merged successor DVs carry predecessors' positions)
    val seqBefore = Iceberg.snapshot(spark, path).sequenceNumber
    Iceberg.deleteMergeOnRead(spark, path, col("k") < 2500L)
    val step2 = Iceberg.changeLog(spark, path, fromSeq = seqBefore)
      .filter(col("_change_type") === "delete")
    assert(step2.count() == 500L)
    assert(step2.agg(org.apache.spark.sql.functions.min(col("k"))).collect()
      .head.getLong(0) == 2000L)
  }

  test("orphaned DV blobs (retried-task leftovers) are vacuum-reclaimed; live ones survive") {
    // Delta: an unreferenced .bin (what a failed attempt leaves) goes;
    // the committed DV blob stays
    val dPath = freshDir("dvd_delta_orphan")
    DeltaLake.write(
      spark.range(0, 1000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(2, col("k")),
      dPath)
    DeltaLake.deleteMergeOnRead(spark, dPath, col("k") < 400L)
    val orphanBin = Paths.get(dPath, "deletion_vector_orphan-attempt.bin")
    java.nio.file.Files.write(orphanBin, Array[Byte](1, 2, 3))
    // a co-located Iceberg layer's changelog spill (converted tables
    // share the root) is NOT Delta vacuum's to reclaim — the Iceberg
    // side owns its lifecycle (JVM-exit cleanup + age-gated orphan
    // sweep), and an ageless vacuum could yank an in-flight read
    val spill = Paths.get(dPath, "_changelog_tmp", "run1", "part-0.parquet")
    java.nio.file.Files.createDirectories(spill.getParent)
    java.nio.file.Files.write(spill, Array[Byte](9))
    assert(DeltaLake.vacuum(spark, dPath) >= 1)
    assert(!orphanBin.toFile.exists, "unreferenced blob reclaimed")
    assert(spill.toFile.exists, "the Iceberg changelog spill dir is spared")
    assert(DeltaLake.read(spark, dPath).count() == 600L, "live DV still applies")
    // Iceberg: an unreferenced .puffin age-reclaims; the committed one stays
    val iPath = freshDir("dvd_ice_orphan")
    Iceberg.write(
      spark.range(0, 1000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(2, col("k")),
      iPath)
    Iceberg.upgradeToV3(spark, iPath)
    Iceberg.deleteMergeOnRead(spark, iPath, col("k") < 400L)
    val orphanPuffin = Paths.get(iPath, "data", "orphan-attempt-deletes.puffin")
    java.nio.file.Files.write(orphanPuffin, Array[Byte](4, 5, 6))
    assert(Iceberg.removeOrphanFiles(spark, iPath,
      olderThanMs = System.currentTimeMillis() + 60000) >= 1)
    assert(!orphanPuffin.toFile.exists, "unreferenced puffin reclaimed")
    assert(Iceberg.read(spark, iPath).count() == 600L, "live DV still applies")
  }

  test("Iceberg v2: position-delete reads ship descriptors; blobs decode task-side") {
    val path = freshDir("dvd_ice_v2read")
    Iceberg.write(
      spark.range(0, 3000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(3, col("k")),
      path)
    Iceberg.deleteMergeOnRead(spark, path, col("k") % 2L === 1L)
    DvIntrospect.lastReadDescriptors = -1
    val df = Iceberg.read(spark, path)
    // the LAZY merge-on-read planner ships ONE WILDCARD per delete
    // parquet — O(delete files), not O(files × delete files); each scan
    // task instantiates its own file's keyed source and Group-reads its
    // rows (positions never materialize on the driver)
    assert(DvIntrospect.lastReadDescriptors == 1,
      s"expected 1 wildcard descriptor, got ${DvIntrospect.lastReadDescriptors}")
    assert(df.count() == 1500L)
    assert(df.filter(col("k") % 2L === 1L).count() == 0L)
    // the eager walk pairs per admissible data file: 3 keyed descriptors
    DvIntrospect.lastReadDescriptors = -1
    spark.conf.set("spark.graft.iceberg.manifestListPruning", "false")
    try {
      val eager = Iceberg.read(spark, path)
      assert(eager.count() == 1500L)
      assert(DvIntrospect.lastReadDescriptors == 3,
        s"eager path expected 3 descriptors, got ${DvIntrospect.lastReadDescriptors}")
    } finally spark.conf.unset("spark.graft.iceberg.manifestListPruning")
  }

  test("boundsAdmit: missing/truncated bounds only widen; non-ASCII always admits") {
    import DvSources.boundsAdmit
    // no bounds recorded: always admit (pre-r16 delete files)
    assert(boundsAdmit("/t/data/x.parquet", None, None))
    // inside / at the edges / outside
    assert(boundsAdmit("/t/b.parquet", Some("/t/a.parquet"), Some("/t/c.parquet")))
    assert(boundsAdmit("/t/a.parquet", Some("/t/a.parquet"), Some("/t/c.parquet")))
    assert(boundsAdmit("/t/c.parquet", Some("/t/a.parquet"), Some("/t/c.parquet")))
    assert(!boundsAdmit("/t/d.parquet", Some("/t/a.parquet"), Some("/t/c.parquet")))
    assert(!boundsAdmit("/t/0.parquet", Some("/t/a.parquet"), Some("/t/c.parquet")))
    // spec-truncated upper (truncate-and-increment) only WIDENS: a path
    // under the widened bound still admits
    assert(boundsAdmit("/t/ab.parquet", Some("/t/a"), Some("/u")))
    // one-sided bounds
    assert(!boundsAdmit("/t/0.parquet", Some("/t/a"), None))
    assert(!boundsAdmit("/t/z.parquet", None, Some("/t/c")))
    // non-ASCII anywhere: UTF-16 vs UTF-8 byte order can disagree —
    // admit (a probe, never a wrong skip)
    assert(boundsAdmit("/t/é.parquet", Some("/t/a"), Some("/t/c")))
    assert(boundsAdmit("/t/b.parquet", Some("/t/é"), Some("/t/c")))
    assert(boundsAdmit("/t/b.parquet", Some("/t/a"), Some("/t/é")))
  }

  test("boundsAdmit: URI-scheme bounds from external writers normalize to the probe's form") {
    import DvSources.boundsAdmit
    // external writers record file_path as full URIs; the probe is
    // scheme-stripped — bounds must strip to the same form or every
    // probe would compare below them ('/' < 's') and wrongly veto
    assert(boundsAdmit("/t/b.parquet",
      Some("s3://bucket/t/a.parquet"), Some("s3://bucket/t/c.parquet")))
    assert(!boundsAdmit("/t/d.parquet",
      Some("s3://bucket/t/a.parquet"), Some("s3://bucket/t/c.parquet")))
    assert(!boundsAdmit("/t/0.parquet",
      Some("s3a://bucket/t/a.parquet"), Some("s3a://bucket/t/c.parquet")))
    // file:/ single-slash and file:/// triple-slash forms
    assert(boundsAdmit("/t/b.parquet",
      Some("file:/t/a.parquet"), Some("file:///t/c.parquet")))
    // a bound spec-truncated INSIDE the scheme/authority prefix has no
    // usable path — that side drops (admit), the other still applies
    assert(boundsAdmit("/t/b.parquet", Some("s3://buck"), Some("s3://bucket/t/c.parquet")))
    assert(!boundsAdmit("/t/d.parquet", Some("s3://buck"), Some("s3://bucket/t/c.parquet")))
    // stripping DISTINCT authorities is not order-preserving: crossed
    // stripped bounds are incoherent — admit, never a wrong veto
    assert(boundsAdmit("/t/a.parquet",
      Some("s3://a/z.parquet"), Some("s3://b/a.parquet")))
    // mixed forms: one raw-path bound, one URI bound
    assert(boundsAdmit("/t/b.parquet", Some("/t/a.parquet"), Some("s3://bucket/t/c.parquet")))
    // relative-looking bound (no scheme, no leading slash): drop that side
    assert(boundsAdmit("/t/b.parquet", Some("t/zz.parquet"), None))
  }

  test("Iceberg v2: recorded file_path bounds veto wildcard probes for untouched files") {
    import graft.functions.DvDescriptorMap
    val path = freshDir("dvd_ice_v2bounds")
    Iceberg.write(
      spark.range(0, 3000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(3, col("k")),
      path)
    // delete rows from the LOW range only: the committed delete
    // parquet's file_path min/max both name the first data file, and
    // the entry records them as the spec's reserved-field bounds
    Iceberg.deleteMergeOnRead(spark, path, col("k") < 500L && col("k") % 2L === 1L)
    val skippedBefore = DvDescriptorMap.wildcardProbesSkipped.get()
    val df = Iceberg.read(spark, path)
    assert(df.count() == 2750L)
    assert(df.filter(col("k") < 500L && col("k") % 2L === 1L).count() == 0L)
    // the two untouched files' wildcard probes were vetoed from the
    // bounds alone — no Group-reader scan of the delete parquet for
    // files it provably cannot reference
    val skipped = DvDescriptorMap.wildcardProbesSkipped.get() - skippedBefore
    assert(skipped >= 2L, s"expected >= 2 bounds-vetoed wildcard probes, got $skipped")
    // the eager walk applies the same bounds when PAIRING: only the
    // referenced file gets a descriptor (3 admissible without bounds)
    DvIntrospect.lastReadDescriptors = -1
    spark.conf.set("spark.graft.iceberg.manifestListPruning", "false")
    try {
      val eager = Iceberg.read(spark, path)
      assert(eager.count() == 2750L)
      assert(DvIntrospect.lastReadDescriptors == 1,
        s"bounds must narrow eager pairing to 1 descriptor, got ${DvIntrospect.lastReadDescriptors}")
    } finally spark.conf.unset("spark.graft.iceberg.manifestListPruning")
  }
}
