package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Delta CLUSTERED TABLES (the protocol's `clusteringTable` writer
  * feature + `delta.clustering` domain): enablement is metadata-only,
  * OPTIMIZE lays the z-curve and stamps `clusteringProvider`, and the
  * layout's per-file stats prune on every clustering column. */
class DeltaClusteringSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def grid(n: Int) = {
    import spark.implicits._
    // shuffled 2-D grid: neither dimension is accidentally sorted
    scala.util.Random.shuffle((1 to n).flatMap(a => (1 to n).map(b => (a.toLong, b.toLong))))
      .toDF("a", "b").repartition(8)
  }

  test("enable + OPTIMIZE: domain round-trips, provider stamped, both dimensions prune") {
    val path = freshDir("delta_cluster")
    DeltaLake.write(grid(40), path)
    val v = DeltaLake.enableClustering(spark, path, Seq("a", "b"))
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("a", "b"))
    val snapEnabled = DeltaLake.snapshot(spark, path)
    assert(snapEnabled.protocol.writerFeatures.contains("clusteringTable"))
    // metadata-only: the enable commit moved zero data bytes
    val enableLog = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", f"$v%020d.json")), "UTF-8")
    assert(!enableLog.contains("\"add\"") && !enableLog.contains("\"remove\""))

    DeltaLake.optimizeCluster(spark, path, nFiles = 16)
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.files.size == 16)
    assert(snap.files.forall(_.clusteringProvider.contains("liquid")))
    // the OPTIMIZE commit is maintenance: dataChange=false on every action
    val optLog = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", f"${v + 1}%020d.json")), "UTF-8")
    optLog.split('\n').filter(_.nonEmpty).map(mapper.readTree).foreach { n =>
      Seq("add", "remove").foreach(k => Option(n.get(k)).foreach(a =>
        assert(!a.get("dataChange").asBoolean, s"$k must be dataChange=false")))
    }
    // content unchanged
    assert(DeltaLake.read(spark, path).count() == 1600L)
    // BOTH dimensions prune through the stats-fed FileIndex
    Seq("a", "b").foreach { c =>
      val f = DeltaLake.read(spark, path).filter(col(c) <= 8L)
      assert(f.count() == 8L * 40)
      val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
      assert(kept < total, s"range on $c must prune files at planning ($kept/$total)")
    }
  }

  test("incremental maintenance: clean files carry by reference, only stragglers rewrite") {
    import spark.implicits._
    val path = freshDir("delta_cluster_incr")
    // single-column clustered layout: 4 range-disjoint files
    DeltaLake.write((1L to 4000L).map(k => (k, s"r$k")).toDF("k", "v"), path)
    DeltaLake.enableClustering(spark, path, Seq("k"))
    DeltaLake.optimizeCluster(spark, path, nFiles = 4)
    val cleanPaths = DeltaLake.snapshot(spark, path).files.map(_.path).toSet
    assert(cleanPaths.size == 4)
    // within budget: nothing to do, nothing touched
    assert(DeltaLake.maintainClusteredIfNeeded(spark, path, maxStragglers = 4).isEmpty)
    assert(DeltaLake.snapshot(spark, path).files.map(_.path).toSet == cleanPaths)
    // an append loop lands 6 unclustered full-range batches
    (0 until 6).foreach { i =>
      DeltaLake.write((1L to 4000L by 97L).map(k => (k + i, s"s$k")).toDF("k", "v")
        .coalesce(1), path, mode = SaveMode.Append)
    }
    val withDebt = DeltaLake.snapshot(spark, path)
    assert(withDebt.files.size == 10)
    val v = DeltaLake.maintainClusteredIfNeeded(spark, path, maxStragglers = 4)
    assert(v.nonEmpty, "6 full-range stragglers must trip a 4-file budget")
    val after = DeltaLake.snapshot(spark, path)
    // FILE IDENTITY: all 4 clean files carried by reference
    assert(cleanPaths.subsetOf(after.files.map(_.path).toSet),
      "clean range-disjoint files must carry by reference")
    assert(after.files.map(_.path).toSet.intersect(
      withDebt.files.map(_.path).toSet -- cleanPaths).isEmpty,
      "every straggler must be replaced")
    assert(after.files.forall(_.clusteringProvider.contains("liquid")))
    // content exact: base rows + the 6 appended batches
    assert(DeltaLake.read(spark, path).count() ==
      4000L + 6L * (1L to 4000L by 97L).size)
    // maintenance commit is dataChange=false
    val log = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", f"${v.get}%020d.json")), "UTF-8")
    log.split('\n').filter(_.nonEmpty).map(mapper.readTree).foreach { n =>
      Seq("add", "remove").foreach(k => Option(n.get(k)).foreach(a =>
        assert(!a.get("dataChange").asBoolean, s"$k must be dataChange=false")))
    }
    // back within budget: the next call is a no-op
    assert(DeltaLake.maintainClusteredIfNeeded(spark, path, maxStragglers = 4).isEmpty)
  }

  test("incremental maintenance: row-tracked stragglers keep their ids; z-curve uses the stamp") {
    import spark.implicits._
    val path = freshDir("delta_cluster_incr_rt")
    DeltaLake.write(grid(20), path)
    DeltaLake.enableRowTracking(spark, path)
    DeltaLake.enableClustering(spark, path, Seq("a", "b"))
    DeltaLake.optimizeCluster(spark, path, nFiles = 4)
    val idsBefore = DeltaLake.readWithRowTracking(spark, path)
      .select(col("a"), col("b"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cleanPaths = DeltaLake.snapshot(spark, path).files.map(_.path).toSet
    // unclustered appends (z-curve layouts flag by the missing stamp)
    (0 until 6).foreach { i =>
      DeltaLake.write(Seq((100L + i, 100L + i)).toDF("a", "b"), path,
        mode = SaveMode.Append)
    }
    val v = DeltaLake.maintainClusteredIfNeeded(spark, path, maxStragglers = 4)
    assert(v.nonEmpty)
    val after = DeltaLake.snapshot(spark, path)
    assert(cleanPaths.subsetOf(after.files.map(_.path).toSet),
      "stamped z-curve files must carry by reference")
    assert(after.files.forall(_.clusteringProvider.contains("liquid")))
    // ROW IDENTITY: every pre-maintenance row keeps its id
    val idsAfter = DeltaLake.readWithRowTracking(spark, path)
      .select(col("a"), col("b"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    idsBefore.foreach { case (k, id) =>
      assert(idsAfter(k) == id, s"row $k lost its id across incremental maintenance")
    }
    assert(idsAfter.size == idsBefore.size + 6)
  }

  test("CREATE TABLE ... CLUSTER BY records the clustering domain from SQL") {
    val whd = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "warehouse", "dbcb")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbcb")
    spark.sql("CREATE TABLE graft.dbcb.cl (k BIGINT, v STRING) USING delta CLUSTER BY (k)")
    val path = whd.resolve("cl").toString
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("k"))
    spark.sql("INSERT INTO graft.dbcb.cl SELECT id, concat('r', id) FROM range(1, 2001)")
    DeltaLake.optimizeCluster(spark, path, nFiles = 4)
    assert(DeltaLake.snapshot(spark, path).files.forall(
      _.clusteringProvider.contains("liquid")))
    // the SQL maintenance loop closes over the declared columns
    assert(spark.sql("CALL graft.system.maintain_clustered('dbcb.cl')")
      .head().getLong(0) == -1L)
    // ALTER TABLE ... CLUSTER BY re-declares the domain; NONE refuses
    spark.sql("ALTER TABLE graft.dbcb.cl CLUSTER BY (v)")
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("v"))
    intercept[Exception](spark.sql("ALTER TABLE graft.dbcb.cl CLUSTER BY NONE"))
    // non-Delta formats refuse the clause pre-create
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE graft.dbcb.bad (k BIGINT) USING iceberg CLUSTER BY (k)"))
    assert(e.getMessage.contains("CLUSTER BY"))
  }

  test("refusals: partitioned table, non-numeric multi-column, OPTIMIZE before enable") {
    import spark.implicits._
    val part = freshDir("delta_cluster_part")
    DeltaLake.write(Seq((1L, "x", "F"), (2L, "y", "O")).toDF("k", "v", "s"),
      part, partitionBy = Seq("s"))
    assertThrows[IllegalArgumentException](
      DeltaLake.enableClustering(spark, part, Seq("k")))

    val flat = freshDir("delta_cluster_str")
    DeltaLake.write(Seq((1L, "x"), (2L, "y")).toDF("k", "v"), flat)
    assertThrows[IllegalArgumentException](
      DeltaLake.enableClustering(spark, flat, Seq("k", "v")))
    // a single clustering column may be any orderable type
    DeltaLake.enableClustering(spark, flat, Seq("v"))
    assert(DeltaLake.clusteringColumns(spark, flat) == Seq("v"))

    val plain = freshDir("delta_cluster_plain")
    DeltaLake.write(Seq((1L, "x")).toDF("k", "v"), plain)
    assertThrows[IllegalArgumentException](
      DeltaLake.optimizeCluster(spark, plain))
  }

  test("checkpoint folding preserves the clustering domain and the provider stamp") {
    val path = freshDir("delta_cluster_cp")
    DeltaLake.write(grid(20), path)
    DeltaLake.enableClustering(spark, path, Seq("a", "b"))
    DeltaLake.optimizeCluster(spark, path, nFiles = 4)
    DeltaLake.checkpoint(spark, path)
    // force replay THROUGH the checkpoint: drop the folded JSON tail
    val log = Paths.get(path, "_delta_log")
    java.nio.file.Files.list(log).toArray.map(_.toString)
      .filter(_.endsWith(".json")).foreach(f =>
        java.nio.file.Files.delete(Paths.get(f)))
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.clusteringProvider.contains("liquid")),
      "clusteringProvider must survive checkpoint folding")
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("a", "b"),
      "the clustering domain must survive checkpoint folding")
    assert(DeltaLake.read(spark, path).count() == 400L)
  }

  test("a row-tracked clustered table keeps every row's identity across OPTIMIZE") {
    val path = freshDir("delta_cluster_rt")
    DeltaLake.write(grid(20), path)
    DeltaLake.enableRowTracking(spark, path)
    DeltaLake.enableClustering(spark, path, Seq("a", "b"))
    val pre = DeltaLake.readWithRowTracking(spark, path)
      .select(col("a") * 1000 + col("b") as "k", col("_row_id").as("pre_id"))
    DeltaLake.optimizeCluster(spark, path, nFiles = 4)
    val post = DeltaLake.readWithRowTracking(spark, path)
      .select(col("a") * 1000 + col("b") as "k", col("_row_id").as("post_id"))
    assert(pre.join(post, Seq("k"))
      .filter(col("pre_id") =!= col("post_id")).count() == 0L,
      "OPTIMIZE on a row-tracked clustered table must preserve row ids")
  }
}
