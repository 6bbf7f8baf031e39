package graft.ingest

import graft.SparkFixture
import java.nio.file.Paths
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Native-format MERGE-ON-READ file pruning: a snapshot carrying
  * deletion-vector debt must still skip whole data files at PLANNING
  * when a pushed filter cannot match their manifest-recorded stats or
  * partition values — the library read routes every schema-pinned
  * group through the pruning
  * [[org.apache.spark.sql.graft.VersionedFileIndex]], so delete debt
  * is no longer a full-file-listing tax between a DELETE and the next
  * compaction. Claims:
  *
  *  - a stats-clustered MoR table plans O(overlapping files) under a
  *    range predicate ([[org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned]]
  *    is the observable);
  *  - a partitioned MoR table prunes whole partitions the same way;
  *  - results are bit-identical to the plain path-list scan (the
  *    `spark.graft.versioned.morFilePruning=false` kill-switch is the
  *    A/B seam), deleted rows excluded on both;
  *  - schema-drifted histories (per-group aligned reads) stay exact. */
class MorFilePruningSpec extends AnyFunSuite with SparkFixture {
  private val V = Versioned

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def collectBoth(path: String, q: DataFrame => DataFrame): (Seq[String], Seq[String]) = {
    def run(): Seq[String] =
      q(V.read(spark, path)).collect().map(_.mkString("|")).toSeq.sorted
    val pruned = run()
    spark.conf.set("spark.graft.versioned.morFilePruning", "false")
    val plain = try run()
    finally spark.conf.unset("spark.graft.versioned.morFilePruning")
    (pruned, plain)
  }

  test("DV-debted clustered table: range predicate skips whole files at planning") {
    import spark.implicits._
    val path = freshDir("mor_prune_clustered")
    V.commitClustered(
      (0L until 4000L).map(k => (k, s"v$k")).toDF("k", "v"),
      path, clusterCol = "k", nFiles = 8)
    V.deleteWhere(spark, path, col("k") % 100L === 0L)
    assert(V.manifest(path, V.currentVersion(path).get).exists(_.kind == "dv"),
      "the delete must land as deletion-vector debt, not a rewrite")
    val (pruned, plain) = collectBoth(path,
      _.filter(col("k") >= 1000L && col("k") < 1500L).select(col("k")))
    assert(pruned == plain && pruned.size == 495, // 500 minus the 5 deleted multiples of 100
      s"range read returned ${pruned.size} rows")
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(total == 8 && kept <= 2,
      s"MoR read must plan O(overlapping files): planned ($kept, $total)")
    // full scan stays exact on both paths (deleted rows gone)
    val (allP, allE) = collectBoth(path, identity)
    assert(allP == allE && allP.size == 3960)
  }

  test("partitioned MoR table: partition predicate prunes at planning") {
    import spark.implicits._
    val path = freshDir("mor_prune_part")
    V.commitPartitioned(
      (0L until 300L).map(k => (k % 3, k, s"v$k")).toDF("p", "k", "v"), path, "p")
    V.deleteMergeOnRead(spark, path, Seq(7L, 8L).toDF("k"), "k")
    assert(V.manifest(path, V.currentVersion(path).get).exists(_.kind == "dv"))
    val (pruned, plain) = collectBoth(path, _.filter(col("p") === 1).select(col("k")))
    // p=1 holds k ≡ 1 (mod 3): 100 rows, minus the deleted k=7
    assert(pruned == plain && pruned.size == 99, s"partition read returned ${pruned.size}")
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total,
      s"partition filter must prune whole partitions under MoR debt: ($kept, $total)")
    val (allP, allE) = collectBoth(path, identity)
    assert(allP == allE && allP.size == 298)
  }

  test("schema-drifted MoR history: per-group indexed reads stay aligned and exact") {
    import spark.implicits._
    val path = freshDir("mor_prune_drift")
    V.commit((0L until 100L).map(k => (k, s"a$k")).toDF("k", "v"), path)
    // additive drift: the append carries a new column
    V.appendCommit((100L until 200L).map(k => (k, s"b$k", k * 2)).toDF("k", "v", "extra"), path)
    V.deleteWhere(spark, path, col("k").isin(5L, 105L))
    val (pruned, plain) = collectBoth(path, _.select(col("k"), col("v"), col("extra")))
    assert(pruned == plain && pruned.size == 198, s"drifted MoR read: ${pruned.size} rows")
    assert(!pruned.exists(r => r.startsWith("5|") || r.startsWith("105|")),
      "deleted rows must not surface on either path")
    // the pre-drift group reads NULL under the new column on both paths
    assert(pruned.count(_.endsWith("|null")) == 99)
  }
}
