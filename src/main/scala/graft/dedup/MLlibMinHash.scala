package graft.dedup

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed near-duplicate detection — the library alternative to the
  * hand-rolled LSH in [[DedupOps.l2MinHash]] (SURVEY.md L2 lists both).
  *
  * tokens → HashingTF (binary term presence) → MinHashLSH →
  * approxSimilarityJoin at a Jaccard-distance threshold. MLlib's LSH
  * models are driver-fit but data-free (random hash coefficients only),
  * so the pipeline scales exactly like the hand-rolled one: per-row
  * signatures + bucket joins.
  */
object MLlibMinHash {

  /** Candidate near-dup pairs with Jaccard distance below `maxDistance`.
    * Input must have (doc_id, text). */
  def nearDupPairs(docs: DataFrame, maxDistance: Double, numHashTables: Int = 8): DataFrame = {
    // null texts are the only rows that would reach LSH with an empty
    // vector (split("", " ") still yields [""], a non-empty token list) —
    // say that directly instead of re-deriving size() through an
    // interpreted higher-order aggregate per row
    val tokenized = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    val featured = tf.transform(tokenized)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(featured)
    model
      .approxSimilarityJoin(featured, featured, maxDistance, "jaccard_dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        col("jaccard_dist"))
  }
}
