package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-WIDE physical-plan sweep: every pure-plan entry is screened
  * for the two shapes that kill a 100 TB run outright — a cartesian
  * product and an unjustified collapse of the full input into one task.
  * PlanAuditSpec locks specific good shapes per entry; this spec is the
  * catch-all so a NEW entry can't land with a silent scale-killer. */
class PlanSweepSpec extends AnyFunSuite with SparkFixture {

  /** Entries whose fn executes side effects (writes, streams, Derby,
    * iterative jobs, model fits) during construction — their plan
    * properties are locked individually in PlanAuditSpec/their specs. */
  private val executesOnConstruction: Set[String] = Set(
    "s2_csv_ingest", "s2b_ingest_pipeline", "s3_json_ingest", "s4_jdbc_pull",
    "s5_xlsx_ingest", "s6_orc_roundtrip", "s7_partitioned_write", "s8_incremental_append",
    "l2f_dedup_clusters", "l3d_ivf_ann", "l3f_pq_ann",
  )

  /** Entries whose final/global steps legitimately run in one task,
    * with (allowed SinglePartition exchange count, reason); the
    * collapsed data is always O(groups) or O(k), never the raw input. */
  private val globalFinalAllowed: Map[String, (Int, String)] = Map(
    "a2_global_agg" -> (1, "global aggregate: partial aggs collapse to one 1-row final"),
    "t4_late_data" -> (1, "prefix pass over per-chunk maxima (1/8192 of input)"),
    "l4j_seq_packing" -> (1, "prefix pass over per-chunk token sums (1/128 of doc count)"),
    "o2_topk" -> (1, "TakeOrderedAndProject final: k rows to the driver"),
    "j2_promo_share" -> (1, "global ratio aggregate (Q14 shape): partial aggs collapse to one 1-row final"),
    "r4_sample" -> (1, "global aggregate over the sampled slice: 1-row final"),
    "r4b_systematic_sample" -> (1, "global aggregate over the systematic slice: 1-row final"),
    "s11_dq_report" -> (1, "all DQ rule counters collapse to one 1-row aggregate, then stack to long format"),
    "s25_zorder_skipping" -> (2, "two 1-row global aggregates (one per pruned z dimension), unioned"),
    "s58_delta_clustering" -> (2, "two 1-row global aggregates (one per pruned clustering dimension), unioned"),
    "s59_iceberg_sort_order" -> (1, "global aggregate over the pruned slice: 1-row final"),
    "l4q_bigram_lm" -> (1, "vocabulary size: 1-row global countDistinct, broadcast into the score join"),
    "l3e_negative_sampling" -> (1, "corpus count: 1-row global aggregate, broadcast into the assignment"),
    "s36_txn_pair" -> (1, "watermark summary: 1-row global aggregate, broadcast into the view"),
    "l4u_lang_rebalance" -> (2,
      "min over the per-language counts (1-row global agg over n_langs rows) feeds the " +
        "threshold join twice — both exchanges carry O(languages) rows, never documents"),
    "a13_approx_topk" -> (1,
      "global ApproxTopK: per-partition sketches merge into one 1-row final"),
    "a13b_topk_rollup" -> (1,
      "the combine phase merges O(shards) fixed-size sketch states into one 1-row final"),
    "l4v_bloom_decontaminate" -> (2,
      "the Bloom sketch build (scalar subquery): distinct BENCHMARK grams collapse to a " +
        "1-row sketch final, once on the prefilter side and once where the exact verify " +
        "join reuses the subquery — both carry benchmark grams, never the corpus"),
  )

  test("no registry entry plans a cartesian product or an unjustified single-task collapse") {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if !executesOnConstruction(name) && !name.startsWith("stream_")
    } {
      val plan = fn(spark, sf()).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        problems += s"$name: CartesianProduct in plan"
      val nSingle = "Exchange SinglePartition".r.findAllIn(plan).size
      val allowed = globalFinalAllowed.get(name).map(_._1).getOrElse(0)
      if (nSingle > allowed)
        problems += s"$name: $nSingle SinglePartition exchanges (allowed $allowed)"
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
