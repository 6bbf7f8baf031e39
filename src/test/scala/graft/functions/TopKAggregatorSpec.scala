package graft.functions

import graft.functions.TopKAggregator.{Scored, TopK}
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {

  private def run(k: Int, xs: Seq[Scored]): Seq[Scored] = {
    val agg = new TopK(k)
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
  }

  test("keeps top-k by (score DESC, id ASC)") {
    val xs = Seq(Scored(3, 0.5), Scored(1, 0.9), Scored(2, 0.9), Scored(4, 0.1))
    assert(run(2, xs) == Seq(Scored(1, 0.9), Scored(2, 0.9)))
  }

  test("NaN scores rank FIRST, matching the window desc formulation") {
    // Spark's `desc` treats NaN as the largest double; a zero-norm
    // embedding yields NaN cosine and must land in the same position in
    // both the aggregator path (l3c) and the row_number path (l3).
    val out = run(2, Seq(Scored(1, 0.9), Scored(2, Double.NaN), Scored(3, 0.5)))
    assert(out.map(_.id) == Seq(2L, 1L))
    assert(out.head.score.isNaN)
  }

  test("merge of partial buffers preserves ordering and bound") {
    val agg = new TopK(3)
    val a = Seq(Scored(1, 0.9), Scored(5, 0.2))
    val b = Seq(Scored(2, 0.95), Scored(4, 0.4), Scored(6, 0.1))
    assert(agg.merge(a, b) == Seq(Scored(2, 0.95), Scored(1, 0.9), Scored(4, 0.4)))
  }
}
