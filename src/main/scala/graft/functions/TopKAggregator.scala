package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator — SURVEY.md §2.11: the scale path for
  * "top-k per group" when groups are huge. The window/row_number
  * formulation sorts every scored row inside the shuffle; this
  * Aggregator carries at most k candidates per partition and merges
  * k+k buffers, so shuffle volume per group is O(k), not O(rows).
  *
  * Ordering is (score DESC, id ASC) — the id tiebreak keeps results
  * deterministic, matching the window formulation and its DuckDB oracle
  * exactly (scores are bit-identical doubles, so rank order is too).
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)

  /** (score DESC, id ASC) with IEEE total order on score: negation-based
    * sortBy(-score) would sort NaN scores last while the window desc
    * formulation ranks NaN first, so a zero-norm embedding (NaN cosine)
    * would diverge from the row_number path and its oracle. */
  private val ordering: Ordering[Scored] = new Ordering[Scored] {
    def compare(a: Scored, b: Scored): Int = {
      val byScore = java.lang.Double.compare(b.score, a.score)
      if (byScore != 0) byScore else java.lang.Long.compare(a.id, b.id)
    }
  }

  private def best(buf: Seq[Scored], k: Int): Seq[Scored] =
    buf.sorted(ordering).take(k)

  /** Aggregator over (id, score) rows yielding the top-k as a sorted
    * sequence. Buffer stays ≤ 2k between trims. */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = {
      val appended = buf :+ x
      if (appended.size > 2 * k) best(appended, k) else appended
    }
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = best(a ++ b, k)
    override def finish(buf: Seq[Scored]): Seq[Scored] = best(buf, k)
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }
}
